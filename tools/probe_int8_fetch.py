"""Probe: can Mosaic lower an int8 MXU dot for the one-hot column
fetch, and how fast is it vs the bf16 fetch at San-Miguel table widths?

The candidate layout stores every f32 of the combined table as 4 exact
int8 byte planes (sign-agnostic bit transport; bytes biased by -128 to
fit int8), fetched with an int8 one-hot and recombined with shifts +
bitcast — bit-exact for bounds, tri data, words and gpos alike, unlike
the bf16 table which must round bounds conservatively.

Run ALONE (single TPU process).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def main():
    ROWS_BF, ROWS_I8 = 156, 216
    P, B = 1280, 512
    ITERS = 200
    rng = np.random.default_rng(0)

    tab_bf = rng.standard_normal((ROWS_BF, P)).astype(jnp.bfloat16)
    tab_i8 = rng.integers(-128, 128, (ROWS_I8, P)).astype(np.int8)
    idx = rng.integers(0, P, (1, B)).astype(np.int32)

    def kern_bf(idx_ref, tab_ref, o_ref):
        def body(i, acc):
            ix = idx_ref[...] + i  # vary to defeat CSE
            iota = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
            oh = (iota == ix % P).astype(jnp.bfloat16)
            d = jax.lax.dot_general(
                tab_ref[...], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + d
        acc = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((ROWS_BF, B), jnp.float32))
        o_ref[...] = acc

    def kern_i8(idx_ref, tab_ref, o_ref):
        def body(i, acc):
            ix = idx_ref[...] + i
            iota = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
            oh = (iota == ix % P).astype(jnp.int8)
            d = jax.lax.dot_general(
                tab_ref[...], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + d
        acc = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((ROWS_I8, B), jnp.int32))
        o_ref[...] = acc

    for name, kern, tab, odt, rows in (
            ("bf16", kern_bf, tab_bf, jnp.float32, ROWS_BF),
            ("int8", kern_i8, tab_i8, jnp.int32, ROWS_I8)):
        try:
            f = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((rows, B), odt))
            f = jax.jit(f)
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(idx, tab))
            print(f"{name}: compile+run {time.perf_counter()-t0:.1f} s",
                  flush=True)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(idx, tab))
                ts.append(time.perf_counter() - t0)
            t = sorted(ts)[2]
            macs = rows * P * B * ITERS
            print(f"{name}: {t*1e6/ITERS:.2f} us/fetch  "
                  f"({macs/t/1e12:.1f} Tmac/s, rows={rows})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # correctness of int8 byte transport for one f32 value
    x = np.float32(-123.456)
    bits = np.frombuffer(x.tobytes(), np.uint8).astype(np.int32)
    rec = bits[0] | bits[1] << 8 | bits[2] << 16 | bits[3] << 24
    y = np.frombuffer(np.int32(rec).tobytes(), np.float32)[0]
    print("byte transport exact:", x == y)


if __name__ == "__main__":
    main()
