"""Measure the per-op / per-loop-iteration dispatch floor on this
platform: unrolled chains vs fori_loop vs partial unroll, plus gather
chains (the LBVH access pattern)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(r):
    leaf = jax.tree.leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return r


def timeit(name, fn, *args, reps=3):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"  {name:52s} {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)


def main():
    n = 2_097_152
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    print(f"device: {jax.devices()[0].platform}", flush=True)

    K = 200

    @jax.jit
    def chain_unrolled(x):
        for _ in range(K):
            x = x * 1.0001 + 1.0
        return x

    @jax.jit
    def chain_fori(x):
        return jax.lax.fori_loop(0, K, lambda i, v: v * 1.0001 + 1.0, x)

    @jax.jit
    def chain_fori_u8(x):
        return jax.lax.fori_loop(0, K // 8, lambda i, v: v * 1.0001 + 1.0, x,
                                 unroll=8)

    @jax.jit
    def gather_unrolled(x, idx):
        for _ in range(K // 4):
            x = x[idx] + 1.0
        return x

    @jax.jit
    def gather_fori(x, idx):
        return jax.lax.fori_loop(
            0, K // 4, lambda i, v: v[idx] + 1.0, x)

    timeit(f"{K} cheap ops unrolled (one jit)", chain_unrolled, x)
    timeit(f"{K} cheap ops fori_loop", chain_fori, x)
    timeit(f"{K} cheap ops fori unroll=8", chain_fori_u8, x)
    timeit(f"{K//4} random gathers unrolled", gather_unrolled, x, idx)
    timeit(f"{K//4} random gathers fori_loop", gather_fori, x, idx)


if __name__ == "__main__":
    main()
