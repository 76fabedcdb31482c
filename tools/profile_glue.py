"""Measure the v3 round's big glue ops at real sizes (chained x4)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

i32, f32 = jnp.int32, jnp.float32
L = 1 << 20
LL = 1402 * 1024  # NBL * block at block=1024, T=376


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
    return x


def bench(name, fn, *a, n=3):
    sync(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[n // 2]
    print(f"{name}: {t*1e3:8.1f} ms  (per op {(t-0.0346)/4*1e3:6.2f})",
          flush=True)


key = jnp.asarray(np.random.randint(0, 377, L).astype(np.int32))
data15 = jnp.asarray(np.random.rand(15, L).astype(np.float32))
posLL = jnp.asarray((np.random.randint(0, L, LL)).astype(np.int32))


@jax.jit
def sort16(key, data15):
    def body(i, c):
        k, d = c
        ops = (k,) + tuple(d[j] for j in range(15))
        s = jax.lax.sort(ops, num_keys=1)
        return (s[0] ^ (i + 1), jnp.stack(s[1:]))

    return jax.lax.fori_loop(0, 4, body, (key, data15))


bench("sort 16-op [1M] x4", sort16, key, data15)


@jax.jit
def take15(data15, posLL):
    def body(i, c):
        out = jnp.take(c, posLL, axis=1)  # [15, LL]
        return c + out[:, :L] * 0

    return jax.lax.fori_loop(0, 4, body, data15)


bench("take [15,1M]->[15,1.43M] x4", take15, data15, posLL)

out6 = jnp.asarray(np.random.rand(6, LL).astype(np.float32))


@jax.jit
def sort6LL(out6):
    def body(i, c):
        s = jax.lax.sort(tuple(c[j] for j in range(6)), num_keys=1)
        return jnp.stack(s) * 1.0

    return jax.lax.fori_loop(0, 4, body, out6)


bench("sort 6-op [1.43M] x4", sort6LL, out6)

# scans
@jax.jit
def scans(key):
    def body(i, c):
        iota = jax.lax.broadcasted_iota(i32, (L, 1), 0)[:, 0]
        prev = jnp.concatenate([jnp.full((1,), -1, i32), c[:-1]])
        flag = c != prev
        run_start = jax.lax.cummax(jnp.where(flag, iota, 0))
        pad = jnp.cumsum(jnp.where(flag, (-(iota - run_start)) % 1024, 0))
        return c + (pad[-1] % 2)

    return jax.lax.fori_loop(0, 4, body, key)


bench("run scans [1M] x4", scans, key)

# tile (pair-major build)
d13 = jnp.asarray(np.random.rand(13, L // 4).astype(np.float32))


@jax.jit
def tile4(d13):
    def body(i, c):
        t = jnp.tile(c, (1, 4))
        return c + t[:, : L // 4] * 0

    return jax.lax.fori_loop(0, 4, body, d13)


bench("tile [13,256K]x4 x4", tile4, d13)
