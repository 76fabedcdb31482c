"""A/B the round glue primitives: scatter write-back vs payload sort,
compacted-tail ops vs full-width ops (chained x4, one sync)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

i32, f32 = jnp.int32, jnp.float32
Rp = 1 << 20
Rc = 131072
A = 32768
LL = 1402 * 1024


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


S6 = jnp.asarray(np.random.rand(6, Rp).astype(np.float32))
ids = jnp.asarray(np.random.permutation(Rp)[:Rc].astype(np.int32))
new6 = jnp.asarray(np.random.rand(6, Rc).astype(np.float32))
idsA = jnp.asarray(np.random.permutation(Rp)[:A].astype(np.int32))
new6A = jnp.asarray(np.random.rand(6, A).astype(np.float32))


@jax.jit
def scatter_back(S6, ids, new6):
    def body(i, c):
        out = c.at[:, ids].set(new6 + i)
        return out

    return jax.lax.fori_loop(0, 4, body, S6)


bench("scatter-set [6,1M]<-131K cols x4", scatter_back, S6, ids, new6)


@jax.jit
def scatter_backA(S6, idsA, new6A):
    def body(i, c):
        out = c.at[:, idsA].set(new6A + i)
        return out

    return jax.lax.fori_loop(0, 4, body, S6)


bench("scatter-set [6,1M]<-32K cols x4", scatter_backA, S6, idsA, new6A)

key = jnp.asarray(np.random.permutation(Rp).astype(np.int32))


@jax.jit
def sort7(key, S6):
    def body(i, c):
        k, d = c
        s = jax.lax.sort((k,) + tuple(d[j] for j in range(6)), num_keys=1)
        return (s[0] ^ (i + 1), jnp.stack(s[1:]))

    return jax.lax.fori_loop(0, 4, body, (key, S6))


bench("sort 7-op [1M] x4 (old write-back)", sort7, key, S6)


@jax.jit
def sort2(key):
    def body(i, c):
        iota = jax.lax.broadcasted_iota(i32, (Rp, 1), 0)[:, 0]
        s = jax.lax.sort((c, iota), num_keys=1)
        return s[0] ^ (i + 1)

    return jax.lax.fori_loop(0, 4, body, key)


bench("sort 2-op [1M] x4 (partition)", sort2, key)

outLL = jnp.asarray(np.random.rand(6, LL).astype(np.float32))
pidLL = jnp.asarray(
    np.random.permutation(LL).astype(np.int32))


@jax.jit
def unsort_scatter(outLL, pidLL):
    # scatter 5 payload rows to pair slots via pid row
    tgt = jnp.zeros((5, LL), f32)

    def body(i, c):
        out = c.at[:, pidLL].set(outLL[1:6] + i)
        return out

    return jax.lax.fori_loop(0, 4, body, tgt)


bench("scatter-unsort [5,1.4M] x4", unsort_scatter, outLL, pidLL)

# gather at A vs Rc widths: [70, Rp] take along axis 1
big = jnp.asarray(np.random.rand(70, Rp).astype(np.float32))


@jax.jit
def gatherRc(big, ids):
    def body(i, c):
        out = jnp.take(big, ids + i * 0, axis=1)
        return c + out[0, 0]

    return jax.lax.fori_loop(0, 4, body, jnp.float32(0))


bench("take [70,1M]->131K cols x4", gatherRc, big, ids)
bench("take [70,1M]->32K cols x4", gatherRc, big, idsA)
