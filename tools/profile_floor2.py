"""Cost model for the builder-round rewrite: gathers (by rows/width),
scatters, segmented scans, multi-payload sorts, at n=262144."""

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


def timeit(name, fn, *args, reps=5):
    try:
        sync(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"  {name:48s} {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)
    except Exception as e:
        print(f"  {name:48s} FAILED {str(e)[:120]}", flush=True)


def main():
    n = 262_144
    cap = 2 * n
    f_cap = n // 2
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].platform}", flush=True)

    x1 = jnp.asarray(rng.random(n), jnp.float32)
    timeit("noop (sync overhead)", jax.jit(lambda a: a[0] + 1), x1)

    idx_n = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    idx_cap_from_n = jnp.asarray(rng.integers(0, n, cap), jnp.int32)
    idx_f_from_n = jnp.asarray(rng.integers(0, n, f_cap), jnp.int32)
    idx_n_from_cap = jnp.asarray(rng.integers(0, cap, n), jnp.int32)
    w6_cap = jnp.asarray(rng.random((cap, 6)), jnp.float32)
    w144_n = jnp.asarray(rng.random((n, 144)), jnp.float32)
    w24_n = jnp.asarray(rng.random((n, 24)), jnp.float32)

    timeit("gather [n]<-[n] w1",
           jax.jit(lambda i, v: v[i]), idx_n, x1)
    timeit("gather [n]<-[cap] w6 (bounds[nid])",
           jax.jit(lambda i, v: v[i]), idx_n_from_cap, w6_cap)
    timeit("gather [f_cap]<-[n] w144 (smn[last])",
           jax.jit(lambda i, v: v[i]), idx_f_from_n, w144_n)
    timeit("gather [cap]<-[n] w24 (boundary)",
           jax.jit(lambda i, v: v[i]), idx_cap_from_n, w24_n)
    timeit("gather [n]<-[n] w24",
           jax.jit(lambda i, v: v[i]), idx_n, w24_n)

    heads = jnp.asarray(rng.random(n) < 0.02)
    rows8_f = jnp.asarray(rng.random((f_cap, 8)), jnp.float32)
    hpos = jnp.asarray(np.sort(rng.choice(n, f_cap, replace=False)).astype(np.int32))

    timeit("scatter-set [f_cap]->[n] w8 (head rows)",
           jax.jit(lambda p, v: jnp.zeros((n, 8), jnp.float32).at[p].set(v)),
           hpos, rows8_f)

    def ffill(hh, vv):
        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[:, None], vb, va)
        return jax.lax.associative_scan(comb, (hh, vv), axis=0)[1]

    def bfill(hh, vv):
        # backward fill: reverse, heads mark segment ends after reverse
        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[:, None], vb, va)
        r = jax.lax.associative_scan(comb, (hh[::-1], vv[::-1]), axis=0)[1]
        return r[::-1]

    v8 = jnp.asarray(rng.random((n, 8)), jnp.float32)
    v25 = jnp.asarray(rng.random((n, 25)), jnp.float32)
    timeit("fwd-fill scan [n,8]", jax.jit(ffill), heads, v8)
    timeit("fwd-fill scan [n,25]", jax.jit(ffill), heads, v25)
    timeit("bwd-fill scan [n,8]", jax.jit(bfill), heads, v8)

    key = jnp.asarray(rng.permutation(n).astype(np.int32))
    pay = [jnp.asarray(rng.random(n), jnp.float32) for _ in range(18)]
    timeit("sort [n] 18 payloads",
           jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1)),
           key, *pay)
    timeit("sort [n] 4 payloads",
           jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1)),
           key, *pay[:4])

    timeit("cumsum [n,24] i32",
           jax.jit(lambda v: jnp.cumsum(v.astype(jnp.int32), axis=0)), w24_n)

    def minmax_scan(hh, vv):
        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[:, None], vb, jnp.minimum(va, vb))
        return jax.lax.associative_scan(comb, (hh, vv), axis=0)[1]

    timeit("flagged min scan [n,144]", jax.jit(minmax_scan), heads, w144_n)
    timeit("flagged min scan [n,72]", jax.jit(minmax_scan), heads,
           w144_n[:, :72])


if __name__ == "__main__":
    main()
