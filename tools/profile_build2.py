"""Trustworthy per-op timings (forced scalar readback after each run)
for the ops inside a builder round, to find the ~230ms/round cost."""

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
        print(f"  {name:46s} {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)
    except Exception as e:
        print(f"  {name:46s} FAILED {str(e)[:120]}", flush=True)


def main():
    n = 262_144
    cap = 2 * n
    dim, B = 3, 8
    f_cap = n // 2
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].platform}", flush=True)

    m = jnp.ones((8192, 8192), jnp.bfloat16)
    timeit("sanity matmul 8192^3 bf16 (~3 ms)", jax.jit(lambda a: a @ a), m)
    x1 = jnp.asarray(rng.random(n), jnp.float32)
    timeit("noop (sync overhead)", jax.jit(lambda a: a[0] + 1), x1)

    xcap = jnp.asarray(rng.random(cap), jnp.float32)
    xn24 = jnp.asarray(rng.random((n, 24)), jnp.float32)
    xn144 = jnp.asarray(rng.random((n, 144)), jnp.float32)
    heads = jnp.asarray(rng.random(n) < 0.01)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    permcap = jnp.asarray(rng.permutation(cap).astype(np.int32))
    nid = jnp.asarray(np.sort(rng.integers(0, cap, n)).astype(np.int32))
    f = jnp.asarray(rng.integers(0, f_cap, n), jnp.int32)
    b3 = jnp.asarray(rng.integers(0, B, (n, dim)), jnp.int32)
    pb = jnp.asarray(rng.random((n, dim)), jnp.float32)

    timeit("cumsum [n] f32", jax.jit(lambda a: jnp.cumsum(a)), x1)
    timeit("cumsum [cap] f32", jax.jit(lambda a: jnp.cumsum(a)), xcap)
    timeit("cumsum [n,24] f32 axis0",
           jax.jit(lambda a: jnp.cumsum(a, axis=0)), xn24)
    timeit("cumsum [n,144] f32 axis0",
           jax.jit(lambda a: jnp.cumsum(a, axis=0)), xn144)

    def fl(hh, vv):
        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[:, None], vb, jnp.minimum(va, vb))
        return jax.lax.associative_scan(comb, (hh, vv), axis=0)[1]

    timeit("flagged ascan [n,24]", jax.jit(fl), heads, xn24)
    timeit("flagged ascan [n,144]", jax.jit(fl), heads, xn144)

    timeit("sort [n] 1 payload",
           jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), perm, x1)
    timeit("sort [cap] 1 payload",
           jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
           permcap, xcap)
    timeit("sort [n] 3 payloads",
           jax.jit(lambda k, a: jax.lax.sort(
               (k, a[:, 0], a[:, 1], a[:, 2]), num_keys=1)), perm, pb)

    timeit("gather [n] rows6 from [cap]",
           jax.jit(lambda i, bnd: bnd[i]),
           nid, jnp.asarray(rng.random((cap, 6)), jnp.float32))
    timeit("gather [cap] scalars from [n]",
           jax.jit(lambda i, v: v[jnp.clip(i, 0, n - 1)]), permcap, x1)

    @jax.jit
    def scatter_add(f, b):
        cnt = jnp.zeros((f_cap, dim, B), jnp.int32)
        for a in range(dim):
            cnt = cnt.at[f, a, b[:, a]].add(1, mode="drop")
        return cnt

    @jax.jit
    def scatter_min(f, b, pb):
        mn = jnp.full((f_cap, dim, B, dim), 1e30, jnp.float32)
        for a in range(dim):
            mn = mn.at[f, a, b[:, a]].min(pb, mode="drop")
        return mn

    timeit("scatter-add n->bins [f,3,8]", scatter_add, f, b3)
    timeit("scatter-min n->bins [f,3,8,3]", scatter_min, f, b3, pb)
    timeit("scatter-set perm [n,3]",
           jax.jit(lambda p, v: jnp.zeros_like(v).at[p].set(v)), perm, pb)

    # the SAH B-loop over [f_cap, dim, B, dim] arrays
    bmn = jnp.asarray(rng.random((f_cap, dim, B, dim)), jnp.float32)
    bmx = bmn + 1.0
    cnt = jnp.asarray(rng.integers(0, 9, (f_cap, dim, B)), jnp.int32)

    @jax.jit
    def sweep_bins(bmn, bmx, cnt):
        inf = jnp.float32(np.inf)
        rc = jnp.full((f_cap, dim, B), inf, jnp.float32)
        rmn = jnp.full((f_cap, dim, dim), 1e30, jnp.float32)
        rmx = -rmn
        rcnt = jnp.zeros((f_cap, dim), jnp.int32)
        for i in range(B - 1, 0, -1):
            rmn = jnp.minimum(rmn, bmn[:, :, i])
            rmx = jnp.maximum(rmx, bmx[:, :, i])
            rcnt = rcnt + cnt[:, :, i]
            d = rmx - rmn
            ha = (d[..., 0] + d[..., 1]) * d[..., 2] + d[..., 0] * d[..., 1]
            rc = rc.at[:, :, i].set(
                jnp.where(rcnt > 0, ha * rcnt.astype(jnp.float32), inf))
        return rc

    timeit("SAH bin sweep B-loop [f_cap,3,8,3]", sweep_bins, bmn, bmx, cnt)

    # one-hot expansion + masked select [n, 72]
    @jax.jit
    def onehot_mask(b3, pb):
        onehot = b3[:, :, None] == jnp.arange(B, dtype=jnp.int32)
        vals = jnp.where(onehot[:, :, :, None], pb[:, None, None, :], 1e30)
        return vals.reshape(n, dim * B * dim)

    timeit("one-hot mask expand [n,72]", onehot_mask, b3, pb)


if __name__ == "__main__":
    main()
