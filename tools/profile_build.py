"""Profile the TPU build path: which primitive ops make build_minitree
slow (VERDICT #3: 0.005 Mprims/s -> target >= 0.5 Mprims/s).

Times (a) the candidate low-level formulations (scatter vs cumsum vs
flagged associative_scan vs sort) at n=262144, (b) one binned round,
(c) the full mini-tree build.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(r):
    """block_until_ready does NOT block on the axon platform; force a
    host readback of one scalar to serialize."""
    leaf = jax.tree.leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return r


def timeit(name, fn, *args, reps=5):
    try:
        r = sync(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"  {name:42s} {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)
        return r
    except Exception as e:
        print(f"  {name:42s} FAILED {str(e)[:120]}", flush=True)
        return None


def main():
    n = 262_144
    dim, B = 3, 8
    cap = 2 * n
    f_cap = n // 2
    rng = np.random.default_rng(0)

    print(f"device: {jax.devices()[0].platform}", flush=True)
    print(f"== primitive ops at n={n} ==", flush=True)

    f = jnp.asarray(rng.integers(0, f_cap, n), jnp.int32)
    b = jnp.asarray(rng.integers(0, B, (n, dim)), jnp.int32)
    pb = jnp.asarray(rng.random((n, dim)), jnp.float32)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    vals144 = jnp.asarray(rng.random((n, 144)), jnp.float32)
    heads = jnp.asarray(rng.random(n) < 0.01)

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

    @jax.jit
    def scatter_set_perm(perm, pb):
        return jnp.zeros_like(pb).at[perm].set(pb)

    @jax.jit
    def scatter_set_perm_unique(perm, pb):
        return jnp.zeros_like(pb).at[perm].set(pb, unique_indices=True)

    @jax.jit
    def sort_perm(perm, pb):
        out = jax.lax.sort((perm,) + tuple(pb[:, i] for i in range(dim)),
                           num_keys=1)
        return jnp.stack(out[1:], axis=1)

    @jax.jit
    def cumsum24(b):
        onehot = (b[:, :, None] == jnp.arange(B)[None, None, :])
        return jnp.cumsum(onehot.reshape(n, dim * B).astype(jnp.int32), axis=0)

    @jax.jit
    def flagged_scan144(heads, vals):
        def comb(x, y):
            fx, vx = x
            fy, vy = y
            return fx | fy, jnp.where(fy[..., None], vy, jnp.minimum(vx, vy))
        _, v = jax.lax.associative_scan(comb, (heads, vals), axis=0)
        return v

    @jax.jit
    def flagged_scan12(heads, vals):
        def comb(x, y):
            fx, vx = x
            fy, vy = y
            return fx | fy, jnp.where(fy[..., None], vy, jnp.minimum(vx, vy))
        _, v = jax.lax.associative_scan(comb, (heads, vals[:, :12]), axis=0)
        return v

    # Harness sanity: known-FLOPs matmul. 8192^3*2 = 1.1 TFLOP; if this
    # reads ~0, block_until_ready is lying and all numbers are dispatch.
    m = jnp.ones((8192, 8192), jnp.bfloat16)
    timeit("sanity matmul 8192^3 bf16 (~3 ms real)",
           jax.jit(lambda a: a @ a), m)
    timeit("scatter-add n->bins [f,3,8]", scatter_add, f, b)
    timeit("scatter-min n->bins [f,3,8,3]", scatter_min, f, b, pb)
    timeit("scatter-set permutation [n,3]", scatter_set_perm, perm, pb)
    timeit("scatter-set perm unique [n,3]", scatter_set_perm_unique, perm, pb)
    timeit("sort-based permute [n,3]", sort_perm, perm, pb)
    timeit("cumsum [n,24] int32", cumsum24, b)
    timeit("flagged ascan [n,144] f32", flagged_scan144, heads, vals144)
    timeit("flagged ascan [n,12] f32", flagged_scan12, heads, vals144)

    print("== one binned round (forest state) ==", flush=True)
    from bvh_tpu.build import frontier
    from bvh_tpu.build.binned import _round
    from bvh_tpu.build.sah import TopDownConfig

    tris = rng.random((n, 3, 3), np.float32)
    bb_min = jnp.asarray(tris.min(axis=1))
    bb_max = jnp.asarray(tris.max(axis=1))
    centers = jnp.asarray(tris.mean(axis=1))
    cfg = TopDownConfig()

    state0 = frontier.init_state(bb_min, bb_max, cfg.min_leaf_size)
    round_j = jax.jit(lambda s: _round(s, bb_min, bb_max, centers, cfg))
    s1 = timeit("round 1 (1 open node)", round_j, state0)
    if s1 is not None:
        s = s1
        for i in (2, 3, 4):
            s = timeit(f"round {i} ({2**(i-1)}-ish open)", round_j, s)
        # advance to a mid-depth state
        for _ in range(10):
            s = round_j(s)
        jax.block_until_ready(s)
        timeit("round 15 (wide frontier)", round_j, s)

        # 8 rounds chained in ONE jit: separates per-call dispatch
        # overhead from real per-round device time.
        @jax.jit
        def rounds8(s):
            return jax.lax.fori_loop(
                0, 8, lambda i, st: _round(st, bb_min, bb_max, centers, cfg), s
            )

        timeit("8 chained rounds (one jit)", rounds8, state0)

    print("== full builds ==", flush=True)
    from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
    from bvh_tpu.build.binned import build_binned

    bb = jax.jit(build_binned)
    t0 = time.perf_counter()
    r = jax.block_until_ready(bb(bb_min, bb_max, centers))
    print(f"  build_binned compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bb(bb_min, bb_max, centers))
    dt = time.perf_counter() - t0
    print(f"  build_binned steady: {dt:.2f} s = {n/dt/1e6:.3f} Mprims/s",
          flush=True)

    bm = jax.jit(lambda a, b_, c: build_minitree(a, b_, c, MiniTreeConfig()))
    t0 = time.perf_counter()
    jax.block_until_ready(bm(bb_min, bb_max, centers))
    print(f"  build_minitree compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(bm(bb_min, bb_max, centers))
    dt = time.perf_counter() - t0
    print(f"  build_minitree steady: {dt:.2f} s = {n/dt/1e6:.3f} Mprims/s",
          flush=True)


if __name__ == "__main__":
    main()
