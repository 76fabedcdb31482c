"""Stage-level timing of build_minitree_fast on TPU.

Splits the pipeline into (a) device staging (grouping + sort +
counts), (b) the counts readback, (c) packing + group kernel, (d) the
pruning/top-tree/splice assembly, jits (c) and (d) separately with
forced readbacks. Run ALONE (single TPU process).

usage: python tools/profile_mtf.py [--n 262144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.build.group_kernel import group_forest_build
    from bvh_tpu.build.minitree import MiniTreeConfig
    from bvh_tpu.build.minitree_fast import _assemble, _staging_fn
    from bvh_tpu.io.scenes import sponza_class

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    config = MiniTreeConfig()
    tris = sponza_class(args.n, seed=0)
    bb_min = jnp.asarray(tris.min(axis=1))
    bb_max = jnp.asarray(tris.max(axis=1))
    centers = jnp.asarray(tris.mean(axis=1))
    n, dim = centers.shape

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return x

    def timeit(name, fn, *a):
        out = sync(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name:24s}: {ts[len(ts)//2]*1e3:9.1f} ms", flush=True)
        return out

    g_cap = min(1 << (config.log2_grid_dim * dim), n)
    stage = _staging_fn(config, g_cap)
    counts_all_dev, order = timeit("staging(group+sort)", stage, centers)

    t0 = time.perf_counter()
    counts_all = np.asarray(counts_all_dev)
    print(f"{'counts readback':24s}: {(time.perf_counter()-t0)*1e3:9.1f} ms",
          flush=True)
    counts = counts_all[counts_all > 0]
    G = len(counts)
    P = int(max(128, ((counts.max() + 127) // 128) * 128))
    NCAP = 2 * P
    counts_d = jnp.asarray(counts)
    print(f"G={G} P={P}", flush=True)

    import functools

    @jax.jit
    def pack_and_kernel(bb_min, bb_max, centers, order, counts):
        i32 = jnp.int32
        base_e = jnp.cumsum(counts, dtype=i32)
        base = base_e - counts
        s = jnp.arange(G * P, dtype=i32)
        g_s = s // P
        l_s = s % P
        ok = l_s < counts[g_s]
        q_s = jnp.clip(base[g_s] + l_s, 0, n - 1)
        src_prim = order[q_s]
        cc_g = jnp.where(ok, centers[src_prim].T, 0.0)
        mn_g = jnp.where(ok, bb_min[src_prim].T, 0.0)
        mx_g = jnp.where(ok, bb_max[src_prim].T, 0.0)
        pf = jnp.concatenate(
            [cc_g, mn_g, mx_g,
             jnp.zeros((16 - 3 * dim, G * P), jnp.float32)], axis=0)
        return group_forest_build(
            pf, counts, dim=dim, P=P, NCAP=NCAP,
            min_leaf=config.min_leaf_size, max_leaf=config.max_leaf_size,
            log_cluster=config.sah.log_cluster_size,
            cost_ratio=config.sah.cost_ratio, interpret=False)

    nbf, nbi, src, cnt = timeit("pack+kernel", pack_and_kernel,
                                bb_min, bb_max, centers, order, counts_d)

    @jax.jit
    def assemble(nbf, nbi, src, cnt, order, counts):
        i32 = jnp.int32
        base_e = jnp.cumsum(counts, dtype=i32)
        base = base_e - counts
        q = jnp.arange(n, dtype=i32)
        gq = jnp.searchsorted(base_e, q, side="right").astype(i32)
        gq = jnp.clip(gq, 0, G - 1)
        off_q = base[gq]
        flat_q = gq * P + (q - off_q)
        return _assemble(nbf, nbi, src, cnt, order, base, flat_q, off_q,
                         n, dim, G, P, NCAP, g_cap, config)

    bvh = timeit("assemble(prune+top)", assemble, nbf, nbi, src, cnt,
                 order, counts_d)
    print(f"nodes: {int(bvh.node_count)}", flush=True)

    # the sweep top tree alone, at the assemble's width
    from bvh_tpu.build.sah import TopDownConfig
    from bvh_tpu.build.sweep import build_sweep

    g2_cap = max(g_cap, min(4 * g_cap, n))
    rng = np.random.default_rng(0)
    mn = jnp.asarray(rng.uniform(-1, 0, (g2_cap, dim)), jnp.float32)
    mx = jnp.asarray(rng.uniform(0, 1, (g2_cap, dim)), jnp.float32)
    cc = (mn + mx) * 0.5
    top_cfg = TopDownConfig(sah=config.sah, min_leaf_size=1,
                            max_leaf_size=1)
    timeit(f"build_sweep({g2_cap})",
           jax.jit(lambda a, b, c: build_sweep(a, b, c, top_cfg)),
           mn, mx, cc)


if __name__ == "__main__":
    main()
