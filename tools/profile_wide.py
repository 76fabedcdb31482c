"""Decompose wide-treelet render time: phase A, portal sort, marginal
round cost. Run ALONE (single TPU process).

Usage: python tools/profile_wide.py [--n 262144] [--rays 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, n=3):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--max-prims", type=int, default=1024)
    ap.add_argument("--block", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.api.native import NativeBvh3f, load_library
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse import wide_treelet as wt

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    tris = sponza_class(args.n, seed=0)
    cache = f"/tmp/bench_sponza_{args.n}.bvh"
    if not os.path.exists(cache):
        nat = NativeBvh3f(load_library())
        h = nat.build(tris.min(axis=1), tris.max(axis=1),
                      tris.mean(axis=1), quality=2)
        nat.save(h, cache)
        nat.destroy(h)
    bvh = load_bvh(cache)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, args.rays, args.rays)
    R = args.rays * args.rays

    tl = wt.build_wide_treelets(bvh, flat, max_prims=args.max_prims)
    T, _, P = tl.table.shape
    print(f"T={T} P={P} top={tl.top_node_t.shape}", flush=True)

    # pack rays as the driver does
    block, top_block = args.block, 8192
    Rp = wt._round_up(R, wt._lcm(block, top_block))
    packed = jnp.zeros((8, Rp), jnp.float32)
    packed = packed.at[0:3, :R].set(rays.org.T)
    packed = packed.at[3:6, :R].set(rays.dir.T)
    packed = packed.at[6, :R].set(rays.tmin)
    packed = packed.at[7, :R].set(rays.tmax)
    packed.block_until_ready()

    # ---- phase A alone -------------------------------------------------
    from functools import partial

    import jax.experimental.pallas as pl
    from bvh_tpu.traverse.treelet import _collect_kernel

    MP, top_stack = 32, 48
    i32, f32 = jnp.int32, jnp.float32

    @jax.jit
    def phase_a(top_node_t, packed):
        root = jnp.full((8, 128), tl.top_root, i32)
        n_blocks = Rp // top_block
        grid_spec = pl.GridSpec(
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(top_node_t.shape, lambda i: (0, 0)),
                pl.BlockSpec((8, top_block), lambda i: (0, i)),
                pl.BlockSpec((8, 128), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((MP, top_block), lambda i: (0, i)),
                pl.BlockSpec((MP, top_block), lambda i: (0, i)),
                pl.BlockSpec((8, top_block), lambda i: (0, i)),
            ],
        )
        kernel = partial(_collect_kernel, dim=3, robust=False,
                         stack_depth=top_stack, max_portals=MP)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((MP, Rp), i32),
                jax.ShapeDtypeStruct((MP, Rp), f32),
                jax.ShapeDtypeStruct((8, Rp), i32),
            ],
        )(top_node_t, packed, root)

    t = timeit(lambda: jax.block_until_ready(phase_a(tl.top_node_t, packed)))
    print(f"phase A: {t*1e3:8.1f} ms", flush=True)
    ptid, ptent, cnt = jax.block_until_ready(phase_a(tl.top_node_t, packed))
    print(f"  portal counts: mean {np.asarray(cnt[0]).mean():.2f} "
          f"max {np.asarray(cnt[0]).max()}", flush=True)

    # ---- portal sort [MP, Rp] axis 0 ------------------------------------
    @jax.jit
    def psort(ptent, ptid):
        return jax.lax.sort((ptent, ptid), num_keys=1, dimension=0)

    t = timeit(lambda: jax.block_until_ready(psort(ptent, ptid)))
    print(f"portal sort [MP,Rp] axis0: {t*1e3:8.1f} ms", flush=True)

    # ---- 1M-wide sorts --------------------------------------------------
    key = jnp.asarray(np.random.randint(0, T, Rp, np.int32))
    iota = jnp.arange(Rp, dtype=i32)
    pay = [jnp.asarray(np.random.rand(Rp), f32) for _ in range(6)]

    @jax.jit
    def sort2(key, iota):
        return jax.lax.sort((key, iota), num_keys=1)

    @jax.jit
    def sort8(key, iota, *pay):
        return jax.lax.sort((key, iota) + pay, num_keys=1)

    t = timeit(lambda: jax.block_until_ready(sort2(key, iota)))
    print(f"sort 2-op [{Rp}]: {t*1e3:8.1f} ms", flush=True)
    t = timeit(lambda: jax.block_until_ready(sort8(key, iota, *pay)))
    print(f"sort 8-op [{Rp}]: {t*1e3:8.1f} ms", flush=True)

    # ---- 1M gathers -----------------------------------------------------
    idx = jnp.asarray(np.random.permutation(Rp).astype(np.int32))

    @jax.jit
    def gath(x, idx):
        return jnp.take(x, idx)

    t = timeit(lambda: jax.block_until_ready(gath(pay[0], idx)))
    print(f"gather 1-op [{Rp}]: {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def gath2d(x, idx):
        return jnp.take(x, idx, axis=0)

    x2 = jnp.asarray(np.random.rand(Rp, 8).astype(np.float32))
    t = timeit(lambda: jax.block_until_ready(gath2d(x2, idx)))
    print(f"gather [Rp,8] rows: {t*1e3:8.1f} ms", flush=True)

    # ---- pend_at-style masked max ----------------------------------------
    cursor = jnp.zeros((Rp,), i32)

    @jax.jit
    def pend(cursor, ptent, ptid):
        iota_mp = jax.lax.broadcasted_iota(i32, (MP, 1), 0)
        rowmask = iota_mp == cursor[None, :]
        pend_t = jnp.max(jnp.where(rowmask, ptent, -jnp.inf), axis=0)
        pend_tid = jnp.max(jnp.where(rowmask, ptid, -1), axis=0)
        return pend_t, pend_tid

    t = timeit(lambda: jax.block_until_ready(pend(cursor, ptent, ptid)))
    print(f"pend_at masked max [MP,Rp]: {t*1e3:8.1f} ms", flush=True)

    # flat-gather alternative
    ptent_flat = ptent.reshape(-1)

    @jax.jit
    def pend_flat(cursor, ptent_flat):
        return jnp.take(ptent_flat, cursor * Rp + iota)

    t = timeit(lambda: jax.block_until_ready(pend_flat(cursor, ptent_flat)))
    print(f"pend_at flat gather: {t*1e3:8.1f} ms", flush=True)

    # ---- full render at round limits -------------------------------------
    for mr in (1, 2, 8):
        kw = dict(prim_ids=bvh.prim_ids, block=block, max_rounds=mr)
        hit = wt.wide_treelet_intersect_tris(tl, rays, **kw)
        jax.block_until_ready(hit.t)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            h2 = wt.wide_treelet_intersect_tris(tl, rays, **kw)
            jax.block_until_ready(h2.t)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1]
        nh = int(np.asarray(np.isfinite(h2.t)).sum())
        print(f"full max_rounds={mr}: {t*1e3:8.1f} ms  "
              f"({R/t/1e6:.2f} Mrays/s, {nh} hits)", flush=True)


if __name__ == "__main__":
    main()
