"""Hardware benchmark for the wide-treelet path on the sponza-class
scene. Run ALONE (single TPU process).

Usage: python tools/bench_wide.py [--n 262144] [--rays 1024]
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
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--max-prims", type=int, nargs="*",
                    default=[512, 1024, 2048])
    ap.add_argument("--block", type=int, nargs="*", default=[2048])
    ap.add_argument("--top-block", type=int, default=2048)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--rc-div", type=int, default=4)
    ap.add_argument("--max-rounds", type=int, default=64)
    ap.add_argument("--any-hit", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.api.native import NativeBvh3f, load_library
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse.wide_treelet import (
        build_wide_treelets,
        wide_treelet_intersect_tris,
    )

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    tris = sponza_class(args.n, seed=0)
    # prefer the device-built high BVH (what bench.py's headline uses)
    import glob
    dev = sorted(glob.glob(f"/tmp/bench_sponza_dev_{args.n}_*.bvh"))
    if dev:
        cache = dev[0]
        print(f"using device-built BVH {cache}", flush=True)
    else:
        cache = f"/tmp/bench_sponza_{args.n}.bvh"
        if not os.path.exists(cache):
            nat = NativeBvh3f(load_library())
            t0 = time.perf_counter()
            h = nat.build(tris.min(axis=1), tris.max(axis=1),
                          tris.mean(axis=1), quality=2)
            print(f"native high build: {time.perf_counter() - t0:.2f} s",
                  flush=True)
            nat.save(h, cache)
            nat.destroy(h)
    bvh = load_bvh(cache)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, args.rays, args.rays)
    R = args.rays * args.rays
    pids = bvh.prim_ids

    for mp in args.max_prims:
        t0 = time.perf_counter()
        tl = build_wide_treelets(bvh, flat, max_prims=mp)
        t_pre = time.perf_counter() - t0
        T, _, P = tl.table.shape
        print(f"\nmax_prims={mp}: T={T} P={P} "
              f"top={tl.top_node_t.shape} pre={t_pre:.2f}s", flush=True)
        for blk in args.block:
            try:
                import bvh_tpu.traverse.wide_treelet as wtm
                Rp = wtm._round_up(R, wtm._lcm(blk, 8192))
                kw = dict(prim_ids=pids, block=blk,
                          top_block=8192,
                          portals_per_round=args.k,
                          sel_cap=max(blk, Rp // args.rc_div),
                          max_rounds=args.max_rounds,
                          check_overflow=False,
                          any_hit=args.any_hit)
                t0 = time.perf_counter()
                hit = wide_treelet_intersect_tris(tl, rays, **kw)
                nh = int(np.asarray(np.isfinite(hit.t)).sum())
                t_compile = time.perf_counter() - t0
                # pipelined timing: N dispatches, one sync at the end —
                # excludes the ~35 ms tunnel roundtrip the CPU reference
                # doesn't pay either
                NPIPE = 4
                float(wide_treelet_intersect_tris(tl, rays, **kw).t[0])
                t0 = time.perf_counter()
                for _ in range(NPIPE):
                    h2 = wide_treelet_intersect_tris(tl, rays, **kw)
                float(h2.t[0])
                t = (time.perf_counter() - t0) / NPIPE
                h3, diag = wide_treelet_intersect_tris(
                    tl, rays, return_diag=True, **kw)
                rounds = int(diag["rounds"])
                iters = float(diag["block_iters"])
                ovf = int(diag["stack_overflow"])
                print(f"  block={blk}: {R / t / 1e6:7.2f} Mrays/s "
                      f"({t * 1e3:.1f} ms, compile {t_compile:.1f}s, "
                      f"{nh} hits, {rounds} rounds, "
                      f"{iters/1e3:.0f}K block-iters, ovf={ovf})",
                      flush=True)
            except Exception as e:
                print(f"  block={blk}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
