"""San-Miguel-class (10M tris) wide-treelet benchmark with the
two-level super scheme. Run ALONE (single TPU process).

Usage: python tools/bench_sanmiguel.py [--n 10000000] [--max-prims 1024]
       [--super-prims 0=auto] [--flat]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--max-prims", type=int, default=0,
                    help="0 = scale-derived (4096 at >=2M prims: the "
                         "round-4 A/B showed the wider fetch beats "
                         "more rounds at San-Miguel scale; 1024 below)")
    ap.add_argument("--super-prims", type=int, default=0)
    ap.add_argument("--flat", action="store_true",
                    help="disable the super level (round-2 flat config)")
    ap.add_argument("--block", type=int, default=0,
                    help="0 = scale-derived (wide_treelet_perf)")
    ap.add_argument("--tail-block", type=int, default=0)
    ap.add_argument("--top-block", type=int, default=8192)
    # capacity knobs default to 0 = scene-derived (wide_treelet_caps)
    # with exact-overflow auto-retry — the zero-knob contract
    ap.add_argument("--max-portals", type=int, default=0)
    ap.add_argument("--mps", type=int, default=0)
    ap.add_argument("--max-new", type=int, default=0)
    ap.add_argument("--k", type=int, default=0,
                    help="portals per selected ray per round; 0 = "
                         "library default (wide_treelet_perf)")
    ap.add_argument("--rc-div", type=int, default=8)
    ap.add_argument("--max-runs", type=int, default=4096)
    ap.add_argument("--max-rounds", type=int, default=0)
    ap.add_argument("--tail-cap", type=int, default=0)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--builder", choices=["lbvh", "mtf"], default="lbvh",
                    help="device builder for the BVH (mtf = mini-tree "
                         "fast, the SAH tree the High pipeline uses)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.build.lbvh import build_lbvh
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh, save_bvh
    from bvh_tpu.traverse.wide_treelet import (
        _lcm, _round_up, build_wide_treelets,
        wide_treelet_intersect_tris, wide_treelet_render_chain)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    if args.max_prims == 0:
        from bvh_tpu.traverse.wide_treelet import wide_treelet_max_prims

        args.max_prims = wide_treelet_max_prims(args.n)
        print(f"max_prims auto -> {args.max_prims} "
              f"(wide_treelet_max_prims)", flush=True)
    tris = sponza_class(args.n, seed=0)
    cache = f"/tmp/bench_{args.builder}_{args.n}.bvh"
    if not os.path.exists(cache):
        t0 = time.perf_counter()
        if args.builder == "mtf":
            from bvh_tpu.build.minitree import MiniTreeConfig
            from bvh_tpu.build.minitree_fast import build_minitree_fast

            bvh = build_minitree_fast(
                jnp.asarray(tris.min(axis=1), jnp.float32),
                jnp.asarray(tris.max(axis=1), jnp.float32),
                jnp.asarray(tris.mean(axis=1), jnp.float32),
                MiniTreeConfig())
        else:
            bvh = jax.jit(build_lbvh)(
                jnp.asarray(tris.min(axis=1)),
                jnp.asarray(tris.max(axis=1)),
                jnp.asarray(tris.mean(axis=1)))
        float(bvh.bounds[0, 0])
        print(f"{args.builder} build: {time.perf_counter()-t0:.1f} s",
              flush=True)
        save_bvh(bvh, cache)
    bvh = load_bvh(cache)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    R = args.rays * args.rays
    rays = primary_rays(eye, d, up, args.rays, args.rays)

    t0 = time.perf_counter()
    sp = (None if args.super_prims == 0 else args.super_prims)
    if args.flat:
        sp = 1 << 62  # larger than any subtree: super level off
    tl_cache = (f"/tmp/bench_tl_{args.builder}_{args.n}_{args.max_prims}_"
                f"{'flat' if args.flat else (sp or 'auto')}.npz"
                if args.builder != "lbvh" else
                f"/tmp/bench_tl_{args.n}_{args.max_prims}_"
                f"{'flat' if args.flat else (sp or 'auto')}.npz")
    if os.path.exists(tl_cache):
        z = np.load(tl_cache)
        from bvh_tpu.traverse.wide_treelet import WideTreelets
        tl = WideTreelets(
            top_node_t=jnp.asarray(z["top_node_t"]),
            top_root=int(z["top_root"]),
            table=jnp.asarray(z["table"]),
            n_prims=int(z["n_prims"]),
            n_wide=z["n_wide"],
            top_depth=int(z["top_depth"]),
            wide_depth=int(z["wide_depth"]),
            sup_table=jnp.asarray(z["sup_table"]),
            sup_depth=int(z["sup_depth"]),
        )
        print(f"treelet tables loaded from {tl_cache}", flush=True)
    else:
        tl = build_wide_treelets(bvh, flat, max_prims=args.max_prims,
                                 super_prims=sp)
        np.savez(tl_cache,
                 top_node_t=np.asarray(tl.top_node_t),
                 top_root=tl.top_root, table=np.asarray(tl.table),
                 n_prims=tl.n_prims, n_wide=tl.n_wide,
                 top_depth=tl.top_depth, wide_depth=tl.wide_depth,
                 sup_table=np.asarray(tl.sup_table),
                 sup_depth=tl.sup_depth)
    print(f"treelet build: {time.perf_counter()-t0:.1f} s  "
          f"T={tl.table.shape[0]} S={tl.sup_table.shape[0]} "
          f"P={tl.table.shape[2]} Ps={tl.sup_table.shape[2]} "
          f"top={tl.top_node_t.shape[1]} top_depth={tl.top_depth} "
          f"wide_depth={tl.wide_depth} sup_depth={tl.sup_depth}",
          flush=True)
    print(f"table HBM: {tl.table.nbytes/1e9:.2f} GB", flush=True)

    from bvh_tpu.traverse.wide_treelet import wide_treelet_perf

    perf = wide_treelet_perf(tl)
    blk = args.block or perf["block"]
    tblk = args.tail_block or perf["tail_block"]
    Rp = _round_up(R, _lcm(blk, args.top_block))
    kw = dict(block=blk, tail_block=tblk,
              top_block=args.top_block,
              max_portals=args.max_portals or None,
              max_rounds=args.max_rounds or None,
              portals_per_round=args.k or None, sel_cap=Rp // args.rc_div,
              mps=args.mps or None, max_new=args.max_new or None, k2=2,
              max_runs=args.max_runs,
              tail_cap=args.tail_cap or None)
    t0 = time.perf_counter()
    hit, diag = wide_treelet_intersect_tris(
        tl, rays, check_overflow=True, return_diag=True, **kw)
    n_hits = int(np.asarray(np.isfinite(hit.t)).sum())
    print(f"compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    slots = max(1.0, float(diag["lane_slots"]))
    ls = float(diag["lane_steps"])
    vli = float(diag["valid_lane_iters"])
    print(f"hits: {n_hits} rounds={int(diag['rounds'])} "
          f"block_iters={int(diag['block_iters'])} "
          f"lane_steps={int(ls)} "
          f"occ={ls/slots:.3f} "
          f"(run-padding {1.0 - vli/slots:.3f}, "
          f"drain {max(0.0, (vli - ls))/slots:.3f}) "
          f"ovf={int(diag['stack_overflow'])} "
          f"povf={int(diag['portal_overflow'])} "
          f"caps={diag['caps']}", flush=True)

    # the verified call resolved (and possibly auto-raised) the caps
    # and measured the exact stack high-water marks; the chain runs
    # with the observed-tight capacities (same results, leaner masks)
    kw.update(diag["caps_observed"])
    from bvh_tpu.cli.steady import steady_rate

    def make_chain(k):
        chain = wide_treelet_render_chain(tl, rays, k, **kw)
        return lambda: float(chain()[0])

    k1 = args.chain
    k2 = 3 * args.chain
    t0 = time.perf_counter()
    r, c, t1, t2 = steady_rate(make_chain, k1, k2)
    print(f"chain compile+measure: {time.perf_counter()-t0:.1f} s",
          flush=True)
    print(f"steady render: {r*1e3:.1f} ms = {R/r/1e6:.2f} Mrays/s "
          f"(dispatch overhead {c*1e3:.0f} ms/call; raw "
          f"{t1*1e3/k1:.1f} ms/render @K={k1}, {t2*1e3/k2:.1f} @K={k2})",
          flush=True)


if __name__ == "__main__":
    main()
