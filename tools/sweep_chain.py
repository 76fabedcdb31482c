"""Chain-based wide-treelet config sweep on the sponza-class scene.

Each config is timed with wide_treelet_render_chain (K renders inside
ONE jitted program — the same steady-state metric bench.py reports),
so numbers are directly comparable to the headline. Uses the
device-built high BVH cache when present (bench.py writes it).

usage: python tools/sweep_chain.py [--n 262144] [--chain 16]
         [--configs "block=512,tail_block=128;block=256,tail_block=128"]
Run ALONE (single TPU process).
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_configs(s):
    out = []
    for part in s.split(";"):
        cfg = {}
        for kv in part.split(","):
            if not kv.strip():
                continue
            k, v = kv.split("=")
            cfg[k.strip()] = int(v)
        out.append(cfg)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--max-prims", type=int, default=1024)
    ap.add_argument("--any-hit", action="store_true")
    ap.add_argument("--configs", type=str,
                    default="block=512,tail_block=128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse.wide_treelet import (
        _lcm, _round_up, build_wide_treelets, wide_treelet_render_chain)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    tris = sponza_class(args.n, seed=0)
    dev = sorted(glob.glob(f"/tmp/bench_sponza_dev_{args.n}_*.bvh"))
    assert dev, "run bench.py once to produce the device-built BVH cache"
    print(f"BVH: {dev[0]}", flush=True)
    bvh = load_bvh(dev[0])
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, args.rays, args.rays)
    R = args.rays * args.rays

    tl = build_wide_treelets(bvh, flat, max_prims=args.max_prims)
    print(f"T={tl.table.shape[0]} P={tl.table.shape[2]} "
          f"top={tl.top_node_t.shape[1]}", flush=True)

    K = args.chain
    for cfg in parse_configs(args.configs):
        blk = cfg.pop("block", 512)
        tb = cfg.pop("top_block", 8192)
        Rp = _round_up(R, _lcm(blk, tb))
        kw = dict(block=blk, tail_block=cfg.pop("tail_block", 128),
                  top_block=tb, top_stack=16, stack_depth=24,
                  max_portals=32, max_rounds=64,
                  portals_per_round=cfg.pop("k", 4),
                  sel_cap=Rp // cfg.pop("rc_div", 8),
                  any_hit=args.any_hit)
        kw.update({k: v for k, v in cfg.items()})
        label = f"block={blk} tail={kw['tail_block']} k={kw['portals_per_round']} sel=Rp/{Rp // kw['sel_cap']}"
        try:
            from bvh_tpu.cli.steady import steady_rate

            def make_chain(k, kw=kw):
                chain = wide_treelet_render_chain(tl, rays, k, **kw)
                return lambda: float(chain()[0])

            t0 = time.perf_counter()
            t, c, _, _ = steady_rate(make_chain, K, 4 * K)
            tc = time.perf_counter() - t0
            print(f"{label}: {R/t/1e6:7.2f} Mrays/s steady "
                  f"({t*1e3:.2f} ms/render, overhead {c*1e3:.0f} ms/call,"
                  f" compile+measure {tc:.0f}s)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
