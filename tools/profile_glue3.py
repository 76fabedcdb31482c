"""Bisect the sponza render: phase A only vs +round1 vs full, via
max_rounds / sel_cap knobs on the x8 chain (one sync per sample)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = 262_144
    side = 1024
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse import wide_treelet as wt

    tris = sponza_class(n, seed=0)
    bvh = load_bvh(f"/tmp/bench_sponza_{n}.bvh")
    tri = Tri(*(jnp.asarray(tris[:, i]) for i in range(3)))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, side, side)
    R = side * side
    tl = wt.build_wide_treelets(bvh, flat, max_prims=1024)
    Rp = wt._round_up(R, wt._lcm(1024, 8192))
    base = dict(block=1024, tail_block=256, top_block=8192, top_stack=48,
                stack_depth=24, max_portals=32, max_rounds=64,
                portals_per_round=4, sel_cap=Rp // 8)

    K = 8

    def sample(name, **kw):
        cfg = dict(base, **kw)
        chain = wt.wide_treelet_render_chain(tl, rays, K, **cfg)
        float(chain()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain()[0])
            ts.append((time.perf_counter() - t0) / K)
        ms = sorted(ts)[1] * 1e3
        print(f"{name:34s} {ms:7.2f} ms/render", flush=True)
        return ms

    full = sample("full render")
    sample("phase A only (sel=1blk,mr=1)", sel_cap=1024, max_rounds=1)
    sample("A + round1 (mr=1)", max_rounds=1)
    sample("A + round1 + 1 outer (mr=2)", max_rounds=2)
    sample("full, tail_cap=32768", tail_cap=32768)
    sample("full, K=8 round1", portals_per_round=8)
    sample("full, sel=Rp/4", sel_cap=Rp // 4)
    print(f"full = {full:.2f}")


if __name__ == "__main__":
    main()
