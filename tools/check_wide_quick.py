"""Quick TPU correctness check of the wide-treelet path: sponza-class
262K, 1024x1024 primary rays, hit count vs the C++ oracle (81790)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse.wide_treelet import (
        _lcm, _round_up, build_wide_treelets, wide_treelet_intersect_tris)

    n = 262_144
    side = 1024
    tris = sponza_class(n, seed=0)
    cache = f"/tmp/bench_sponza_{n}.bvh"
    if not os.path.exists(cache):
        from bvh_tpu.api.native import NativeBvh3f, load_library
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
    rays = primary_rays(eye, d, up, side, side)

    tl = build_wide_treelets(bvh, flat, max_prims=1024)
    Rp = _round_up(side * side, _lcm(1024, 8192))
    kw = dict(block=1024, tail_block=256, top_block=8192, top_stack=16,
              stack_depth=24, max_portals=32, max_rounds=64,
              portals_per_round=4, sel_cap=Rp // 8)
    t0 = time.perf_counter()
    hit, diag = wide_treelet_intersect_tris(
        tl, rays, check_overflow=True, return_diag=True, **kw)
    n_hits = int(np.asarray(np.isfinite(hit.t)).sum())
    print(f"compile+run: {time.perf_counter()-t0:.1f} s")
    bi = int(diag['block_iters'])
    ls = int(diag['lane_steps'])
    print(f"hits: {n_hits} (oracle 81790) rounds={int(diag['rounds'])} "
          f"block_iters={bi} lane_steps={ls} "
          f"occupancy={ls / max(bi * 1024, 1):.3f} "
          f"ovf={int(diag['stack_overflow'])}")
    assert n_hits == 81790, n_hits

    # any-hit shadow smoke
    from bvh_tpu.core.ray import Ray
    light = jnp.asarray(eye, jnp.float32) + jnp.asarray(
        [0.0, 1.0, 0.0], jnp.float32)
    hitp = rays.org + rays.dir * jnp.where(
        jnp.isfinite(hit.t), hit.t, 0.0)[:, None]
    srays = Ray.make(hitp, light[None, :] - hitp, tmin=1e-4,
                     tmax=jnp.ones_like(hit.t))
    shit = wide_treelet_intersect_tris(
        tl, srays, any_hit=True, check_overflow=True, **kw)
    print(f"shadow hits: {int(np.asarray(np.isfinite(shit.t)).sum())}")
    print("OK")


if __name__ == "__main__":
    main()
