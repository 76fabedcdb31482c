"""TPU validation of the two-level (super) path: sponza-class with
forced supers must return the exact oracle hit count (81790), matching
the flat scheme; then report steady-state timing vs flat."""

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

    tl = build_wide_treelets(bvh, flat, max_prims=1024,
                             super_prims=32768)
    print(f"T={tl.table.shape[0]} S={tl.sup_table.shape[0]} "
          f"Ps={tl.sup_table.shape[2]} top={tl.top_node_t.shape[1]}")
    Rp = _round_up(side * side, _lcm(1024, 8192))
    kw = dict(block=1024, tail_block=256, top_block=8192,
              max_portals=48, max_rounds=64,
              portals_per_round=4, sel_cap=Rp // 8, mps=16)
    t0 = time.perf_counter()
    hit, diag = wide_treelet_intersect_tris(
        tl, rays, check_overflow=True, return_diag=True, **kw)
    n_hits = int(np.asarray(np.isfinite(hit.t)).sum())
    print(f"compile+run: {time.perf_counter()-t0:.1f} s")
    print(f"hits: {n_hits} (oracle 81790) rounds={int(diag['rounds'])} "
          f"block_iters={int(diag['block_iters'])} "
          f"ovf={int(diag['stack_overflow'])} "
          f"povf={int(diag['portal_overflow'])}")
    assert n_hits == 81790, n_hits
    print("OK")


if __name__ == "__main__":
    main()
