"""Reproducible multi-config benchmark suite.

Runs the BASELINE.md benchmark configurations end-to-end on the
current device and prints one line per config. Usage:

    python tools/bench_suite.py [--quick]

Configs (mirroring BASELINE.json's list):
- cornell primary rays (closest, fast + robust) — Pallas kernel
- cornell shadow rays (any-hit, SATO)
- sponza-class 262K: treelet traversal (primary) + native build rates
- builder throughputs (native C++ binned/sweep+reinsertion)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def median_time(fn, iters=3):
    fn()  # warmup/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the 262K-prim configs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.api.flat import BuildConfig, bvh3f
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.core.ray import Ray
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.obj import load_obj
    from bvh_tpu.traverse.pallas_kernel import pallas_intersect_tris
    from bvh_tpu.traverse.stack import required_stack_depth

    dev = jax.devices()[0].platform
    print(f"device: {dev}")
    R = 1024 * 1024

    # ---- cornell -----------------------------------------------------
    p0, p1, p2 = load_obj("/root/reference/test/scenes/cornell_box.obj")
    tri = Tri(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    mn, mx = tri.get_bbox()
    bvh = bvh3f.build(mn, mx, tri.get_center(), BuildConfig())
    perm = jnp.asarray(np.asarray(bvh.prim_ids).astype(np.int64))
    flat = PrecomputedTri.from_tri(tri).as_flat()[perm]
    rays = primary_rays([0, 1, 2], [0, 0, -1], [0, 1, 0], 1024, 1024)
    depth = max(16, required_stack_depth(bvh))

    def run(**kw):
        h = pallas_intersect_tris(bvh, flat, rays, permuted=True,
                                  block=8192, stack_depth=depth, **kw)
        h.t.block_until_ready()
        return h

    hit = run()
    t = median_time(lambda: run())
    print(f"cornell primary (fast):   {R / t / 1e6:7.2f} Mrays/s  "
          f"({int(np.asarray(hit.hit).sum())} hits)")
    t = median_time(lambda: run(robust=True))
    print(f"cornell primary (robust): {R / t / 1e6:7.2f} Mrays/s")

    light = jnp.asarray([0.0, 1.9, 0.0], jnp.float32)
    hp = rays.org + rays.dir * hit.t[:, None]
    origin = jnp.where(hit.hit[:, None], hp, rays.org)
    srays = Ray.make(origin, light[None, :] - origin, tmin=1e-4,
                     tmax=jnp.ones_like(hit.t))

    def run_shadow():
        h = pallas_intersect_tris(bvh, flat, srays, permuted=True,
                                  any_hit=True, block=8192,
                                  stack_depth=depth)
        h.t.block_until_ready()

    t = median_time(run_shadow)
    print(f"cornell shadow (any-hit): {R / t / 1e6:7.2f} Mrays/s")

    if args.quick:
        return

    # ---- sponza-class 262K -------------------------------------------
    from bvh_tpu.api.native import NativeBvh3f, load_library
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse.treelet import build_treelets, treelet_intersect_tris

    tris = sponza_class(262_144, seed=0)
    s_mn = tris.min(axis=1)
    s_mx = tris.max(axis=1)
    s_c = tris.mean(axis=1)
    nat = NativeBvh3f(load_library())
    t0 = time.perf_counter()
    h = nat.build(s_mn, s_mx, s_c, quality=0)
    t_binned = time.perf_counter() - t0
    nat.destroy(h)
    print(f"sponza build native binned: {len(tris) / t_binned / 1e6:5.2f} Mprims/s")
    t0 = time.perf_counter()
    h = nat.build(s_mn, s_mx, s_c, quality=2)
    t_high = time.perf_counter() - t0
    nat.save(h, "/tmp/bench_sponza.bvh")
    nat.destroy(h)
    print(f"sponza build native high:   {len(tris) / t_high / 1e6:5.2f} Mprims/s")

    sbvh = load_bvh("/tmp/bench_sponza.bvh")
    s_tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
                jnp.asarray(tris[:, 2]))
    s_flat = PrecomputedTri.from_tri(s_tri).as_flat()
    tl = build_treelets(sbvh, s_flat, permuted=False, max_nodes=1024)
    eye, d, up = scene_camera(tris)
    s_rays = primary_rays(eye, d, up, 1024, 1024)
    kw = dict(prim_ids=np.asarray(sbvh.prim_ids))

    hit = treelet_intersect_tris(tl, s_rays, **kw)  # warm buckets
    t0 = time.perf_counter()
    hit = treelet_intersect_tris(tl, s_rays, **kw)
    t = time.perf_counter() - t0
    print(f"sponza primary (treelet):  {R / t / 1e6:6.3f} Mrays/s  "
          f"({int(np.asarray(hit.hit).sum())} hits)")


if __name__ == "__main__":
    main()
