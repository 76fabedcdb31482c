"""Non-3D / non-f32 configuration benchmarks (VERDICT r2 #6).

- 2D and 4D f32 spheres through the dim-generic Pallas mega-kernel
  (traverse/pallas_sphere.py), plus 3D for cross-reference;
- 3D f64 triangles through the XLA wavefront (TPUs have no f64 vector
  unit; XLA emulates doubles — this is the honest f64 path).

Each sphere configuration is also parity-checked ON HARDWARE against
the XLA wavefront over a 16K-ray subset (the Mosaic-lowered kernel vs
the interpret-mode-tested numerics; the test suite deliberately never
touches the TPU, so this tool is the hardware parity gate — recorded
per round in BENCHMARKS_r*.txt).

Run ALONE (single TPU process).
usage: python tools/bench_dims.py [--m 1024] [--rays 262144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1024, help="prim count")
    ap.add_argument("--rays", type=int, default=262_144)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--f64-rays", type=int, default=16_384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.build.binned import build_binned
    from bvh_tpu.core.ray import Ray
    from bvh_tpu.traverse.pallas_sphere import pallas_intersect_spheres

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    R = args.rays

    def time_it(fn):
        out = fn()
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))  # sync
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], out

    # ---- spheres, dim in {2, 3, 4}, f32, Pallas ----------------------
    for dim in (2, 3, 4):
        rng = np.random.default_rng(dim)
        centers = jnp.asarray(
            rng.uniform(-1, 1, (args.m, dim)).astype(np.float32))
        radii = jnp.asarray(
            rng.uniform(0.02, 0.1, args.m).astype(np.float32))
        mn = centers - radii[:, None]
        mx = centers + radii[:, None]
        bvh = build_binned(mn, mx, centers)
        org = rng.uniform(-3, 3, (R, dim)).astype(np.float32)
        tgt = rng.uniform(-1, 1, (R, dim)).astype(np.float32)
        rays = Ray.make(jnp.asarray(org), jnp.asarray(tgt - org))
        dt, hit = time_it(lambda: pallas_intersect_spheres(
            bvh, centers, radii, rays))
        nh = int(np.isfinite(np.asarray(hit.t)).sum())
        print(f"{dim}D f32 spheres (pallas): {R/dt/1e6:7.2f} Mrays/s "
              f"({dt*1e3:.1f} ms, {nh} hits, m={args.m})", flush=True)

        # hardware parity vs the XLA wavefront (16K-ray subset): the
        # discrete result (which prim) must match exactly; t/v within
        # the documented FMA-contraction tolerance
        from bvh_tpu.traverse.wavefront import make_sphere_leaf_fn, traverse

        Rs = min(16_384, R)
        sub = Ray(org=rays.org[:Rs], dir=rays.dir[:Rs],
                  tmin=rays.tmin[:Rs], tmax=rays.tmax[:Rs])
        want = traverse(bvh, sub, make_sphere_leaf_fn(bvh, centers, radii))
        got_t = np.asarray(hit.t[:Rs])
        want_t = np.asarray(want.t)
        want_hit = np.asarray(want.hit)
        got_hit = np.isfinite(got_t)
        assert (got_hit == want_hit).all(), f"{dim}D hit-set mismatch"
        assert (np.asarray(hit.prim_id[:Rs])[got_hit]
                == np.asarray(want.prim_id)[want_hit]).all(), (
            f"{dim}D prim mismatch")
        np.testing.assert_allclose(got_t[got_hit], want_t[want_hit],
                                   rtol=2e-5)
        print(f"  parity vs wavefront (hardware, {Rs} rays): ok",
              flush=True)

    # ---- 3D f64 triangles, XLA wavefront -----------------------------
    jax.config.update("jax_enable_x64", True)
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.traverse.wavefront import intersect_tris

    rng = np.random.default_rng(7)
    m = args.m
    pts = rng.uniform(-1, 1, (m, 3))
    e1 = rng.uniform(-0.08, 0.08, (m, 3))
    e2 = rng.uniform(-0.08, 0.08, (m, 3))
    tris = np.stack([pts, pts + e1, pts + e2], axis=1)
    tri = Tri(*(jnp.asarray(tris[:, i], jnp.float64) for i in range(3)))
    mn, mx = tri.get_bbox()
    bvh = build_binned(mn, mx, tri.get_center())
    flat = PrecomputedTri.from_tri(tri).as_flat()
    Rd = args.f64_rays
    org = rng.uniform(-3, 3, (Rd, 3))
    tgt = rng.uniform(-1, 1, (Rd, 3))
    rays = Ray.make(jnp.asarray(org, jnp.float64),
                    jnp.asarray(tgt - org, jnp.float64))
    dt, hit = time_it(lambda: intersect_tris(bvh, flat, rays))
    nh = int(np.isfinite(np.asarray(hit.t)).sum())
    print(f"3D f64 tris (wavefront):   {Rd/dt/1e6:7.3f} Mrays/s "
          f"({dt*1e3:.1f} ms, {nh} hits, m={m})", flush=True)


if __name__ == "__main__":
    main()
