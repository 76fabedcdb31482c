"""Per-ray oracle check at scale (VERDICT #6): trace the sponza-class
ray set through the SAME BVH with (a) the C++ reference library
(tools/oracle_trace.cpp) and (b) our device traversal paths, and
compare per-ray results. Prints `hits_match: true/false` per config.

usage: python tools/check_oracle.py [--n 262144] [--rays 1024]
       [--paths wide_treelet]

Build the oracle first:
  g++ -std=c++20 -O2 -march=native -I/root/reference/src \
      -I/root/reference/test tools/oracle_trace.cpp -o /tmp/oracle_trace
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ORACLE = "/tmp/oracle_trace"
INVALID = np.uint32(0xFFFFFFFF)


BOUNDARY_PPM = 4  # allowed boundary-epsilon disagreements per million
# rays: Moller-Trumbore in f32 accepts/rejects hits within ~1 ulp of a
# triangle edge differently under TPU vs CPU FMA contraction (verified
# by f64 brute force on the mismatching rays; see PERFORMANCE.md).


def compare(name, our_pos, our_t, ref_pos, ref_t, rtol=1e-4, strict=False):
    our_pos = np.asarray(our_pos).astype(np.int64)
    ref_pos = ref_pos.astype(np.int64)
    ref_pos = np.where(ref_pos == 0xFFFFFFFF, -1, ref_pos)
    our_hit = our_pos >= 0
    ref_hit = ref_pos >= 0
    nh_our, nh_ref = int(our_hit.sum()), int(ref_hit.sum())
    same_hitset = our_hit == ref_hit
    pos_match = (our_pos == ref_pos) & same_hitset
    # ties: same t (within tolerance), different prim
    both = our_hit & ref_hit
    t_close = np.zeros_like(both)
    t_close[both] = np.abs(our_t[both] - ref_t[both]) <= (
        rtol * np.maximum(1.0, np.abs(ref_t[both])))
    tie = both & t_close & ~pos_match
    real_mismatch = ~(pos_match | tie)
    # Mismatches where WE found a strictly closer hit are reference
    # fast-path misses (the non-watertight FMA slab test culls a node
    # holding the true closest hit; f64 brute force confirmed ours on
    # every sampled case) — report them but do not count them against
    # us. Mismatches where the oracle is closer are OUR misses.
    # Under `strict` (the robust variant, whose slab test is watertight
    # by construction on BOTH sides) no such exception applies: every
    # real mismatch counts against the budget, either direction.
    ours_closer = real_mismatch & our_hit & (
        ~ref_hit | (our_t < ref_t - 1e-6 * np.maximum(1.0, np.abs(ref_t)))
    )
    ours_worse = real_mismatch if strict else (real_mismatch & ~ours_closer)
    n_worse = int(ours_worse.sum())
    ok = n_worse <= max(1, (BOUNDARY_PPM * len(our_pos)) // 1_000_000)
    print(f"{name}: hits {nh_our} vs oracle {nh_ref}; "
          f"exact prim match {int(pos_match.sum())}, ties {int(tie.sum())}, "
          f"ref-fast misses (ours closer) {int(ours_closer.sum())}, "
          f"our misses {n_worse}  ->  hits_match: {str(ok).lower()}",
          flush=True)
    if int(real_mismatch.sum()):
        idx = np.nonzero(real_mismatch)[0][:5]
        for i in idx:
            print(f"    ray {i}: ours (pos={our_pos[i]}, t={our_t[i]:.6f}) "
                  f"oracle (pos={ref_pos[i]}, t={ref_t[i]:.6f})", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--quality", type=int, default=2)
    ap.add_argument("--paths", nargs="*", default=["wide_treelet"])
    ap.add_argument("--robust", action="store_true",
                    help="also check the robust variant (exact-match bar)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from bvh_tpu.api.native import NativeBvh3f, load_library
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh

    n, side = args.n, args.rays
    tris = sponza_class(n, seed=0)
    bvh_path = f"/tmp/oracle_{n}_q{args.quality}.bvh"
    if not os.path.exists(bvh_path):
        nat = NativeBvh3f(load_library())
        h = nat.build(tris.min(axis=1), tris.max(axis=1),
                      tris.mean(axis=1), quality=args.quality)
        nat.save(h, bvh_path)
        nat.destroy(h)
    bvh = load_bvh(bvh_path)

    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, side, side)
    R = side * side
    rays_packed = np.zeros((R, 8), np.float32)
    rays_packed[:, 0:3] = np.asarray(rays.org)
    rays_packed[:, 3:6] = np.asarray(rays.dir)
    rays_packed[:, 6] = np.asarray(rays.tmin)
    rays_packed[:, 7] = np.asarray(rays.tmax)
    tris_f = tris.astype(np.float32).reshape(n, 9)
    tris_f.tofile(f"/tmp/oracle_tris_{n}.bin")
    rays_packed.tofile(f"/tmp/oracle_rays_{R}.bin")

    variants = [("fast", False)] + ([("robust", True)] if args.robust else [])
    oracle = {}
    for vname, rob in variants:
        out = f"/tmp/oracle_out_{n}_{R}_{vname}.bin"
        cmd = [ORACLE, bvh_path, f"/tmp/oracle_tris_{n}.bin",
               f"/tmp/oracle_rays_{R}.bin", out]
        if rob:
            cmd.append("--robust")
        subprocess.run(cmd, check=True)
        raw = np.fromfile(out, np.uint32).reshape(R, 4)
        oracle[vname] = (raw[:, 0], raw[:, 1:2].view(np.float32)[:, 0])

    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()

    all_ok = True
    for path in args.paths:
        if path == "wide_treelet":
            from bvh_tpu.traverse.wide_treelet import (
                build_wide_treelets, wide_treelet_intersect_tris)
            big = args.n > 4_000_000
            # the collect kernel's one-hot fetch needs (top pairs x
            # top_block) f32 in VMEM: shrink both at scale
            tl = build_wide_treelets(
                bvh, flat, max_prims=(8192 if big else 1024))
            wkw = dict(top_block=1024, block=1024) if big else {}
            for vname, rob in variants:
                hit = wide_treelet_intersect_tris(tl, rays, robust=rob, **wkw)
                pos = np.where(np.asarray(hit.t) < np.inf,
                               np.asarray(hit.prim_pos).astype(np.int64), -1)
                all_ok &= compare(f"wide_treelet/{vname}", pos,
                                  np.asarray(hit.t), *oracle[vname],
                                  strict=rob)
        else:
            print(f"unknown path {path}", flush=True)
            all_ok = False

    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
