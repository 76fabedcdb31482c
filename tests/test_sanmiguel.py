"""San-Miguel-class scale (BASELINE.md): build -> wide-treelet
traversal -> serialization round-trip at millions of primitives.

The default run uses 2M prims (measured green on this 1-core host);
CI sets BVH_TPU_SCALE_N=1000000 to size the run for GitHub's shared
runners, and BVH_TPU_BIG=1 runs the full 10M configuration (the
checked-in TPU numbers in BENCHMARKS_r3.txt come from
tools/bench_build.py and tools/bench_sanmiguel.py at 10M).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

if os.environ.get("BVH_TPU_BIG"):
    N = 10_000_000
else:
    N = int(os.environ.get("BVH_TPU_SCALE_N", 2_000_000))


def test_sanmiguel_end_to_end(tmp_path):
    from bvh_tpu.build.lbvh import build_lbvh
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh, save_bvh
    from bvh_tpu.traverse.wavefront import intersect_tris

    tris = sponza_class(N, seed=0)
    n = len(tris)
    assert n >= N * 0.9
    bb_min = jnp.asarray(tris.min(axis=1))
    bb_max = jnp.asarray(tris.max(axis=1))
    centers = jnp.asarray(tris.mean(axis=1))

    # Build on device (LBVH: the fast TPU-resident builder).
    bvh = jax.jit(build_lbvh)(bb_min, bb_max, centers)
    assert int(bvh.node_count) == 2 * n - 1

    # Serialization round-trip in the reference v2 byte format.
    path = str(tmp_path / "big.bvh")
    save_bvh(bvh, path)
    loaded = load_bvh(path)
    nc = int(bvh.node_count)
    np.testing.assert_array_equal(
        np.asarray(bvh.index[:nc]), np.asarray(loaded.index[:nc])
    )
    np.testing.assert_array_equal(
        np.asarray(bvh.bounds[:nc]), np.asarray(loaded.bounds[:nc])
    )
    np.testing.assert_array_equal(
        np.asarray(bvh.prim_ids), np.asarray(loaded.prim_ids)
    )

    # Traversal: a small primary-ray grid; every ray that hits must
    # return a primitive whose brute-force re-intersection matches t.
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, 64, 64)
    hit = intersect_tris(bvh, flat, rays, permuted=False)
    h = np.asarray(hit.hit)
    assert h.sum() > 100, "camera should see the scene"

    # Spot-verify 8 hits by re-intersecting the reported triangle.
    idx = np.nonzero(h)[0][:: max(1, h.sum() // 8)][:8]
    o = np.asarray(rays.org)[idx].astype(np.float64)
    dr = np.asarray(rays.dir)[idx].astype(np.float64)
    pid = np.asarray(hit.prim_id)[idx]
    t_claim = np.asarray(hit.t)[idx].astype(np.float64)
    p0 = tris[pid, 0].astype(np.float64)
    p1 = tris[pid, 1].astype(np.float64)
    p2 = tris[pid, 2].astype(np.float64)
    e1 = p0 - p1
    e2 = p2 - p0
    nrm = np.cross(e1, e2)
    c = p0 - o
    det = np.einsum("ij,ij->i", nrm, dr)
    t_ref = np.einsum("ij,ij->i", nrm, c) / det
    np.testing.assert_allclose(t_claim, t_ref, rtol=1e-4)
