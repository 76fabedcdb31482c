"""Wavefront traversal: hit parity against the C++ reference oracle."""

import os

import jax.numpy as jnp
import numpy as np

from bvh_tpu.build.binned import build_binned
from bvh_tpu.core.ray import Ray
from bvh_tpu.geom.tri import PrecomputedTri
from bvh_tpu.io.serialize import load_bvh
from bvh_tpu.traverse.wavefront import intersect_tris

from helpers import scene_arrays, tris_from_array

W = H = 64
INVALID = np.uint32(0xFFFFFFFF)


def primary_rays(dtype=jnp.float32):
    """The CTest camera: eye (0,1,2), dir (0,0,-1), up (0,1,0), WxH grid
    (reference: test/benchmark.cpp:343-359, test/CMakeLists.txt:16-24)."""
    eye = np.asarray([0.0, 1.0, 2.0], np.float32)
    d = np.asarray([0.0, 0.0, -1.0], np.float32)
    d = d / np.linalg.norm(d)
    up0 = np.asarray([0.0, 1.0, 0.0], np.float32)
    right = np.cross(d, up0)
    right = right / np.linalg.norm(right)
    up = np.cross(right, d)
    x = np.arange(W, dtype=np.float32)
    y = np.arange(H, dtype=np.float32)
    u = 2.0 * x / W - 1.0
    v = 2.0 * y / H - 1.0
    uu, vv = np.meshgrid(u, v, indexing="xy")  # y-major ray order
    dirs = d[None, :] + uu.reshape(-1, 1) * right[None, :] + vv.reshape(-1, 1) * up[None, :]
    org = np.broadcast_to(eye, dirs.shape)
    return Ray.make(jnp.asarray(org, dtype), jnp.asarray(dirs, dtype))


def permuted_tri_flat(bvh, cornell_tris):
    tri = tris_from_array(cornell_tris)
    flat = PrecomputedTri.from_tri(tri).as_flat()
    perm = jnp.asarray(np.asarray(bvh.prim_ids[: int(bvh.prim_count)]).astype(np.int64))
    return flat[perm]


def assert_hits_match(got_prim, got_t, want_prim, want_t, max_tie_frac=0.002):
    """Hit/miss flags must agree exactly; prim ids must agree except for
    coplanar ties, where distances must still match to float tolerance.
    Ties happen when two primitives intersect a ray at (nearly) the same
    t and float reassociation flips which one survives the `t <= tmax`
    overwrite — the C++ reference itself is compiler-sensitive there."""
    got_miss = got_prim == INVALID
    want_miss = want_prim == INVALID
    np.testing.assert_array_equal(got_miss, want_miss)

    mask = ~want_miss
    np.testing.assert_allclose(got_t[mask], want_t[mask], rtol=1e-5, atol=1e-6)

    diff = mask & (got_prim != want_prim)
    assert diff.sum() <= max_tie_frac * max(1, mask.sum()), (
        f"{diff.sum()} prim mismatches beyond tie budget"
    )


def test_closest_hit_matches_reference_on_golden_bvh(
    golden_dir, cornell_tris, golden_hits
):
    """Same tree as the oracle (deserialized), robust traversal."""
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    rays = primary_rays()
    hit = intersect_tris(bvh, tri_flat, rays, robust=True, permuted=True)
    assert_hits_match(
        np.asarray(hit.prim_pos), np.asarray(hit.t),
        golden_hits["prim_id"], golden_hits["t"],
    )
    # u/v must match wherever the same primitive was selected.
    same = golden_hits["prim_id"] == np.asarray(hit.prim_pos)
    same &= golden_hits["prim_id"] != INVALID
    np.testing.assert_allclose(
        np.asarray(hit.u)[same], golden_hits["u"][same], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hit.v)[same], golden_hits["v"][same], rtol=1e-4, atol=1e-5
    )


def test_fast_traversal_agrees_with_robust(golden_dir, cornell_tris, golden_hits):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    rays = primary_rays()
    hit = intersect_tris(bvh, tri_flat, rays, robust=False, permuted=True)
    assert_hits_match(
        np.asarray(hit.prim_pos), np.asarray(hit.t),
        golden_hits["prim_id"], golden_hits["t"],
    )


def test_any_hit_matches_reference(golden_dir, cornell_tris, golden_anyhit):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    rays = primary_rays()
    hit = intersect_tris(bvh, tri_flat, rays, any_hit=True, robust=True, permuted=True)
    assert np.array_equal(np.asarray(hit.hit).astype(np.uint8), golden_anyhit)


def test_own_build_hits_match_reference(golden_dir, cornell_tris, golden_hits):
    """Our binned build (different topology than the oracle's sweep tree)
    must still find the same closest hits: hit results are
    topology-independent (up to coplanar ties)."""
    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    rays = primary_rays()
    hit = intersect_tris(bvh, flat, rays, robust=True, permuted=False)
    # prim_id here is the ORIGINAL tri index; golden prim ids index the
    # oracle's permuted array -> map through the oracle permutation.
    golden_bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    perm = np.asarray(golden_bvh.prim_ids)
    want_prim = np.where(
        golden_hits["prim_id"] != INVALID,
        perm[np.minimum(golden_hits["prim_id"], len(perm) - 1)],
        INVALID,
    ).astype(np.uint32)
    # cornell_box.obj contains coplanar overlapping quads (e.g. tris
    # 0/6 and 31/33 intersect grazing rays at the same t to the ULP);
    # with a different topology the equal-t overwrite order flips for
    # ~2% of rays. Distances are still asserted equal above.
    assert_hits_match(
        np.asarray(hit.prim_id), np.asarray(hit.t), want_prim, golden_hits["t"],
        max_tie_frac=0.05,
    )


def test_traversal_stats_nonzero(golden_dir, cornell_tris):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    rays = primary_rays()
    hit = intersect_tris(bvh, tri_flat, rays, robust=True, permuted=True)
    assert int(np.asarray(hit.stats.visited_nodes).sum()) > 0
    assert int(np.asarray(hit.stats.visited_leaves).sum()) > 0
