"""Blocked and one-hot traversal modes must agree with the baseline."""

import os

import numpy as np

from bvh_tpu.io.serialize import load_bvh
from bvh_tpu.traverse.wavefront import intersect_tris

from test_traverse import permuted_tri_flat, primary_rays


def _hits(golden_dir, cornell_tris, **kw):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    rays = primary_rays()
    return intersect_tris(bvh, tri_flat, rays, permuted=True, **kw)


def test_onehot_equals_take(golden_dir, cornell_tris):
    a = _hits(golden_dir, cornell_tris, node_gather="take")
    b = _hits(golden_dir, cornell_tris, node_gather="onehot")
    np.testing.assert_array_equal(np.asarray(a.prim_pos), np.asarray(b.prim_pos))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))


def test_blocked_equals_unblocked(golden_dir, cornell_tris):
    a = _hits(golden_dir, cornell_tris, block_size=None)
    b = _hits(golden_dir, cornell_tris, block_size=1000)  # padding + 5 blocks
    np.testing.assert_array_equal(np.asarray(a.prim_pos), np.asarray(b.prim_pos))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))


def test_blocked_any_hit(golden_dir, cornell_tris, golden_anyhit):
    hit = _hits(golden_dir, cornell_tris, any_hit=True, robust=True, block_size=512)
    assert np.array_equal(np.asarray(hit.hit).astype(np.uint8), golden_anyhit)
