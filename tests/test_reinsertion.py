"""Reinsertion optimizer: validity + SAH cost must not increase."""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.reinsertion import ReinsertionConfig, optimize_reinsertion
from bvh_tpu.build.sah import node_half_area
from bvh_tpu.core.types import Index

from helpers import check_bvh_invariants, scene_arrays


def random_scene(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.005, 0.05, (n, 3)).astype(np.float32)
    return jnp.asarray(pts - ext), jnp.asarray(pts + ext), jnp.asarray(pts)


def total_area(bvh):
    nc = int(bvh.node_count)
    ha = np.asarray(node_half_area(bvh.bounds[:nc]))
    return float(ha[1:].sum())  # root area is fixed


def check_leaf_set_unchanged(before, after, n):
    """Reinsertion moves subtrees; the multiset of leaves (their prim
    ranges) must be preserved."""

    def leaves(bvh):
        nc = int(bvh.node_count)
        idx = np.asarray(bvh.index[:nc])
        lf = idx[(idx & 15) > 0]
        return sorted(lf.tolist())

    assert leaves(before) == leaves(after)
    check_bvh_invariants(after, n)


def test_reinsertion_reduces_area(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    opt = optimize_reinsertion(bvh, ReinsertionConfig())
    assert total_area(opt) <= total_area(bvh) + 1e-5
    check_leaf_set_unchanged(bvh, opt, len(cornell_tris))


@pytest.mark.slow
def test_reinsertion_random_scene():
    mn, mx, c = random_scene(400, seed=11)
    bvh = build_binned(mn, mx, c)
    opt = optimize_reinsertion(bvh, ReinsertionConfig())
    assert total_area(opt) <= total_area(bvh) + 1e-4
    check_leaf_set_unchanged(bvh, opt, 400)


def test_reinsertion_preserves_hits(cornell_tris, golden_hits, golden_dir):
    import os

    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse.wavefront import intersect_tris
    from test_traverse import primary_rays, assert_hits_match, INVALID

    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = optimize_reinsertion(build_binned(mn, mx, centers))
    rays = primary_rays()
    hit = intersect_tris(bvh, flat, rays, robust=True, permuted=False)
    golden_bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    perm = np.asarray(golden_bvh.prim_ids)
    want_prim = np.where(
        golden_hits["prim_id"] != INVALID,
        perm[np.minimum(golden_hits["prim_id"], len(perm) - 1)],
        INVALID,
    ).astype(np.uint32)
    assert_hits_match(
        np.asarray(hit.prim_id), np.asarray(hit.t), want_prim, golden_hits["t"],
        max_tie_frac=0.05,
    )
