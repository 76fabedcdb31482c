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


def test_greedy_accept_matches_serial_replay():
    """The fixpoint conflict resolution must equal the reference's
    serial greedy loop (reinsertion_optimizer.h:254-265) exactly."""
    from bvh_tpu.build.reinsertion import _greedy_accept

    rng = np.random.default_rng(3)
    for trial in range(20):
        B = int(rng.integers(5, 400))
        cap = int(rng.integers(8, 64))  # small pool -> dense conflicts
        conflicts = rng.integers(0, cap, (5, B)).astype(np.int32)
        ok = rng.random(B) > 0.2

        got = np.asarray(_greedy_accept(
            jnp.asarray(conflicts), jnp.asarray(ok), cap))

        touched = np.zeros(cap, bool)
        want = np.zeros(B, bool)
        for i in range(B):  # rows arrive priority-sorted
            if not ok[i]:
                continue
            if not touched[conflicts[:, i]].any():
                want[i] = True
                touched[conflicts[:, i]] = True
        assert np.array_equal(got, want), (trial, B, cap)


def test_refit_exact_after_optimize():
    """After optimize, every inner node's bounds must equal the exact
    merge of its children (the dirty-path climb refit leaves no stale
    ancestor behind)."""
    mn, mx, c = random_scene(700, seed=5)
    bvh = build_binned(mn, mx, c)
    opt = optimize_reinsertion(bvh, ReinsertionConfig())
    nc = int(opt.node_count)
    index = np.asarray(opt.index[:nc])
    bounds = np.asarray(opt.bounds[:nc])
    first = (index >> 4).astype(np.int64)
    inner = (index & 15) == 0
    ii = np.nonzero(inner)[0]
    l, r = first[ii], first[ii] + 1
    merged = np.empty((len(ii), bounds.shape[1]), bounds.dtype)
    merged[:, 0::2] = np.minimum(bounds[l][:, 0::2], bounds[r][:, 0::2])
    merged[:, 1::2] = np.maximum(bounds[l][:, 1::2], bounds[r][:, 1::2])
    assert np.array_equal(bounds[ii], merged)
    check_leaf_set_unchanged(bvh, opt, 700)


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
