"""Mini-tree builder and canonicalize/extract tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.build.canonicalize import extract_bvh
from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.core.types import Index

from helpers import check_bvh_invariants, scene_arrays

pytestmark = pytest.mark.slow  # compile-heavy (builder while_loops)


def random_scene(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.005, 0.05, (n, 3)).astype(np.float32)
    return jnp.asarray(pts - ext), jnp.asarray(pts + ext), jnp.asarray(pts)


def test_minitree_cornell(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    cfg = MiniTreeConfig(enable_pruning=False)
    bvh = build_minitree(mn, mx, centers, cfg)
    check_bvh_invariants(bvh, len(cornell_tris))
    rmn, rmx = bvh.root_bbox()
    np.testing.assert_allclose(np.asarray(rmn), np.asarray(jnp.min(mn, 0)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rmx), np.asarray(jnp.max(mx, 0)), rtol=1e-6)


@pytest.mark.parametrize("n", [50, 500, 3000])
def test_minitree_random(n):
    mn, mx, c = random_scene(n, seed=n)
    bvh = build_minitree(mn, mx, c, MiniTreeConfig(enable_pruning=False))
    check_bvh_invariants(bvh, n)


def test_minitree_grouping_path(cornell_tris):
    """enable_pruning=True turns on small-bin merging (grouping scan)."""
    mn, mx, c = random_scene(2000, seed=7)
    bvh = build_minitree(mn, mx, c, MiniTreeConfig(enable_pruning=True,
                                                   parallel_threshold=256))
    check_bvh_invariants(bvh, 2000)


def test_minitree_deterministic():
    mn, mx, c = random_scene(777, seed=3)
    a = build_minitree(mn, mx, c)
    b = build_minitree(mn, mx, c)
    assert np.array_equal(np.asarray(a.index), np.asarray(b.index))
    assert np.array_equal(np.asarray(a.prim_ids), np.asarray(b.prim_ids))


def test_minitree_hits_match_sweep(cornell_tris, golden_hits, golden_dir):
    """Mini-tree topology must find the same hits as any valid tree."""
    import os

    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse.wavefront import intersect_tris
    from test_traverse import primary_rays, assert_hits_match, INVALID

    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = build_minitree(mn, mx, centers, MiniTreeConfig(enable_pruning=False))
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


def test_extract_bvh(cornell_tris):
    """Extract a child subtree; it must be a valid standalone BVH over
    the subset of primitives (reference: bvh.h:91-122)."""
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_sweep(mn, mx, centers)
    root_word = int(bvh.index[0])
    left_child = root_word >> 4
    sub = extract_bvh(bvh, left_child)
    nc = int(sub.node_count)
    pc = int(sub.prim_count)
    assert 1 <= nc < int(bvh.node_count)
    assert 1 <= pc < int(bvh.prim_count)
    # structural validity on the extracted prim subset
    idx = np.asarray(sub.index[:nc])
    first = idx >> 4
    count = idx & 15
    covered = np.zeros(pc, np.int32)
    for i in range(nc):
        if count[i]:
            covered[first[i]: first[i] + count[i]] += 1
        else:
            assert first[i] + 1 < nc and first[i] % 2 == 1
    assert np.all(covered == 1)
    # extracted root bbox matches the original child bbox
    omn, omx = bvh.get_node_bbox(left_child)
    smn, smx = sub.root_bbox()
    np.testing.assert_array_equal(np.asarray(omn), np.asarray(smn))
    np.testing.assert_array_equal(np.asarray(omx), np.asarray(smx))


def test_minitree_pruning_cuts_subtrees():
    """With an aggressive pruning ratio, subtrees get cut and the top
    tree grows more leaves than mini-trees; hits must be unaffected
    (reference: prune_mini_trees, 207-247)."""
    mn, mx, c = random_scene(2000, seed=21)
    no_prune = build_minitree(mn, mx, c, MiniTreeConfig(enable_pruning=False,
                                                        parallel_threshold=256))
    pruned = build_minitree(
        mn, mx, c,
        MiniTreeConfig(enable_pruning=True, pruning_area_ratio=0.5,
                       parallel_threshold=256),
    )
    check_bvh_invariants(pruned, 2000)
    # aggressive ratio must change the topology (more or different cuts)
    a = np.asarray(no_prune.index[: int(no_prune.node_count)])
    b = np.asarray(pruned.index[: int(pruned.node_count)])
    assert (len(a) != len(b)) or not np.array_equal(a, b)
