"""Binned SAH builder: structural invariants and quality checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.sah import TopDownConfig, node_half_area

from helpers import check_bvh_invariants, scene_arrays


def test_build_two_tris():
    tris = np.asarray(
        [
            [[1, -1, 1], [1, 1, 1], [-1, 1, 1]],
            [[1, -1, 1], [-1, -1, 1], [-1, 1, 1]],
        ],
        np.float32,
    )
    mn, mx, centers, _ = scene_arrays(tris)
    bvh = build_binned(mn, mx, centers)
    check_bvh_invariants(bvh, 2)
    rmn, rmx = bvh.root_bbox()
    np.testing.assert_allclose(np.asarray(rmn), [-1, -1, 1])
    np.testing.assert_allclose(np.asarray(rmx), [1, 1, 1])


def test_build_cornell(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    check_bvh_invariants(bvh, len(cornell_tris))
    # Sanity: a sane SAH tree over 36 cornell tris is within a modest
    # node budget (the reference sweep builds 37).
    assert int(bvh.node_count) <= 71


def test_build_single_prim():
    mn = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    mx = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    c = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    bvh = build_binned(mn, mx, c)
    assert int(bvh.node_count) == 1
    assert int(bvh.index[0]) == (0 << 4 | 1)  # leaf(first=0, count=1)


@pytest.mark.parametrize("n", [2, 3, 7, 33, 100, 257])
@pytest.mark.slow
def test_build_random_sizes(n):
    rng = np.random.default_rng(n)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32)
    mn = jnp.asarray(pts - ext)
    mx = jnp.asarray(pts + ext)
    c = jnp.asarray(pts)
    bvh = build_binned(mn, mx, c)
    check_bvh_invariants(bvh, n)


def test_build_identical_centers():
    """All prims at the same point: SAH can never separate them, the
    median fallback must (binned_sah_builder.h:118-126)."""
    n = 40
    mn = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    mx = jnp.tile(jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32), (n, 1))
    c = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32), (n, 1))
    bvh = build_binned(mn, mx, c)
    check_bvh_invariants(bvh, n)
    # Every leaf must respect max_leaf_size = 8.
    nc = int(bvh.node_count)
    index = np.asarray(bvh.index[:nc])
    counts = index & 15
    assert counts.max() <= 8


def test_build_max_leaf_respected(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    cfg = TopDownConfig(max_leaf_size=4)
    bvh = build_binned(mn, mx, centers, cfg)
    nc = int(bvh.node_count)
    index = np.asarray(bvh.index[:nc])
    assert (index & 15).max() <= 4
    check_bvh_invariants(bvh, len(cornell_tris))


def test_build_is_jittable(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    fn = jax.jit(build_binned)
    bvh = fn(mn, mx, centers)
    check_bvh_invariants(bvh, len(cornell_tris))


def test_build_deterministic(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    a = build_binned(mn, mx, centers)
    b = build_binned(mn, mx, centers)
    assert np.array_equal(np.asarray(a.index), np.asarray(b.index))
    assert np.array_equal(np.asarray(a.prim_ids), np.asarray(b.prim_ids))


def test_sato_left_child_larger(cornell_tris):
    """SATO ordering: left child has half-area >= right child
    (top_down_sah_builder.h:100-108)."""
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    nc = int(bvh.node_count)
    index = np.asarray(bvh.index[:nc])
    ha = np.asarray(node_half_area(bvh.bounds[:nc]))
    for i in range(nc):
        if index[i] & 15:
            continue
        ci = int(index[i] >> 4)
        assert ha[ci] >= ha[ci + 1] - 1e-6
