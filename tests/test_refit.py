"""Refit and bottom-up machinery tests (reference: bvh.h:184-218)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.traverse.refit import compute_parents, leaf_of_position, refit

from helpers import check_bvh_invariants, scene_arrays

pytestmark = pytest.mark.slow  # compile-heavy (builder while_loops)


def test_refit_identity(cornell_tris):
    """Refitting with the same primitive boxes reproduces the bounds."""
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    re = refit(bvh, mn, mx)
    nc = int(bvh.node_count)
    np.testing.assert_allclose(
        np.asarray(re.bounds[:nc]), np.asarray(bvh.bounds[:nc]), rtol=1e-6
    )


def test_refit_after_move(cornell_tris):
    """Translate all prims; refit must translate all node bounds."""
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    offset = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    re = refit(bvh, mn + offset, mx + offset)
    nc = int(bvh.node_count)
    rows = np.asarray(bvh.bounds[:nc])
    expected = rows + np.asarray([1, 1, 2, 2, 3, 3], np.float32)
    np.testing.assert_allclose(np.asarray(re.bounds[:nc]), expected, rtol=1e-5)
    check_bvh_invariants(re, len(cornell_tris))


def test_compute_parents(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    parents = np.asarray(compute_parents(bvh))
    nc = int(bvh.node_count)
    index = np.asarray(bvh.index[:nc])
    for i in range(nc):
        if index[i] & 15:
            continue
        ci = index[i] >> 4
        assert parents[ci] == i and parents[ci + 1] == i
    assert parents[0] == 0


def test_leaf_of_position(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    owner = np.asarray(leaf_of_position(bvh))
    nc = int(bvh.node_count)
    index = np.asarray(bvh.index[:nc])
    for i in range(nc):
        count = index[i] & 15
        if count:
            first = index[i] >> 4
            assert np.all(owner[first: first + count] == i)


def test_required_stack_depth(cornell_tris):
    from bvh_tpu.traverse.stack import max_depth, required_stack_depth
    from helpers import scene_arrays
    from bvh_tpu.build.binned import build_binned

    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    h = int(max_depth(bvh))
    assert 2 <= h < 20
    assert required_stack_depth(bvh) >= h + 1
