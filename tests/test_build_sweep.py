"""Sweep SAH builder: invariants + topology parity with the oracle."""

import os

import numpy as np
import pytest

from bvh_tpu.build.sah import TopDownConfig, node_half_area
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.io.serialize import load_bvh

from helpers import check_bvh_invariants, scene_arrays

pytestmark = pytest.mark.slow  # compile-heavy (builder while_loops)


def test_sweep_cornell_invariants(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = build_sweep(mn, mx, centers)
    check_bvh_invariants(bvh, len(cornell_tris))


def test_sweep_matches_reference_tree_shape(golden_dir, cornell_tris):
    """The oracle's golden BVH is a serial sweep build with default
    config. Exact node ORDER differs (BFS vs DFS emission), but the
    node count and the leaf-size multiset must match if our split
    decisions replicate the reference's."""
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    ours = build_sweep(mn, mx, centers)
    ref = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    assert int(ours.node_count) == int(ref.node_count)

    def leaf_sizes(bvh):
        nc = int(bvh.node_count)
        idx = np.asarray(bvh.index[:nc])
        counts = idx & 15
        return sorted(counts[counts > 0].tolist())

    assert leaf_sizes(ours) == leaf_sizes(ref)


def test_sweep_sah_cost_not_worse_than_binned(cornell_tris):
    """Sweep (exact SAH) should produce a tree with total SAH cost at
    most the binned (approximate) builder's."""
    from bvh_tpu.build.binned import build_binned

    mn, mx, centers, _ = scene_arrays(cornell_tris)
    sw = build_sweep(mn, mx, centers)
    bn = build_binned(mn, mx, centers)

    def sah_cost(bvh):
        nc = int(bvh.node_count)
        idx = np.asarray(bvh.index[:nc])
        ha = np.asarray(node_half_area(bvh.bounds[:nc]))
        counts = idx & 15
        # leaf cost: area * count; inner cost: area * 1
        return float(np.sum(np.where(counts > 0, ha * counts, ha)))

    assert sah_cost(sw) <= sah_cost(bn) * 1.05


@pytest.mark.parametrize("n", [2, 5, 33, 128])
def test_sweep_random_sizes(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(1000 + n)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32)
    bvh = build_sweep(jnp.asarray(pts - ext), jnp.asarray(pts + ext), jnp.asarray(pts))
    check_bvh_invariants(bvh, n)


def test_sweep_identical_centers():
    import jax.numpy as jnp

    n = 40
    mn = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    mx = jnp.tile(jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32), (n, 1))
    c = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32), (n, 1))
    bvh = build_sweep(mn, mx, c)
    check_bvh_invariants(bvh, n)
    nc = int(bvh.node_count)
    assert (np.asarray(bvh.index[:nc]) & 15).max() <= 8
