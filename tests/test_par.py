"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.par.mesh import intersect_tris_sharded, make_mesh
from bvh_tpu.traverse.wavefront import intersect_tris

from helpers import scene_arrays
from test_traverse import primary_rays


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


def test_sharded_traversal_matches_single(mesh, cornell_tris):
    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    rays = primary_rays()
    single = intersect_tris(bvh, flat, rays, permuted=False)
    sharded = intersect_tris_sharded(bvh, flat, rays, mesh, permuted=False)
    np.testing.assert_array_equal(
        np.asarray(single.prim_pos), np.asarray(sharded.prim_pos)
    )
    np.testing.assert_array_equal(np.asarray(single.t), np.asarray(sharded.t))


def test_sharded_traversal_nondivisible(mesh, cornell_tris):
    """Ray counts that do not divide the mesh get padded correctly."""
    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    rays = primary_rays()
    rays = jax.tree.map(lambda x: x[:1003], rays)
    single = intersect_tris(bvh, flat, rays, permuted=False)
    sharded = intersect_tris_sharded(bvh, flat, rays, mesh, permuted=False)
    np.testing.assert_array_equal(
        np.asarray(single.prim_pos), np.asarray(sharded.prim_pos)
    )


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    t, prim = out
    assert t.shape == prim.shape
    assert int(np.isfinite(np.asarray(t)).sum()) > 0


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _bvh_prefix_equal(a, b):
    """Content equality over the valid prefix (array capacities may
    differ between builders, like the reference's operator== comparing
    vectors, bvh.h:30-31)."""
    na, nb = int(a.node_count), int(b.node_count)
    assert na == nb, (na, nb)
    np.testing.assert_array_equal(
        np.asarray(a.index[:na]), np.asarray(b.index[:nb])
    )
    np.testing.assert_array_equal(
        np.asarray(a.bounds[:na]), np.asarray(b.bounds[:nb])
    )
    np.testing.assert_array_equal(np.asarray(a.prim_ids), np.asarray(b.prim_ids))
    assert int(a.prim_count) == int(b.prim_count)


@pytest.mark.slow
@pytest.mark.parametrize("pruning", [False, True])
def test_sharded_minitree_bit_identical(mesh, pruning):
    """The shard_map tile-forest build must equal the single-device
    mini-tree build array-for-array (SURVEY.md section 5.8; the
    reference sorts ids per task for the same determinism,
    mini_tree_builder.h:122-124)."""
    from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
    from bvh_tpu.par.minitree_sharded import build_minitree_sharded

    rng = np.random.default_rng(11)
    n = 6000  # non-divisible by 8, multiple morton groups
    base = rng.random((n, 1, 3)).astype(np.float32)
    edge = (rng.random((n, 2, 3)).astype(np.float32) - 0.5) * 0.05
    tris = np.concatenate([base, base + edge], axis=1)
    mn, mx, centers, _ = scene_arrays(tris)
    cfg = MiniTreeConfig(enable_pruning=pruning, parallel_threshold=256,
                         log2_grid_dim=2)

    single = build_minitree(mn, mx, centers, cfg)
    sharded = build_minitree_sharded(mn, mx, centers, mesh, cfg)
    _bvh_prefix_equal(single, sharded)
