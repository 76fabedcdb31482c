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
