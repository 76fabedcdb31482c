"""Treelet two-phase traversal: parity with the single-level paths."""

import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.core.ray import Ray
from bvh_tpu.traverse.treelet import build_treelets, treelet_intersect_tris
from bvh_tpu.traverse.wavefront import intersect_tris

from helpers import scene_arrays
from test_traverse import assert_hits_match

pytestmark = pytest.mark.slow  # compile-heavy (builder while_loops)


def _random_scene(n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.005, 0.05, (n, 3)).astype(np.float32)
    return np.stack([pts - ext, pts, pts + ext], axis=1)


@pytest.mark.parametrize("max_nodes", [64, 256])
def test_treelet_matches_flat(max_nodes):
    import jax.numpy as jnp

    tris = _random_scene(1500, seed=5)
    mn, mx, centers, flat = scene_arrays(tris)
    bvh = build_binned(mn, mx, centers)
    tl = build_treelets(bvh, flat, permuted=False, max_nodes=max_nodes)
    assert tl.node_t.shape[0] > 1, "scene must decompose into treelets"

    rng = np.random.default_rng(0)
    org = rng.uniform(-3, 3, (512, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    d = tgt - org
    rays = Ray.make(jnp.asarray(org), jnp.asarray(d))

    want = intersect_tris(bvh, flat, rays, robust=True, permuted=False)
    got = treelet_intersect_tris(
        tl, rays, prim_ids=np.asarray(bvh.prim_ids),
        robust=True, block=256, top_block=512, interpret=True,
    )
    assert_hits_match(
        np.asarray(got.prim_id), np.asarray(got.t),
        np.asarray(want.prim_id), np.asarray(want.t), max_tie_frac=0.004,
    )


def test_treelet_any_hit():
    import jax.numpy as jnp

    tris = _random_scene(800, seed=9)
    mn, mx, centers, flat = scene_arrays(tris)
    bvh = build_binned(mn, mx, centers)
    tl = build_treelets(bvh, flat, permuted=False, max_nodes=128)

    rng = np.random.default_rng(1)
    org = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    rays = Ray.make(jnp.asarray(org), jnp.asarray(tgt - org))

    want = intersect_tris(bvh, flat, rays, any_hit=True, robust=True,
                          permuted=False)
    got = treelet_intersect_tris(
        tl, rays, prim_ids=np.asarray(bvh.prim_ids), any_hit=True,
        robust=True, block=256, top_block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))


def test_treelet_single_treelet_scene():
    """A scene small enough for one treelet goes through the degenerate
    top table."""
    import jax.numpy as jnp

    tris = _random_scene(40, seed=2)
    mn, mx, centers, flat = scene_arrays(tris)
    bvh = build_binned(mn, mx, centers)
    tl = build_treelets(bvh, flat, permuted=False, max_nodes=1024)
    assert tl.node_t.shape[0] == 1

    rng = np.random.default_rng(3)
    org = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    rays = Ray.make(jnp.asarray(org), jnp.asarray(tgt - org))
    want = intersect_tris(bvh, flat, rays, robust=True, permuted=False)
    got = treelet_intersect_tris(
        tl, rays, prim_ids=np.asarray(bvh.prim_ids), robust=True,
        block=128, top_block=128, interpret=True,
    )
    assert_hits_match(
        np.asarray(got.prim_id), np.asarray(got.t),
        np.asarray(want.prim_id), np.asarray(want.t), max_tie_frac=0.004,
    )
