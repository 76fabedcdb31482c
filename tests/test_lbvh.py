"""LBVH (Karras) fast builder: structural invariants + closest-hit
parity against the exact binned builder over the same geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.lbvh import build_lbvh
from bvh_tpu.cli.camera import primary_rays
from bvh_tpu.traverse.wavefront import intersect_tris

from helpers import check_bvh_invariants, scene_arrays


def random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 1, 3)).astype(np.float32)
    edge = (rng.random((n, 2, 3)).astype(np.float32) - 0.5) * 0.1
    return np.concatenate([base, base + edge], axis=1)


@pytest.mark.parametrize("n", [2, 3, 7, 1000])
def test_lbvh_invariants(n):
    tris = random_tris(n)
    mn, mx, centers, _ = scene_arrays(tris)
    bvh = build_lbvh(mn, mx, centers)
    assert int(bvh.node_count) == 2 * n - 1
    check_bvh_invariants(bvh, n)


def test_lbvh_single_prim():
    mn = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    mx = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    bvh = build_lbvh(mn, mx, (mn + mx) / 2)
    check_bvh_invariants(bvh, 1)


def test_lbvh_duplicate_centers():
    """All-equal morton codes must still produce a valid tree (index
    tie-break, Karras sec. 4)."""
    n = 64
    tris = random_tris(n)
    tris[:] = tris[:1]  # identical geometry everywhere
    mn, mx, centers, _ = scene_arrays(tris)
    bvh = build_lbvh(mn, mx, centers)
    check_bvh_invariants(bvh, n)


def test_lbvh_closest_hit_parity():
    """Tracing the same rays through an LBVH tree and a binned-SAH tree
    must find identical closest-hit distances (same geometry; only the
    tree differs)."""
    rng = np.random.default_rng(3)
    base = rng.random((600, 1, 3)).astype(np.float32)
    edge = (rng.random((600, 2, 3)).astype(np.float32) - 0.5) * 0.6
    tris = np.concatenate([base, base + edge], axis=1)
    mn, mx, centers, flat = scene_arrays(tris)
    b1 = build_lbvh(mn, mx, centers)
    b2 = build_binned(mn, mx, centers)

    rays = primary_rays([0.5, 0.5, -1.5], [0, 0, 1], [0, 1, 0], 32, 32)
    h1 = intersect_tris(b1, flat, rays, permuted=False)
    h2 = intersect_tris(b2, flat, rays, permuted=False)
    t1 = np.asarray(h1.t)
    t2 = np.asarray(h2.t)
    assert np.asarray(h1.hit).sum() > 50  # scene actually hit
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    np.testing.assert_allclose(t1[np.asarray(h1.hit)], t2[np.asarray(h2.hit)],
                               rtol=1e-6)
