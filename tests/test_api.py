"""Flat C-API-shaped surface + DefaultBuilder facade tests."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.api.flat import BVH_INVALID_PRIM_ID, BuildConfig, bvh3f
from bvh_tpu.build.default import DefaultConfig, Quality, build_default
from bvh_tpu.core.ray import Ray
from bvh_tpu.geom.tri import PrecomputedTri
from bvh_tpu.traverse.wavefront import make_tri_leaf_fn

from helpers import check_bvh_invariants, scene_arrays, tris_from_array


def test_flat_build_save_load_roundtrip(cornell_tris, tmp_path):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = bvh3f.build(mn, mx, centers, BuildConfig(quality=Quality.MEDIUM),
                      parallel=False)
    check_bvh_invariants(bvh, len(cornell_tris))
    path = str(tmp_path / "a.bvh")
    bvh3f.save(bvh, path)
    again = bvh3f.load(path)
    assert bvh3f.get_node_count(again) == bvh3f.get_node_count(bvh)
    buf = io.BytesIO()
    bvh3f.save(bvh, buf)
    buf.seek(0)
    third = bvh3f.load(buf)
    assert bvh3f.get_prim_count(third) == len(cornell_tris)


def test_flat_accessors(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = bvh3f.build(mn, mx, centers, BuildConfig(quality=Quality.LOW),
                      parallel=False)
    (bmn, bmx), first, count = bvh3f.get_node(bvh, 0)
    assert count == 0  # root of 36 prims is inner
    assert 0 < first < bvh3f.get_node_count(bvh)
    pid = bvh3f.get_prim_id(bvh, 0)
    assert 0 <= pid < len(cornell_tris)


def test_flat_node_surgery(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    bvh = bvh3f.build(mn, mx, centers, BuildConfig(quality=Quality.LOW),
                      parallel=False)
    nc = bvh3f.get_node_count(bvh)
    bvh2 = bvh3f.append_node(bvh, [0, 0, 0], [1, 1, 1], first_id=0, prim_count=1)
    assert bvh3f.get_node_count(bvh2) == nc + 1
    bvh3 = bvh3f.remove_last_node(bvh2)
    assert bvh3f.get_node_count(bvh3) == nc


def test_flat_intersect_variants(cornell_tris):
    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = bvh3f.build(mn, mx, centers, BuildConfig(quality=Quality.MEDIUM),
                      parallel=False)
    leaf_fn = make_tri_leaf_fn(bvh, flat, permuted=False)
    rays = Ray.make(
        jnp.asarray([[0.0, 1.0, 2.0]], jnp.float32),
        jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
    )
    for fn in (bvh3f.intersect_ray, bvh3f.intersect_ray_robust):
        hit = fn(bvh, rays, leaf_fn)
        assert bool(hit.hit[0])
        assert int(hit.prim_id[0]) != BVH_INVALID_PRIM_ID
    for fn in (bvh3f.intersect_ray_any, bvh3f.intersect_ray_any_robust):
        hit = fn(bvh, rays, leaf_fn)
        assert bool(hit.hit[0])


@pytest.mark.slow
def test_default_builder_qualities(cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    for q in (Quality.LOW, Quality.MEDIUM, Quality.HIGH):
        bvh = build_default(mn, mx, centers, DefaultConfig(quality=q),
                            parallel=False)
        check_bvh_invariants(bvh, len(cornell_tris))


@pytest.mark.slow
def test_default_builder_parallel_path():
    """Above parallel_threshold the mini-tree pipeline is selected."""
    rng = np.random.default_rng(5)
    n = 1500
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.005, 0.05, (n, 3)).astype(np.float32)
    bvh = build_default(
        jnp.asarray(pts - ext), jnp.asarray(pts + ext), jnp.asarray(pts),
        DefaultConfig(quality=Quality.MEDIUM, parallel_threshold=1024),
    )
    check_bvh_invariants(bvh, n)


def test_simple_example_end_to_end():
    """The reference's simple_example contract
    (test/simple_example.cpp:94-104): ray (0,0,0)->(0,0,1), tmax 100
    against the two unit triangles must hit at t=1."""
    tris = np.asarray(
        [
            [[1, -1, 1], [1, 1, 1], [-1, 1, 1]],
            [[1, -1, 1], [-1, -1, 1], [-1, 1, 1]],
        ],
        np.float32,
    )
    mn, mx, centers, flat = scene_arrays(tris)
    bvh = bvh3f.build(mn, mx, centers, BuildConfig(quality=Quality.HIGH))
    tri = tris_from_array(tris)
    perm = np.asarray(bvh.prim_ids).astype(np.int64)
    flat_perm = PrecomputedTri.from_tri(tri).as_flat()[jnp.asarray(perm)]
    leaf_fn = make_tri_leaf_fn(bvh, flat_perm, permuted=True)
    rays = Ray.make(
        jnp.zeros((1, 3), jnp.float32),
        jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        tmin=0.0, tmax=100.0,
    )
    hit = bvh3f.intersect_ray_robust(bvh, rays, leaf_fn)
    assert bool(hit.hit[0]), "simple_example exit-code contract: must hit"
    np.testing.assert_allclose(float(hit.t[0]), 1.0, rtol=1e-6)
    u, v = float(hit.u[0]), float(hit.v[0])
    assert 0.0 <= u <= 1.0 and 0.0 <= v <= 1.0
