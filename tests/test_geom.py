"""Geometry tests: Möller–Trumbore and sphere intersection."""

import jax.numpy as jnp
import numpy as np

from bvh_tpu.core.ray import Ray
from bvh_tpu.geom.sphere import Sphere
from bvh_tpu.geom.tri import PrecomputedTri, Tri


def _simple_example_tris():
    # The two triangles of test/simple_example.cpp:26-35.
    p0 = jnp.asarray([[1.0, -1.0, 1.0], [1.0, -1.0, 1.0]], jnp.float32)
    p1 = jnp.asarray([[1.0, 1.0, 1.0], [-1.0, -1.0, 1.0]], jnp.float32)
    p2 = jnp.asarray([[-1.0, 1.0, 1.0], [-1.0, 1.0, 1.0]], jnp.float32)
    return Tri(p0, p1, p2)


def test_tri_bbox_center():
    tri = _simple_example_tris()
    mn, mx = tri.get_bbox()
    np.testing.assert_allclose(np.asarray(mn[0]), [-1, -1, 1])
    np.testing.assert_allclose(np.asarray(mx[0]), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(tri.get_center()[0]),
                               np.asarray([1 / 3, 1 / 3, 1.0]), rtol=1e-6)


def test_moller_trumbore_hit():
    tri = _simple_example_tris()
    ptri = PrecomputedTri.from_tri(tri)
    # The simple_example ray: org (0,0,0), dir (0,0,1), tmin 0, tmax 100.
    ray = Ray.make(
        jnp.zeros((2, 3), jnp.float32),
        jnp.asarray([[0.0, 0.0, 1.0]] * 2, jnp.float32),
        tmin=0.0,
        tmax=100.0,
    )
    t, u, v, hit = ptri.intersect(ray)
    assert bool(hit[0]) and bool(hit[1])
    np.testing.assert_allclose(np.asarray(t), [1.0, 1.0], rtol=1e-6)


def test_moller_trumbore_miss_parallel():
    tri = _simple_example_tris()
    ptri = PrecomputedTri.from_tri(tri)
    ray = Ray.make(
        jnp.zeros((2, 3), jnp.float32),
        jnp.asarray([[1.0, 0.0, 0.0]] * 2, jnp.float32),  # parallel to plane
    )
    _, _, _, hit = ptri.intersect(ray)
    assert not bool(hit[0]) and not bool(hit[1])


def test_precomputed_roundtrip():
    tri = _simple_example_tris()
    ptri = PrecomputedTri.from_tri(tri)
    back = ptri.convert_to_tri()
    np.testing.assert_allclose(np.asarray(back.p0), np.asarray(tri.p0))
    np.testing.assert_allclose(np.asarray(back.p1), np.asarray(tri.p1))
    np.testing.assert_allclose(np.asarray(back.p2), np.asarray(tri.p2))


def test_precomputed_flat_roundtrip():
    tri = _simple_example_tris()
    ptri = PrecomputedTri.from_tri(tri)
    again = PrecomputedTri.from_flat(ptri.as_flat())
    np.testing.assert_array_equal(np.asarray(again.n), np.asarray(ptri.n))


def test_sphere_intersect():
    sph = Sphere(jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32),
                 jnp.asarray([1.0], jnp.float32))
    ray = Ray.make(jnp.zeros((1, 3), jnp.float32),
                   jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32))
    t0, t1, hit = sph.intersect(ray)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t0[0]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(float(t1[0]), 6.0, rtol=1e-6)

    miss = Ray.make(jnp.zeros((1, 3), jnp.float32),
                    jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32))
    _, _, hit2 = sph.intersect(miss)
    assert not bool(hit2[0])


def test_sphere_bbox():
    sph = Sphere(jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32),
                 jnp.asarray([0.5], jnp.float32))
    mn, mx = sph.get_bbox()
    np.testing.assert_allclose(np.asarray(mn[0]), [0.5, 1.5, 2.5])
    np.testing.assert_allclose(np.asarray(mx[0]), [1.5, 2.5, 3.5])
