"""Dimension (2D/3D/4D) and dtype (float32/float64) coverage.

The reference is dimension- and scalar-parametric via templates
(reference: node.h:18-22, README.md:41-42); here the same code paths
are shape/dtype polymorphic.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import index_dtype_for
from bvh_tpu.io.serialize import deserialize_from_bytes, serialize_to_bytes
from bvh_tpu.traverse.wavefront import make_sphere_leaf_fn, traverse

pytestmark = pytest.mark.slow  # compile-heavy (builder while_loops)


def random_boxes(n, dim, dtype, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, dim)).astype(dtype)
    ext = rng.uniform(0.01, 0.1, (n, dim)).astype(dtype)
    return jnp.asarray(pts - ext), jnp.asarray(pts + ext), jnp.asarray(pts)


def leaf_sizes_ok(bvh, n):
    nc = int(bvh.node_count)
    idx = np.asarray(bvh.index[:nc]).astype(np.uint64)
    first = idx >> 4
    count = idx & 15
    covered = np.zeros(n, np.int32)
    for i in range(nc):
        if count[i]:
            covered[int(first[i]): int(first[i] + count[i])] += 1
    assert np.all(covered == 1)


@pytest.mark.parametrize("dim", [2, 3, 4])
@pytest.mark.parametrize("builder", [build_binned, build_sweep])
def test_build_dims(dim, builder):
    mn, mx, c = random_boxes(60, dim, np.float32, seed=dim)
    bvh = builder(mn, mx, c)
    leaf_sizes_ok(bvh, 60)
    assert bvh.dim == dim


@pytest.mark.parametrize("builder", [build_binned, build_sweep])
def test_build_float64(builder):
    mn, mx, c = random_boxes(50, 3, np.float64, seed=9)
    bvh = builder(mn, mx, c)
    assert bvh.index.dtype == jnp.uint64  # node.h:21 (IndexBits = 64)
    leaf_sizes_ok(bvh, 50)
    # double serialization round-trip (uint64 index words)
    again = deserialize_from_bytes(
        serialize_to_bytes(bvh), dim=3, scalar_dtype=np.float64
    )
    assert int(again.node_count) == int(bvh.node_count)
    np.testing.assert_array_equal(
        np.asarray(again.index), np.asarray(bvh.index[: int(bvh.node_count)])
    )


def test_sphere_traversal():
    """Build over spheres and trace (reference: sphere.h + the leaf
    callback mechanism)."""
    rng = np.random.default_rng(3)
    m = 64
    centers = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    radii = rng.uniform(0.05, 0.15, m).astype(np.float32)
    centers = jnp.asarray(centers)
    radii = jnp.asarray(radii)
    mn = centers - radii[:, None]
    mx = centers + radii[:, None]
    bvh = build_binned(mn, mx, centers)
    leaf_fn = make_sphere_leaf_fn(bvh, centers, radii)

    # rays from far -z towards each sphere center: all must hit,
    # and the closest hit must match the brute-force minimum.
    org = jnp.asarray(np.stack([centers[:, 0], centers[:, 1],
                                np.full(m, -10.0, np.float32)], axis=1))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (m, 1))
    rays = Ray.make(org, dirs)
    hit = traverse(bvh, rays, leaf_fn, robust=True)
    assert bool(np.asarray(hit.hit).all())

    # brute force oracle
    oc = np.asarray(org)[:, None, :] - np.asarray(centers)[None, :, :]
    d = np.asarray(dirs)[:, None, :]
    a = np.sum(d * d, -1)
    b = 2 * np.sum(d * oc, -1)
    c4 = np.sum(oc * oc, -1) - np.asarray(radii)[None, :] ** 2
    delta = b * b - 4 * a * c4
    t0 = np.where(delta >= 0, (b + np.sqrt(np.maximum(delta, 0))) * (-0.5 / a), np.inf)
    t0 = np.where(t0 >= 0, t0, np.inf)
    want = t0.min(axis=1)
    np.testing.assert_allclose(np.asarray(hit.t), want, rtol=1e-4)


def random_spheres(m, dim, seed):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (m, dim)).astype(np.float32)
    radii = rng.uniform(0.02, 0.12, m).astype(np.float32)
    return jnp.asarray(centers), jnp.asarray(radii)


@pytest.mark.parametrize("dim", [2, 3, 4])
@pytest.mark.parametrize("any_hit", [False, True])
def test_pallas_sphere_kernel_matches_wavefront(dim, any_hit):
    """The dim-generic mega-kernel (traverse/pallas_sphere.py) is the
    fast path for 2D/4D configurations (reference: node.h:18-22 is
    dimension-parametric; sphere.h is the dimension-generic
    primitive). Hit-for-hit parity with the XLA wavefront."""
    from bvh_tpu.traverse.pallas_sphere import (
        pallas_fits_spheres, pallas_intersect_spheres)

    m = 96
    centers, radii = random_spheres(m, dim, seed=10 + dim)
    mn = centers - radii[:, None]
    mx = centers + radii[:, None]
    bvh = build_binned(mn, mx, centers)
    assert pallas_fits_spheres(bvh, centers)

    rng = np.random.default_rng(1)
    R = 256
    org = rng.uniform(-3, 3, (R, dim)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (R, dim)).astype(np.float32)
    rays = Ray.make(jnp.asarray(org), jnp.asarray(tgt - org))

    leaf_fn = make_sphere_leaf_fn(bvh, centers, radii)
    want = traverse(bvh, rays, leaf_fn, any_hit=any_hit)
    got = pallas_intersect_spheres(
        bvh, centers, radii, rays, any_hit=any_hit,
        block=256, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    if any_hit:
        return  # any-hit may stop at a different (valid) first prim
    np.testing.assert_array_equal(np.asarray(got.prim_id),
                                  np.asarray(want.prim_id))
    # t: the two programs may contract b*b - 4ac differently (FMA), and
    # the cancellation amplifies that to ~1e-5 relative — same class of
    # difference as the documented minitree_fast Mosaic caveat. The
    # discrete oracle (which prim) is exact above.
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got.v)[h], np.asarray(want.v)[h],
                               rtol=2e-5)


def test_pallas_sphere_kernel_robust_variant():
    from bvh_tpu.traverse.pallas_sphere import pallas_intersect_spheres

    centers, radii = random_spheres(80, 3, seed=21)
    mn = centers - radii[:, None]
    mx = centers + radii[:, None]
    bvh = build_binned(mn, mx, centers)
    rng = np.random.default_rng(2)
    org = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    rays = Ray.make(jnp.asarray(org), jnp.asarray(tgt - org))
    leaf_fn = make_sphere_leaf_fn(bvh, centers, radii)
    want = traverse(bvh, rays, leaf_fn, robust=True)
    got = pallas_intersect_spheres(bvh, centers, radii, rays, robust=True,
                                   block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.prim_id),
                                  np.asarray(want.prim_id))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=2e-5)


def test_2d_traversal():
    """2D BVH with point-prim leaves: slab tests work in 2D."""
    rng = np.random.default_rng(4)
    n = 40
    mn, mx, c = random_boxes(n, 2, np.float32, seed=4)
    bvh = build_sweep(mn, mx, c)

    mn_np, mx_np = np.asarray(mn), np.asarray(mx)

    def leaf_fn(prim_pos, rays_now):
        pos = jnp.clip(prim_pos, 0, n - 1)
        idx = jnp.clip(bvh.prim_ids[pos].astype(jnp.int32), 0, n - 1)
        bmn = jnp.asarray(mn_np)[idx]
        bmx = jnp.asarray(mx_np)[idx]
        # "hit" = ray origin inside the prim box (degenerate test prims)
        inside = jnp.all((rays_now.org >= bmn) & (rays_now.org <= bmx), axis=-1)
        t = jnp.zeros_like(rays_now.tmin)
        return inside, t, t, t

    centers = np.asarray(c)
    rays = Ray.make(jnp.asarray(centers), jnp.ones((n, 2), jnp.float32))
    hit = traverse(bvh, rays, leaf_fn, any_hit=True, robust=True)
    # every query point lies inside its own box
    assert bool(np.asarray(hit.hit).all())
