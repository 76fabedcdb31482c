"""Triangles and the Möller–Trumbore intersection, batched SoA.

TPU-native counterpart of `Tri` / `PrecomputedTri`
(reference: src/bvh/v2/tri.h). All arrays are [..., dim] and every op
is fully batched: one `Tri` value is a whole mesh; intersections are
(ray-batch x tri) elementwise after broadcasting.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.ray import Ray


def cross(a, b):
    """3D cross product over [..., 3] arrays (reference: vec.h:103-108)."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


class Tri(NamedTuple):
    """Plain triangle: three [..., dim] vertex arrays
    (reference: tri.h:14-26)."""

    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    def get_bbox(self):
        return bbox_ops.from_points(self.p0, self.p1, self.p2)  # reference: tri.h:24

    def get_center(self):
        # reference: tri.h:25 ((p0 + p1 + p2) * 1/3)
        third = jnp.asarray(1.0 / 3.0, self.p0.dtype)
        return (self.p0 + self.p1 + self.p2) * third


class PrecomputedTri(NamedTuple):
    """Edge + unnormalized-normal representation for fast intersection
    (reference: tri.h:29-45): p0, e1 = p0 - p1, e2 = p2 - p0,
    n = cross(e1, e2)."""

    p0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    n: jnp.ndarray

    @classmethod
    def from_tri(cls, tri: Tri) -> "PrecomputedTri":
        e1 = tri.p0 - tri.p1
        e2 = tri.p2 - tri.p0
        return cls(tri.p0, e1, e2, cross(e1, e2))

    def convert_to_tri(self) -> Tri:
        return Tri(self.p0, self.p0 - self.e1, self.e2 + self.p0)  # reference: tri.h:43

    def get_bbox(self):
        return self.convert_to_tri().get_bbox()

    def get_center(self):
        return self.convert_to_tri().get_center()

    def as_flat(self):
        """Pack into a [..., 12] array (p0|e1|e2|n) — the gather-friendly
        layout used by the traversal kernels."""
        return jnp.concatenate([self.p0, self.e1, self.e2, self.n], axis=-1)

    @classmethod
    def from_flat(cls, flat):
        return cls(flat[..., 0:3], flat[..., 3:6], flat[..., 6:9], flat[..., 9:12])

    def intersect(self, ray: Ray, tolerance=None):
        """Möller–Trumbore intersection (reference: tri.h:56-74).

        Returns `(t, u, v, hit)`; where `hit` is False the other values
        are meaningless. Comparisons are ordered so NaNs yield a miss,
        matching the reference's NaN-rejecting comparisons
        (reference: tri.h:65-67).
        """
        dtype = self.p0.dtype
        if tolerance is None:
            # reference: tri.h:52 (tolerance = -epsilon)
            tolerance = -jnp.finfo(dtype).eps
        tolerance = jnp.asarray(tolerance, dtype)

        c = self.p0 - ray.org
        r = cross(ray.dir, c)
        inv_det = jnp.asarray(1.0, dtype) / dot(self.n, ray.dir)

        u = dot(r, self.e2) * inv_det
        v = dot(r, self.e1) * inv_det
        w = jnp.asarray(1.0, dtype) - u - v

        barycentric_ok = (u >= tolerance) & (v >= tolerance) & (w >= tolerance)
        t = dot(self.n, c) * inv_det
        hit = barycentric_ok & (t >= ray.tmin) & (t <= ray.tmax)
        return t, u, v, hit
