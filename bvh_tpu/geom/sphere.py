"""Sphere primitive with quadratic ray intersection, batched SoA.

TPU-native counterpart of `Sphere<T, N>`
(reference: src/bvh/v2/sphere.h).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bvh_tpu.core.ray import Ray
from bvh_tpu.core.utils import robust_max, robust_min


class Sphere(NamedTuple):
    """center: [..., dim]; radius: [...] (reference: sphere.h:14-27)."""

    center: jnp.ndarray
    radius: jnp.ndarray

    def get_center(self):
        return self.center

    def get_bbox(self):
        r = self.radius[..., None]
        return self.center - r, self.center + r  # reference: sphere.h:25-27

    def intersect(self, ray: Ray, assume_normalized: bool = False):
        """Quadratic intersection clamped to the ray interval
        (reference: sphere.h:31-49).

        Returns `(t0, t1, hit)` with t0 <= t1 when `hit`; the entry
        distance t0 is clamped up to tmin and t1 down to tmax with
        NaN-swallowing min/max like the reference.
        """
        dtype = self.center.dtype
        oc = ray.org - self.center
        a = (
            jnp.asarray(1.0, dtype)
            if assume_normalized
            else jnp.sum(ray.dir * ray.dir, axis=-1)
        )
        b = jnp.asarray(2.0, dtype) * jnp.sum(ray.dir * oc, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - self.radius * self.radius

        delta = b * b - jnp.asarray(4.0, dtype) * a * c
        inv = jnp.asarray(-0.5, dtype) / a
        # Guard the sqrt so misses produce no NaN-propagation surprises.
        sqrt_delta = jnp.sqrt(jnp.maximum(delta, jnp.asarray(0.0, dtype)))
        t0 = robust_max((b + sqrt_delta) * inv, ray.tmin)
        t1 = robust_min((b - sqrt_delta) * inv, ray.tmax)
        hit = (delta >= 0) & (t0 <= t1)
        return t0, t1, hit
