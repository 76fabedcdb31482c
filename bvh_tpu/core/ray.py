"""Rays as SoA pytrees, with octant and robust inverse-direction helpers.

TPU-native counterpart of `Ray<T, N>` and `Octant`
(reference: src/bvh/v2/ray.h). A `Ray` holds arbitrarily-batched
[..., dim] origin/direction arrays and [...] tmin/tmax, so one `Ray`
value is an entire wavefront.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bvh_tpu.core.utils import add_ulp_magnitude, safe_inverse


class Ray(NamedTuple):
    """org/dir: [..., dim]; tmin/tmax: [...] (reference: ray.h:15-27)."""

    org: jnp.ndarray
    dir: jnp.ndarray
    tmin: jnp.ndarray
    tmax: jnp.ndarray

    @classmethod
    def make(cls, org, dir, tmin=None, tmax=None):  # noqa: A002 - matches reference
        org = jnp.asarray(org)
        dir = jnp.asarray(dir)
        batch = org.shape[:-1]
        dtype = org.dtype
        if tmin is None:
            tmin = jnp.zeros(batch, dtype)  # reference: ray.h:24 (tmin = 0)
        if tmax is None:
            # reference: ray.h:25 (tmax = numeric_limits<T>::max())
            tmax = jnp.full(batch, jnp.finfo(dtype).max, dtype)
        return cls(org, dir, jnp.broadcast_to(jnp.asarray(tmin, dtype), batch),
                   jnp.broadcast_to(jnp.asarray(tmax, dtype), batch))

    @property
    def dim(self) -> int:
        return self.org.shape[-1]

    def get_inv_dir(self, safe: bool = False):
        """1 / dir, or the finite `safe_inverse` for the robust path
        (reference: ray.h:29-34)."""
        if safe:
            return safe_inverse(self.dir)
        return jnp.asarray(1.0, self.dir.dtype) / self.dir

    def get_octant(self):
        """Per-axis direction sign bits as a [..., dim] int32 0/1 array
        (reference: ray.h:36-43 packs these into a bitset; an unpacked
        array vectorizes better on the VPU). Uses the bitcast-free
        signbit so f64 rays compile on XLA:TPU (utils.signbit)."""
        from bvh_tpu.core.utils import signbit

        return signbit(self.dir).astype(jnp.int32)

    @staticmethod
    def pad_inv_dir(inv_dir):
        """Pad the inverse direction by 2 ULPs, per T. Ize's
        "Robust BVH Ray Traversal" (reference: ray.h:45-48)."""
        return add_ulp_magnitude(inv_dir, 2)
