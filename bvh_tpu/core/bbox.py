"""Axis-aligned bounding boxes as (min, max) array pairs.

TPU-native counterpart of `BBox<T, N>` (reference: src/bvh/v2/bbox.h).
A "bbox array" is any pair of arrays of shape [..., dim]; all ops are
batched elementwise, the SoA analogue of the reference's methods.
"""

from __future__ import annotations

import jax.numpy as jnp

from bvh_tpu.core.utils import robust_max, robust_min


def make_empty(dim: int, dtype=jnp.float32, batch_shape=()):
    """Empty bbox: min=+max_float, max=-max_float
    (reference: bbox.h:40-44)."""
    big = jnp.finfo(dtype).max
    mn = jnp.full((*batch_shape, dim), +big, dtype)
    mx = jnp.full((*batch_shape, dim), -big, dtype)
    return mn, mx


def from_points(*points):
    """Bbox of one or more [..., dim] point arrays (elementwise batch)."""
    mn = points[0]
    mx = points[0]
    for p in points[1:]:
        mn = robust_min(mn, p)
        mx = robust_max(mx, p)
    return mn, mx


def extend(a_min, a_max, b_min, b_max):
    """Union of two bboxes with NaN-swallowing min/max
    (reference: bbox.h:23-27)."""
    return robust_min(a_min, b_min), robust_max(a_max, b_max)


def extend_point(a_min, a_max, p):
    return robust_min(a_min, p), robust_max(a_max, p)


def get_diagonal(mn, mx):
    return mx - mn  # reference: bbox.h:29


def get_center(mn, mx):
    return (mx + mn) * jnp.asarray(0.5, mn.dtype)  # reference: bbox.h:30


def get_half_area(mn, mx):
    """SAH surface-area metric (reference: bbox.h:32-38).

    dim==3: (dx + dy) * dz + dx * dy; dim==2: dx + dy. Higher dims use
    the full sum of pairwise extent products (the natural extension of
    half the surface area of a box); dim==1 degenerates to dx.
    """
    d = get_diagonal(mn, mx)
    dim = d.shape[-1]
    if dim == 3:
        return (d[..., 0] + d[..., 1]) * d[..., 2] + d[..., 0] * d[..., 1]
    if dim == 2:
        return d[..., 0] + d[..., 1]
    if dim == 1:
        return d[..., 0]
    # General N: sum over i<j of d_i * d_j.
    total = jnp.zeros(d.shape[:-1], d.dtype)
    for i in range(dim):
        for j in range(i + 1, dim):
            total = total + d[..., i] * d[..., j]
    return total


def reduce_union(mn, mx, axis=0, where=None):
    """Union-reduce a batch of bboxes along `axis`.

    With `where`, masked-out entries contribute the empty box. Uses
    plain min/max (not NaN-swallowing): reductions over finite inputs
    are equivalent and map to fast tree reductions on the VPU.
    """
    if where is not None:
        big = jnp.asarray(jnp.finfo(mn.dtype).max, mn.dtype)
        mn = jnp.where(where[..., None], mn, big)
        mx = jnp.where(where[..., None], mx, -big)
    return jnp.min(mn, axis=axis), jnp.max(mx, axis=axis)
