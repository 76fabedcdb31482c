"""Pinhole camera ray generation matching the reference benchmark
(reference: test/benchmark.cpp:343-359): dir is normalized, right =
normalize(cross(dir, up)), up' = cross(right, dir); the ray through
pixel (x, y) is `dir + u*right + v*up'` (unnormalized) with
u = 2x/W - 1, v = 2y/H - 1 and rays emitted row-major in y, x order."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bvh_tpu.core.ray import Ray


def camera_basis(dir, up):
    d = np.asarray(dir, np.float64)
    d = d / np.linalg.norm(d)
    r = np.cross(d, np.asarray(up, np.float64))
    r = r / np.linalg.norm(r)
    u = np.cross(r, d)
    return d, r, u


def primary_rays(eye, dir, up, width: int, height: int, dtype=jnp.float32) -> Ray:
    d, r, u = camera_basis(dir, up)
    x = np.arange(width, dtype=np.float64)
    y = np.arange(height, dtype=np.float64)
    uu = 2.0 * x / width - 1.0
    vv = 2.0 * y / height - 1.0
    gu, gv = np.meshgrid(uu, vv, indexing="xy")
    dirs = (
        d[None, :]
        + gu.reshape(-1, 1) * r[None, :]
        + gv.reshape(-1, 1) * u[None, :]
    )
    org = np.broadcast_to(np.asarray(eye, np.float64), dirs.shape)
    return Ray.make(jnp.asarray(org, dtype), jnp.asarray(dirs, dtype))
