"""Multi-chip scaling via jax.sharding meshes.

The reference's entire parallel runtime is an in-process thread pool
with fork-join executors (reference: src/bvh/v2/thread_pool.h,
executor.h) — shared memory, mutex/condvar. The TPU-native equivalent
(SURVEY.md section 5.8) is a device mesh:

- traversal scales data-parallel: rays are independent, so the ray
  batch shards over the mesh while the BVH + primitive arrays
  replicate (each chip traces its rays against its local copy);
- mini-tree builds scale spatially: each device builds the mini-tree
  forest for its shard of primitives; root bboxes all-gather over ICI
  for the replicated top tree. (Round 1 ships the ray-parallel path
  and a replicated build; the tile-sharded build lands next.)

The `SequentialExecutor` analogue (determinism/reference path) is
simply running the same jitted functions on one device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bvh_tpu.core.ray import Ray
from bvh_tpu.traverse.wavefront import intersect_tris


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over the first `n_devices` devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh: need {n_devices} devices, only {len(devs)} "
                f"available ({devs[0].platform}); force a virtual CPU mesh "
                f"with XLA_FLAGS=--xla_force_host_platform_device_count"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_rays(rays: Ray, mesh: Mesh, axis: str = "rays") -> Ray:
    """Pad the ray batch to a multiple of the mesh size and shard it
    along the batch dimension."""
    n_dev = mesh.devices.size
    r = rays.tmin.shape[0]
    pad = (-r) % n_dev
    if pad:
        def pad0(x, fill=0.0):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        # Padded rays: degenerate (dir=0 -> slab tests miss everything
        # under safe_inverse + empty interval via tmax < tmin).
        rays = Ray(
            pad0(rays.org),
            pad0(rays.dir),
            pad0(rays.tmin, 1.0),
            pad0(rays.tmax, 0.0),
        )
    sh = NamedSharding(mesh, P(axis))
    return Ray(*(jax.device_put(x, sh) for x in rays))


def intersect_tris_sharded(
    bvh, tri_flat, rays: Ray, mesh: Mesh, axis: str = "rays", **kw
):
    """Data-parallel traversal: rays shard over the mesh, the BVH and
    triangle arrays replicate. XLA inserts no collectives on the hot
    path — rays never talk to each other; results come back sharded."""
    n_rays = rays.tmin.shape[0]
    rays = shard_rays(rays, mesh, axis)
    replicated = NamedSharding(mesh, P())
    bvh = jax.tree.map(lambda x: jax.device_put(x, replicated), bvh)
    tri_flat = jax.device_put(tri_flat, replicated)
    hit = intersect_tris(bvh, tri_flat, rays, **kw)
    return jax.tree.map(lambda x: x[:n_rays], hit)


def build_minitree_sharded(bb_min, bb_max, centers, mesh: Mesh, config=None):
    """Mini-tree build over a mesh.

    Round-1 implementation: the level-synchronous forest build is one
    XLA program; sharding the primitive arrays over the mesh lets XLA
    partition the per-level scatters/scans (GSPMD) with all-reduces for
    the segment reductions over ICI. The inputs shard by primitive; the
    output BVH is replicated.
    """
    from bvh_tpu.build.minitree import build_minitree

    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    replicated = NamedSharding(mesh, P())
    n = centers.shape[0]
    pad = (-n) % mesh.devices.size
    if pad:
        # Padding prims would change the build; require divisibility for
        # the sharded path and fall back to replicated inputs otherwise.
        bb_min = jax.device_put(bb_min, replicated)
        bb_max = jax.device_put(bb_max, replicated)
        centers = jax.device_put(centers, replicated)
    else:
        bb_min = jax.device_put(bb_min, sh)
        bb_max = jax.device_put(bb_max, sh)
        centers = jax.device_put(centers, sh)
    out_shardings = jax.tree.map(lambda _: replicated, jax.eval_shape(
        partial(build_minitree, config=config), bb_min, bb_max, centers
    ))
    built = jax.jit(
        partial(build_minitree, config=config), out_shardings=out_shardings
    )(bb_min, bb_max, centers)
    return built
