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


# Real per-device tile-forest decomposition (shard_map + collectives),
# bit-identical to the single-device build.
from bvh_tpu.par.minitree_sharded import build_minitree_sharded  # noqa: E402,F401
