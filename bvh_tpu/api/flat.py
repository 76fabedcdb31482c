"""Flat, C-API-shaped functional surface.

TPU-native counterpart of the reference's C API
(reference: src/bvh/v2/c_api/bvh.h): one monomorphized namespace per
(scalar, dimension) pair — `bvh2f`, `bvh3f`, `bvh2d`, `bvh3d` — each
exposing build / save / load / accessors / append & remove node /
refit / optimize and the four intersect variants
(closest/any x fast/robust; reference: c_api/bvh.h:277-295).

Deviations forced by the execution model, documented here once:
- No thread-pool handles: parallelism is the TPU itself. `build`'s
  `parallel` flag selects the mini-tree path like passing a non-NULL
  pool does in C (reference: c_api/bvh.h:95-99).
- Intersections are batched: instead of a per-leaf C callback
  (reference: c_api/bvh.h:233-274), `intersect_ray*` takes arrays of
  rays plus a vectorized leaf intersector (defaulting to precomputed
  triangles). Single rays are batches of one.
- Structures are immutable pytrees: mutators (`append_node`,
  `remove_last_node`, `refit`, `optimize`) return the new BVH.

A byte-compatible native `libbvh_c` shared library with the exact C
symbol surface lives in `native/` for pure-C consumers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from bvh_tpu.build.default import DefaultConfig, Quality, build_default
from bvh_tpu.build.reinsertion import ReinsertionConfig, optimize_reinsertion
from bvh_tpu.build.sah import SplitHeuristic
from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import Bvh, Index, make_node_bounds_row
# NB: bvh_tpu.io re-exports the `serialize` *function*, shadowing the
# module attribute; import the functions directly.
from bvh_tpu.io.serialize import (
    deserialize as _deserialize,
    load_bvh as _load_bvh,
    save_bvh as _save_bvh,
    serialize as _serialize,
)
from bvh_tpu.traverse.refit import refit as _refit
from bvh_tpu.traverse.wavefront import traverse

# reference: c_api/bvh.h:32-33.
BVH_ROOT_INDEX = 0
BVH_INVALID_PRIM_ID = 0xFFFFFFFF


@dataclasses.dataclass(frozen=True)
class BuildConfig:
    """reference: c_api/bvh.h:47-58 (bvh_build_config)."""

    quality: Quality = Quality.HIGH
    min_leaf_size: int = 1
    max_leaf_size: int = 8
    parallel_threshold: int = 1024


class FlatApi:
    """Monomorphized functional surface for one (scalar, dim) pair."""

    def __init__(self, scalar_dtype, dim: int):
        self.scalar_dtype = jnp.dtype(scalar_dtype)
        self.dim = dim

    # --- construction (reference: c_api/bvh.h:99-125) ----------------
    def build(self, bboxes_min, bboxes_max, centers, config: BuildConfig | None = None,
              parallel: bool = True) -> Bvh:
        config = config or BuildConfig()
        dc = DefaultConfig(
            sah=SplitHeuristic(),
            min_leaf_size=config.min_leaf_size,
            max_leaf_size=config.max_leaf_size,
            quality=config.quality,
            parallel_threshold=config.parallel_threshold,
        )
        return build_default(
            jnp.asarray(bboxes_min, self.scalar_dtype),
            jnp.asarray(bboxes_max, self.scalar_dtype),
            jnp.asarray(centers, self.scalar_dtype),
            dc,
            parallel=parallel,
        )

    # --- persistence (reference: c_api/bvh.h:136-144) ----------------
    def save(self, bvh: Bvh, path_or_stream) -> None:
        if hasattr(path_or_stream, "write"):
            _serialize(bvh, path_or_stream)
        else:
            _save_bvh(bvh, path_or_stream)

    def load(self, path_or_stream) -> Bvh:
        if hasattr(path_or_stream, "read"):
            return _deserialize(
                path_or_stream, dim=self.dim, scalar_dtype=self.scalar_dtype
            )
        return _load_bvh(path_or_stream, dim=self.dim, scalar_dtype=self.scalar_dtype)

    # --- accessors (reference: c_api/bvh.h:148-203) ------------------
    def get_node_count(self, bvh: Bvh) -> int:
        return int(bvh.node_count)

    def get_prim_count(self, bvh: Bvh) -> int:
        return int(bvh.prim_count)

    def get_prim_id(self, bvh: Bvh, i) -> int:
        return int(bvh.prim_ids[i])

    def get_node(self, bvh: Bvh, i):
        """Returns ((min, max), first_id, prim_count) for node i."""
        mn, mx = bvh.get_node_bbox(jnp.asarray(i))
        word = bvh.index[i]
        return (np.asarray(mn), np.asarray(mx)), int(Index.first_id(word)), int(
            Index.prim_count(word)
        )

    def set_node_bbox(self, bvh: Bvh, i, mn, mx) -> Bvh:
        row = make_node_bounds_row(
            jnp.asarray(mn, self.scalar_dtype), jnp.asarray(mx, self.scalar_dtype)
        )
        return bvh._replace(bounds=bvh.bounds.at[i].set(row))

    # --- node surgery (reference: c_api/bvh.h:211-219) ---------------
    def append_node(self, bvh: Bvh, mn, mx, first_id: int, prim_count: int) -> Bvh:
        """Appends a node (grows capacity by one; host-side op)."""
        row = np.asarray(
            make_node_bounds_row(
                jnp.asarray(mn, self.scalar_dtype), jnp.asarray(mx, self.scalar_dtype)
            )
        )
        nc = int(bvh.node_count)
        bounds = np.array(bvh.bounds)  # writable copies
        index = np.array(bvh.index)
        if nc >= bounds.shape[0]:
            bounds = np.concatenate([bounds, np.zeros_like(bounds[:1])])
            index = np.concatenate([index, np.zeros_like(index[:1])])
        bounds[nc] = row
        word = (
            Index.make_leaf(first_id, prim_count, bvh.index.dtype)
            if prim_count
            else Index.make_inner(first_id, bvh.index.dtype)
        )
        index[nc] = int(word)
        return Bvh(
            bounds=jnp.asarray(bounds),
            index=jnp.asarray(index),
            prim_ids=bvh.prim_ids,
            node_count=jnp.asarray(nc + 1, jnp.int32),
            prim_count=bvh.prim_count,
        )

    def remove_last_node(self, bvh: Bvh) -> Bvh:
        return bvh._replace(
            node_count=jnp.maximum(bvh.node_count - 1, jnp.asarray(1, jnp.int32))
        )

    # --- refit / optimize (reference: c_api/bvh.h:221-229) -----------
    def refit(self, bvh: Bvh, prim_bb_min=None, prim_bb_max=None) -> Bvh:
        return _refit(bvh, prim_bb_min, prim_bb_max)

    def optimize(self, bvh: Bvh, config: ReinsertionConfig | None = None) -> Bvh:
        return optimize_reinsertion(bvh, config)

    # --- intersections (reference: c_api/bvh.h:277-295) --------------
    def intersect_ray(self, bvh: Bvh, rays: Ray, leaf_fn: Callable, **kw):
        return traverse(bvh, rays, leaf_fn, any_hit=False, robust=False, **kw)

    def intersect_ray_robust(self, bvh: Bvh, rays: Ray, leaf_fn: Callable, **kw):
        return traverse(bvh, rays, leaf_fn, any_hit=False, robust=True, **kw)

    def intersect_ray_any(self, bvh: Bvh, rays: Ray, leaf_fn: Callable, **kw):
        return traverse(bvh, rays, leaf_fn, any_hit=True, robust=False, **kw)

    def intersect_ray_any_robust(self, bvh: Bvh, rays: Ray, leaf_fn: Callable, **kw):
        return traverse(bvh, rays, leaf_fn, any_hit=True, robust=True, **kw)


# Monomorphized namespaces, as the C API's name mangling does
# (reference: c_api/bvh_impl.h:252-353 BVH_IMPL over (float,double)x(2,3)).
bvh2f = FlatApi(jnp.float32, 2)
bvh3f = FlatApi(jnp.float32, 3)
bvh2d = FlatApi(jnp.float64, 2)
bvh3d = FlatApi(jnp.float64, 3)
