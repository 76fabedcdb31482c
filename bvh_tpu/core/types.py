"""Core BVH data structures as flat device arrays.

TPU-native counterpart of the reference's `Index`, `Node` and `Bvh`
types (reference: src/bvh/v2/index.h, node.h:18-57, bvh.h:16-31).

Layout contracts kept from the reference so that serialization is
bit-for-bit interoperable (reference: node.h:90-102, bvh.h:220-242):

- A node's bounds are `2 * dim` scalars, interleaved
  `[min_x, max_x, min_y, max_y, ...]` (reference: node.h:31-34).
- A node's index word packs `(first_id << prim_count_bits) | prim_count`
  (reference: index.h:74-78). `prim_count == 0` means inner node; the
  children of an inner node are the contiguous pair
  `first_id, first_id + 1` (reference: index.h:27-30), and a leaf's
  primitives are `prim_ids[first_id : first_id + prim_count]`
  (reference: index.h:15-22).
- The index word has the same bit width as the scalar type: uint32 for
  float32 BVHs, uint64 for float64 (reference: node.h:18-22).

Instead of an array-of-structs `std::vector<Node>`, the BVH is a pytree
of flat arrays with a static capacity and dynamic counts, the idiomatic
shape for XLA's static-shape compilation model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PRIM_COUNT_BITS = 4  # reference: node.h:22 (PrimCountBits = 4)
MAX_PRIM_COUNT = (1 << PRIM_COUNT_BITS) - 1  # 15 prims per leaf max

# Sentinel matching the C API's BVH_INVALID_PRIM_ID (c_api/bvh.h:33).
INVALID_PRIM_ID = np.uint32(0xFFFFFFFF)

_INDEX_DTYPE_FOR_SCALAR = {
    jnp.dtype(jnp.float32): jnp.uint32,
    jnp.dtype(jnp.float64): jnp.uint64,
}


def index_dtype_for(scalar_dtype) -> jnp.dtype:
    """Index word dtype for a scalar dtype (reference: node.h:21
    `IndexBits = sizeof(T) * CHAR_BIT`)."""
    return jnp.dtype(_INDEX_DTYPE_FOR_SCALAR[jnp.dtype(scalar_dtype)])


class Index:
    """Packed-index codec (reference: index.h:32-82).

    These are free functions over integer arrays rather than a wrapper
    type: the packed word itself is the runtime representation.
    """

    @staticmethod
    def first_id(value):
        return value >> PRIM_COUNT_BITS  # reference: index.h:51

    @staticmethod
    def prim_count(value):
        return value & jnp.asarray(MAX_PRIM_COUNT, jnp.asarray(value).dtype)

    @staticmethod
    def is_leaf(value):
        return Index.prim_count(value) != 0  # reference: index.h:53

    @staticmethod
    def is_inner(value):
        return Index.prim_count(value) == 0

    @staticmethod
    def make_leaf(first_prim, prim_count, dtype=jnp.uint32):
        """Pack a leaf index word (reference: index.h:64-67)."""
        first_prim = jnp.asarray(first_prim, dtype)
        prim_count = jnp.asarray(prim_count, dtype)
        return (first_prim << PRIM_COUNT_BITS) | prim_count

    @staticmethod
    def make_inner(first_child, dtype=jnp.uint32):
        """Pack an inner index word (reference: index.h:69-71)."""
        return jnp.asarray(first_child, dtype) << PRIM_COUNT_BITS

    @staticmethod
    def set_first_id(value, first_id):
        """Replace the first_id field, keeping prim_count
        (reference: index.h:56-58)."""
        dtype = jnp.asarray(value).dtype
        return (jnp.asarray(first_id, dtype) << PRIM_COUNT_BITS) | Index.prim_count(value)


class Bvh(NamedTuple):
    """A BVH as flat device arrays (reference: bvh.h:16-31).

    Attributes:
      bounds:   [node_capacity, 2*dim] scalar array, interleaved
                min/max per axis (reference: node.h:31-34).
      index:    [node_capacity] packed index words (uint32 / uint64).
      prim_ids: [prim_capacity] primitive permutation (uint32 / uint64);
                positions are what leaf index words refer to.
      node_count: scalar int32, number of valid nodes (<= capacity).
      prim_count: scalar int32, number of valid prim ids.

    Slots past the counts are zero. Capacity is static (2n-1 nodes for
    n primitives bounds it); counts are dynamic so the whole structure
    can live inside one `jit`.
    """

    bounds: jnp.ndarray
    index: jnp.ndarray
    prim_ids: jnp.ndarray
    node_count: jnp.ndarray
    prim_count: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.bounds.shape[-1] // 2

    @property
    def node_capacity(self) -> int:
        return self.bounds.shape[0]

    @property
    def scalar_dtype(self):
        return self.bounds.dtype

    # --- sibling-index helpers (reference: bvh.h:33-51). Children are
    # always allocated in pairs with the left child at an odd index.
    @staticmethod
    def is_left_sibling(node_id):
        return node_id % 2 == 1  # reference: bvh.h:34

    @staticmethod
    def get_sibling_id(node_id):
        return jnp.where(Bvh.is_left_sibling(node_id), node_id + 1, node_id - 1)

    @staticmethod
    def get_left_sibling_id(node_id):
        return jnp.where(Bvh.is_left_sibling(node_id), node_id, node_id - 1)

    @staticmethod
    def get_right_sibling_id(node_id):
        return jnp.where(Bvh.is_left_sibling(node_id), node_id + 1, node_id)

    def get_node_bbox(self, node_id):
        """(min, max) vectors of a node, de-interleaving the bounds row
        (reference: node.h:46-50)."""
        row = self.bounds[node_id]
        return row[..., 0::2], row[..., 1::2]

    def root_bbox(self):
        return self.get_node_bbox(0)


def node_capacity_for(prim_count: int, min_leaf_size: int = 1) -> int:
    """Static node-array capacity for a binary BVH over `prim_count`
    primitives: every leaf holds >= 1 prim and inner nodes have exactly
    two children, so node count <= 2n - 1 (reference mirrors this with
    `reserve(2n / min_leaf_size)` at top_down_sah_builder.h:78)."""
    n = max(1, (prim_count + min_leaf_size - 1) // min_leaf_size)
    return max(1, 2 * n - 1)


def make_node_bounds_row(bbox_min, bbox_max):
    """Interleave (min, max) vectors into a `2*dim` bounds row
    (reference: node.h:52-57)."""
    return jnp.stack([bbox_min, bbox_max], axis=-1).reshape(*bbox_min.shape[:-1], -1)
