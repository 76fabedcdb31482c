"""SAH cost model and shared top-down builder configuration.

TPU-native counterpart of `SplitHeuristic`
(reference: src/bvh/v2/split_heuristic.h) and
`TopDownSahBuilder::Config` (reference: top_down_sah_builder.h:27-40).
Names and defaults match the reference.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import MAX_PRIM_COUNT


@dataclasses.dataclass(frozen=True)
class SplitHeuristic:
    """SAH evaluator (reference: split_heuristic.h:11-44).

    `log_cluster_size` is the log2 of the primitive cluster size;
    `cost_ratio` is the cost of a node (ray-box) intersection over the
    cost of a primitive intersection.
    """

    log_cluster_size: int = 0
    cost_ratio: float = 1.0

    @property
    def prim_offset(self) -> int:
        return (1 << self.log_cluster_size) - 1

    def get_prim_count(self, size):
        """(size + offset) >> log_cluster_size
        (reference: split_heuristic.h:26-28)."""
        return (size + self.prim_offset) >> self.log_cluster_size

    def get_leaf_cost(self, size, half_area):
        """half_area * rounded prim count
        (reference: split_heuristic.h:31-33). `size` is an integer
        array; `half_area` a float array."""
        return half_area * self.get_prim_count(size).astype(half_area.dtype)

    def get_non_split_cost(self, size, half_area):
        """half_area * (rounded prim count - cost_ratio)
        (reference: split_heuristic.h:36-38)."""
        counts = self.get_prim_count(size).astype(half_area.dtype)
        return half_area * (counts - jnp.asarray(self.cost_ratio, half_area.dtype))


@dataclasses.dataclass(frozen=True)
class TopDownConfig:
    """Shared top-down builder config
    (reference: top_down_sah_builder.h:27-40). Defaults match the
    reference: min_leaf_size=1, max_leaf_size=8."""

    sah: SplitHeuristic = dataclasses.field(default_factory=SplitHeuristic)
    min_leaf_size: int = 1
    max_leaf_size: int = 8

    def __post_init__(self):
        assert self.min_leaf_size <= self.max_leaf_size
        # Leaf prim counts must fit the 4-bit packed index field
        # (reference: index.h:38, node.h:22).
        assert self.max_leaf_size <= MAX_PRIM_COUNT


def node_half_area(bounds_row):
    """Half-area of interleaved `[..., 2*dim]` node bounds rows."""
    return bbox_ops.get_half_area(bounds_row[..., 0::2], bounds_row[..., 1::2])
