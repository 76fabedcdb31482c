"""Quality-based builder selection facade.

TPU-native counterpart of `DefaultBuilder`
(reference: src/bvh/v2/default_builder.h). Pipeline selection matches
the reference exactly:

- parallel path (prim_count >= parallel_threshold): mini-tree build,
  plus reinsertion when quality == HIGH (reference: 33-46);
- serial path (small inputs): binned for LOW, sweep for MEDIUM/HIGH,
  plus reinsertion for HIGH (reference: 49-62);
- mini-tree config derivation: pruning off for LOW, pruning area ratio
  0.01 for HIGH / 0.1 for MEDIUM (reference: 65-73).

"Parallel" on TPU is not a thread pool but the level-synchronous
mini-tree forest; the serial overload's role (reference path for small
inputs) maps to the plain single-tree builders.
"""

from __future__ import annotations

import dataclasses
import enum

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
from bvh_tpu.build.reinsertion import ReinsertionConfig, optimize_reinsertion
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.core.types import Bvh


class Quality(enum.Enum):
    """reference: default_builder.h:21."""

    LOW = "low"
    MEDIUM = "medium"
    HIGH = "high"


@dataclasses.dataclass(frozen=True)
class DefaultConfig(TopDownConfig):
    """Names/defaults match reference: default_builder.h:23-30."""

    quality: Quality = Quality.HIGH
    parallel_threshold: int = 1024


def _mini_tree_config(config: DefaultConfig) -> MiniTreeConfig:
    """reference: make_mini_tree_config, default_builder.h:65-73."""
    return MiniTreeConfig(
        sah=config.sah,
        min_leaf_size=config.min_leaf_size,
        max_leaf_size=config.max_leaf_size,
        enable_pruning=config.quality != Quality.LOW,
        pruning_area_ratio=0.01 if config.quality == Quality.HIGH else 0.1,
        parallel_threshold=config.parallel_threshold,
    )


def build_default(
    bb_min,
    bb_max,
    centers,
    config: DefaultConfig | None = None,
    parallel: bool = True,
) -> Bvh:
    """Build a BVH, selecting the pipeline by quality level.

    `parallel=True` mirrors the thread-pool overload (reference: 33-46):
    inputs with at least `parallel_threshold` primitives take the
    mini-tree path. `parallel=False` forces the serial overload
    (reference: 49-62). The selection itself is static (prim count is a
    static shape), so this composes with `jit`.
    """
    if config is None:
        config = DefaultConfig()
    n = centers.shape[0]
    tdc = TopDownConfig(
        sah=config.sah,
        min_leaf_size=config.min_leaf_size,
        max_leaf_size=config.max_leaf_size,
    )

    if parallel and n >= config.parallel_threshold:
        bvh = build_minitree(bb_min, bb_max, centers, _mini_tree_config(config))
        if config.quality == Quality.HIGH:
            bvh = optimize_reinsertion(bvh, ReinsertionConfig())
        return bvh

    if config.quality == Quality.LOW:
        return build_binned(bb_min, bb_max, centers, tdc)
    bvh = build_sweep(bb_min, bb_max, centers, tdc)
    if config.quality == Quality.HIGH:
        bvh = optimize_reinsertion(bvh, ReinsertionConfig())
    return bvh
