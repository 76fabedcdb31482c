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

import jax

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


def _use_fast_minitree(bb_min, bb_max, centers) -> bool:
    """The per-group Pallas kernel (build_minitree_fast) is bit-identical
    to build_minitree but stages group sizing on the host, so it only
    applies to concrete (untraced) f32 3D inputs on an accelerator —
    exactly the production build path. Everything else (jit-traced
    inputs, f64, 2D/4D, CPU) takes the level-synchronous XLA build."""
    if jax.default_backend() == "cpu":
        return False
    for x in (bb_min, bb_max, centers):
        if isinstance(x, jax.core.Tracer):
            return False
    import numpy as np

    return (getattr(centers, "ndim", 0) == 2 and centers.shape[1] == 3
            and all(np.dtype(getattr(x, "dtype", np.float64)) == np.float32
                    for x in (bb_min, bb_max, centers)))


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
        mtc = _mini_tree_config(config)
        if _use_fast_minitree(bb_min, bb_max, centers):
            from bvh_tpu.build.minitree_fast import build_minitree_fast

            bvh = build_minitree_fast(bb_min, bb_max, centers, mtc)
        else:
            bvh = build_minitree(bb_min, bb_max, centers, mtc)
        if config.quality == Quality.HIGH:
            bvh = optimize_reinsertion(bvh, ReinsertionConfig())
        return bvh

    if config.quality == Quality.LOW:
        return build_binned(bb_min, bb_max, centers, tdc)
    bvh = build_sweep(bb_min, bb_max, centers, tdc)
    if config.quality == Quality.HIGH:
        bvh = optimize_reinsertion(bvh, ReinsertionConfig())
    return bvh
