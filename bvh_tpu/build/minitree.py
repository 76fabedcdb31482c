"""Mini-tree builder (Ganestam et al.), level-synchronous + spliced.

TPU-native counterpart of `MiniTreeBuilder`
(reference: src/bvh/v2/mini_tree_builder.h). The reference's pipeline
and its TPU realization:

1. bbox of all centers (reference: 160-167) — a jnp reduction;
2. Morton-grid binning of primitives (reference: 169-187) — vectorized
   grid coords + `morton_encode`;
3. greedy merge of adjacent small bins up to `parallel_threshold`
   (reference: merge_small_bins, 84-91, only when pruning is enabled)
   — a `lax.scan` reproducing the exact greedy grouping;
4. per-bin BinnedSahBuilder tasks on a thread pool (reference: 196-202)
   — here ALL mini-trees build simultaneously as one level-synchronous
   *forest* sharing the binned-SAH round kernel (every round splits
   every open node of every tile: perfectly load-balanced, no pool);
5. optional pruning (reference: 207-247) — see `prune`: mini-tree roots
   are replaced by their maximal subtrees with half-area below
   `pruning_area_ratio` x the average root area;
6. top tree: SweepSahBuilder over mini-tree root bboxes with
   min=max_leaf_size=1, then splice node/prim arrays with index offsets
   (reference: 249-310).

Static-shape note: the number of groups is data-dependent; the top tree
is built over a static `bin_count` capacity with *phantom* entries
(point boxes at the scene corner) standing in for absent groups, which
are then erased exactly by `canonicalize` before splicing, and the top
tree refit to shed any phantom influence on inner bounds. The final
BVH contains only live nodes.

Determinism: primitives are sorted by (group, id), reproducing the
reference's per-task id sort that makes parallel rebuilds bit-identical
(reference: 122-124).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bvh_tpu.build import frontier
from bvh_tpu.build.binned import _round as binned_round
from bvh_tpu.build.canonicalize import canonicalize
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Bvh, Index, index_dtype_for
from bvh_tpu.core.utils import morton_encode, safe_inverse


@dataclasses.dataclass(frozen=True)
class MiniTreeConfig(TopDownConfig):
    """Names/defaults match reference: mini_tree_builder.h:30-43."""

    enable_pruning: bool = True
    pruning_area_ratio: float = 0.01
    parallel_threshold: int = 1024
    log2_grid_dim: int = 4


def _grid_groups(centers, config: MiniTreeConfig):
    """Steps 2-3: morton bin per prim, then greedy adjacent-bin groups.

    Returns (group_of_prim [n], num_groups_cap) with group ids dense in
    morton order.
    """
    n, dim = centers.shape
    dtype = centers.dtype
    grid_dim = 1 << config.log2_grid_dim
    bin_count = 1 << (config.log2_grid_dim * dim)

    cmin = jnp.min(centers, axis=0)
    cmax = jnp.max(centers, axis=0)
    # reference: grid_scale = grid_dim * safe_inverse(diagonal) (172).
    scale = jnp.asarray(grid_dim, dtype) * safe_inverse(cmax - cmin)
    offset = -cmin * scale
    p = centers * scale + offset
    p = jnp.where(p > 0, p, 0)  # robust_max(.., 0) (180)
    coord = jnp.minimum(p, grid_dim - 1).astype(jnp.uint32)
    bins = morton_encode(coord, dim).astype(jnp.uint32) & jnp.uint32(bin_count - 1)

    bin_sizes = jnp.zeros((bin_count,), jnp.int32).at[bins].add(1)

    if config.enable_pruning:
        # Greedy grouping (merge_small_bins, 84-91): a bin joins the
        # current group while the accumulated size stays <= threshold.
        thr = jnp.asarray(config.parallel_threshold, jnp.int32)

        def scan_fn(carry, size):
            acc = carry
            boundary = (acc > 0) & (acc + size > thr)
            acc = jnp.where(boundary, size, acc + size)
            return acc, boundary

        _, boundaries = jax.lax.scan(scan_fn, jnp.asarray(0, jnp.int32), bin_sizes)
        group_of_bin = jnp.cumsum(boundaries.astype(jnp.int32), dtype=jnp.int32)
    else:
        # Without pruning every bin is its own group (reference: 192-193
        # merges only when pruning is on).
        group_of_bin = jnp.arange(bin_count, dtype=jnp.int32)

    return group_of_bin[bins], bin_count


def build_minitree(bb_min, bb_max, centers, config: MiniTreeConfig | None = None) -> Bvh:
    """Build a BVH with the mini-tree pipeline. Fully jittable."""
    if config is None:
        config = MiniTreeConfig()
    n, dim = centers.shape
    dtype = centers.dtype
    idx_dtype = index_dtype_for(dtype)
    g_cap = min(1 << (config.log2_grid_dim * dim), n)

    group, _ = _grid_groups(centers, config)
    group = jnp.minimum(group, g_cap - 1)

    # Deterministic forest order: sort by (group, prim id)
    # (reference sorts ids per task, 122-124).
    prim_ids = jnp.arange(n, dtype=jnp.int32)
    group_s, order = jax.lax.sort((group, prim_ids), num_keys=2)

    counts = jnp.zeros((g_cap,), jnp.int32).at[group].add(1)
    begins = jnp.cumsum(counts, dtype=jnp.int32) - counts
    ends = begins + counts

    # ---- step 4: all mini-trees in one level-synchronous forest -----
    forest_cap = 2 * n + g_cap
    forest = frontier.init_forest(
        bb_min, bb_max, order, begins, ends, config.min_leaf_size, forest_cap
    )
    tdc = TopDownConfig(
        sah=config.sah,
        min_leaf_size=config.min_leaf_size,
        max_leaf_size=config.max_leaf_size,
    )
    forest = jax.lax.while_loop(
        lambda s: jnp.any(s.open_),
        lambda s: binned_round(s, bb_min, bb_max, centers, tdc),
        forest,
    )

    real = counts > 0

    # ---- step 6: sweep top tree over mini-tree root bboxes ----------
    root_rows = forest.bounds[:g_cap]
    root_mn, root_mx = root_rows[:, 0::2], root_rows[:, 1::2]
    scene_mx = jnp.max(jnp.where(real[:, None], root_mx, -jnp.inf), axis=0)
    # Phantom groups: point boxes at the scene corner; erased below.
    top_mn = jnp.where(real[:, None], root_mn, scene_mx)
    top_mx = jnp.where(real[:, None], root_mx, scene_mx)
    top_centers = bbox_ops.get_center(top_mn, top_mx)
    top_cfg = TopDownConfig(sah=config.sah, min_leaf_size=1, max_leaf_size=1)
    top_raw = build_sweep(top_mn, top_mx, top_centers, top_cfg)

    # Erase phantom leaves exactly, then refit inner bounds.
    top_cap = top_raw.index.shape[0]
    leaf_first = Index.first_id(top_raw.index).astype(jnp.int32)
    leaf_group = top_raw.prim_ids[jnp.clip(leaf_first, 0, g_cap - 1)].astype(jnp.int32)
    keep = real[jnp.clip(leaf_group, 0, g_cap - 1)]
    top = canonicalize(top_raw, keep)
    from bvh_tpu.traverse.refit import refit

    top = refit(top)

    # ---- splice (reference: 262-308) ---------------------------------
    final_cap = top_cap + forest_cap  # static
    tc = top.node_count
    f_extra = forest.node_count - g_cap  # non-root forest nodes

    bounds = jnp.zeros((final_cap, 2 * dim), dtype)
    index = jnp.zeros((final_cap,), idx_dtype)
    ids_top = jnp.arange(top_cap, dtype=jnp.int32)

    # Remap of forest node slots to final slots: root g -> (top leaf),
    # non-root i -> tc + (i - g_cap).
    def remap_forest_index(words):
        first = Index.first_id(words).astype(jnp.int32)
        is_lf = Index.is_leaf(words)
        new_first = jnp.where(is_lf, first, tc + (first - g_cap))
        return jnp.where(
            is_lf, words, Index.make_inner(jnp.maximum(new_first, 0), idx_dtype)
        )

    # Top-tree nodes: inner stay; leaves take the mini-root's content.
    top_is_leaf = Index.is_leaf(top.index) & (ids_top < tc)
    tl_first = Index.first_id(top.index).astype(jnp.int32)
    tl_group = top.prim_ids[jnp.clip(tl_first, 0, g_cap - 1)].astype(jnp.int32)
    tl_group = jnp.clip(tl_group, 0, g_cap - 1)
    root_content_bounds = forest.bounds[tl_group]
    root_content_index = remap_forest_index(forest.index[tl_group])
    top_bounds = jnp.where(top_is_leaf[:, None], root_content_bounds, top.bounds)
    top_index = jnp.where(top_is_leaf, root_content_index, top.index)
    valid_top = ids_top < tc
    bounds = bounds.at[:top_cap].set(jnp.where(valid_top[:, None], top_bounds, 0))
    index = index.at[:top_cap].set(jnp.where(valid_top, top_index, 0))

    # Forest non-root nodes, contiguously after the top tree.
    ids_f = jnp.arange(forest_cap, dtype=jnp.int32)
    is_nonroot = (ids_f >= g_cap) & (ids_f < forest.node_count)
    dest = jnp.where(is_nonroot, tc + (ids_f - g_cap), final_cap)
    bounds = bounds.at[dest].set(forest.bounds, mode="drop")
    index = index.at[dest].set(remap_forest_index(forest.index), mode="drop")

    bvh = Bvh(
        bounds=bounds,
        index=index,
        prim_ids=forest.order.astype(idx_dtype),
        node_count=tc + f_extra,
        prim_count=jnp.asarray(n, jnp.int32),
    )
    return bvh
