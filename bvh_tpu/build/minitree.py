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


def _grid_groups(centers, config: MiniTreeConfig, executor=None):
    """Steps 2-3: morton bin per prim, then greedy adjacent-bin groups.

    Returns (group_of_prim [n], num_groups_cap) with group ids dense in
    morton order.

    The scene-centers bbox reduction routes through an executor, just
    as the reference's does (mini_tree_builder.h:161-167 calls
    `executor_.reduce` with a bbox-extend join); min/max joins are
    associative + commutative, so SequentialExecutor (serial left
    fold) and ParallelExecutor (tree reduction) produce bit-identical
    bounds.
    """
    n, dim = centers.shape
    dtype = centers.dtype
    grid_dim = 1 << config.log2_grid_dim
    bin_count = 1 << (config.log2_grid_dim * dim)

    if executor is None:
        from bvh_tpu.par.executor import ParallelExecutor

        executor = ParallelExecutor()
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    cmin, cmax = executor.reduce(
        (centers, centers),
        lambda a, b: (jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])),
        (jnp.full((dim,), big, dtype), jnp.full((dim,), -big, dtype)),
    )
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


def build_minitree(bb_min, bb_max, centers, config: MiniTreeConfig | None = None,
                   executor=None) -> Bvh:
    """Build a BVH with the mini-tree pipeline. Fully jittable.

    `executor` (reference parity: MiniTreeBuilder::build takes the
    thread pool, mini_tree_builder.h:47-58): the iteration/reduction
    strategy for the scene-bounds reduce; default ParallelExecutor.
    """
    if config is None:
        config = MiniTreeConfig()
    n, dim = centers.shape
    dtype = centers.dtype
    idx_dtype = index_dtype_for(dtype)
    g_cap = min(1 << (config.log2_grid_dim * dim), n)

    group, _ = _grid_groups(centers, config, executor)
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

    # ---- step 5: pruning — choose the splice roots -------------------
    # (reference: prune_mini_trees, 207-247). A forest node becomes a
    # splice root when its half-area drops below `pruning_area_ratio` x
    # the average mini-tree root area (or it is a leaf) and every
    # ancestor within its mini-tree stayed above the threshold. With
    # pruning off, the splice roots are the mini-tree roots themselves;
    # both cases run the same generalized splice below.
    ids_f = jnp.arange(forest_cap, dtype=jnp.int32)
    valid_f = ids_f < forest.node_count
    is_root_slot = ids_f < g_cap
    real_root = is_root_slot & jnp.pad(real, (0, forest_cap - g_cap))
    area_f = bbox_ops.get_half_area(forest.bounds[:, 0::2], forest.bounds[:, 1::2])
    leaf_f = Index.is_leaf(forest.index) & valid_f
    inner_f = ~leaf_f & valid_f
    first_f = Index.first_id(forest.index).astype(jnp.int32)

    g2_cap = max(g_cap, min(4 * g_cap, n))
    if config.enable_pruning:
        num_real = jnp.maximum(jnp.sum(real.astype(jnp.int32)), 1)
        avg_area = jnp.sum(jnp.where(real_root, area_f, 0)) / num_real.astype(dtype)
        thr = avg_area * jnp.asarray(config.pruning_area_ratio, dtype)
        ok = area_f >= thr

        # Top-down propagation: anc_ok(child) = anc_ok(p) & ok(p).
        parents_f = jnp.zeros((forest_cap,), jnp.int32)
        lch = jnp.where(inner_f, first_f, forest_cap)
        rch = jnp.where(inner_f, first_f + 1, forest_cap)
        parents_f = parents_f.at[lch].set(ids_f, mode="drop")
        parents_f = parents_f.at[rch].set(ids_f, mode="drop")

        def td_cond(st):
            done, _ = st
            return jnp.any(valid_f & ~done)

        def td_body(st):
            done, anc_ok = st
            p = parents_f
            can = valid_f & ~done & done[p]
            anc_ok = jnp.where(can, anc_ok[p] & ok[p], anc_ok)
            return done | can, anc_ok

        done0 = ~valid_f | is_root_slot
        _, anc_ok = jax.lax.while_loop(td_cond, td_body, (done0, real_root))
        pruned_root = anc_ok & (~ok | leaf_f) & valid_f
        pruned_root = jnp.where(is_root_slot, real_root & (~ok | leaf_f), pruned_root)
        # Static capacity guard: too many cut points -> no pruning.
        overflow = jnp.sum(pruned_root.astype(jnp.int32)) > g2_cap
        pruned_root = jnp.where(overflow, real_root, pruned_root)
    else:
        pruned_root = real_root

    # ---- canonical tid-major ordering --------------------------------
    # Splice roots and node pairs are ordered by (mini-tree id, forest
    # slot). Per-tree slot order equals per-tree allocation order, which
    # is identical whether the forest was built in one global
    # level-synchronous loop or per-device local loops (a tree's
    # allocations are a subsequence preserved under interleaving), so
    # the sharded build (par/mesh.py) produces bit-identical output.
    parents_f2 = jnp.zeros((forest_cap,), jnp.int32)
    lch2 = jnp.where(inner_f, first_f, forest_cap)
    rch2 = jnp.where(inner_f, first_f + 1, forest_cap)
    parents_f2 = parents_f2.at[lch2].set(ids_f, mode="drop")
    parents_f2 = parents_f2.at[rch2].set(ids_f, mode="drop")

    def tid_cond(st):
        done, _ = st
        return jnp.any(valid_f & ~done)

    def tid_body(st):
        done, tid = st
        p = parents_f2
        can = valid_f & ~done & done[p]
        tid = jnp.where(can, tid[p], tid)
        return done | can, tid

    tid0 = jnp.where(is_root_slot, ids_f, 0)
    done0t = ~valid_f | is_root_slot
    _, tid_f = jax.lax.while_loop(tid_cond, tid_body, (done0t, tid0))

    # ---- step 6: sweep top tree over splice-root bboxes --------------
    pr_key = jnp.where(pruned_root, tid_f, forest_cap)
    pr_sorted_key, pr_sorted_slot = jax.lax.sort(
        (pr_key, ids_f), num_keys=2
    )
    num_pr = jnp.sum(pruned_root.astype(jnp.int32))
    proot_of = jnp.where(
        jnp.arange(g2_cap, dtype=jnp.int32) < num_pr,
        pr_sorted_slot[:g2_cap],
        -1,
    )
    real2 = proot_of >= 0
    pr_rows = forest.bounds[jnp.clip(proot_of, 0, forest_cap - 1)]
    pr_mn, pr_mx = pr_rows[:, 0::2], pr_rows[:, 1::2]
    scene_mx = jnp.max(jnp.where(real2[:, None], pr_mx, -jnp.inf), axis=0)
    # Phantom entries (absent splice roots under the static capacity):
    # point boxes at the scene corner; erased below.
    top_mn = jnp.where(real2[:, None], pr_mn, scene_mx)
    top_mx = jnp.where(real2[:, None], pr_mx, scene_mx)
    top_centers = bbox_ops.get_center(top_mn, top_mx)
    top_cfg = TopDownConfig(sah=config.sah, min_leaf_size=1, max_leaf_size=1)
    top_raw = build_sweep(top_mn, top_mx, top_centers, top_cfg)

    # Erase phantom leaves exactly, then refit inner bounds.
    top_cap = top_raw.index.shape[0]
    leaf_first = Index.first_id(top_raw.index).astype(jnp.int32)
    leaf_slot = top_raw.prim_ids[jnp.clip(leaf_first, 0, g2_cap - 1)].astype(jnp.int32)
    keep = real2[jnp.clip(leaf_slot, 0, g2_cap - 1)]
    top = canonicalize(top_raw, keep)
    from bvh_tpu.traverse.refit import refit

    top = refit(top)

    # ---- generalized splice (reference: 262-308) ----------------------
    # Forest nodes strictly below a splice root are copied, in sibling
    # PAIRS, contiguously after the top tree; pair order preserves the
    # left-child-at-odd-index invariant because the top tree's node
    # count is odd (2L-1).
    def sb_cond(st):
        done, _ = st
        return jnp.any(valid_f & ~done)

    def sb_body(st):
        done, below = st
        p = parents_f2
        can = valid_f & ~done & done[p]
        below = jnp.where(can, pruned_root[p] | below[p], below)
        return done | can, below

    done0 = ~valid_f | is_root_slot
    _, strict_below = jax.lax.while_loop(
        sb_cond, sb_body, (done0, jnp.zeros((forest_cap,), bool))
    )

    tc = top.node_count
    n_pairs = (forest_cap - g_cap) // 2
    pair_ids = jnp.arange(n_pairs, dtype=jnp.int32)
    pair_base = g_cap + 2 * pair_ids
    pair_live = strict_below[jnp.clip(pair_base, 0, forest_cap - 1)] & (
        pair_base < forest.node_count
    )
    pl_i = pair_live.astype(jnp.int32)
    live_pairs = jnp.sum(pl_i, dtype=jnp.int32)
    # Canonical pair order: (tid, slot) — see the tid-major note above.
    pair_tid = tid_f[jnp.clip(pair_base, 0, forest_cap - 1)]
    pair_key = jnp.where(pair_live, pair_tid, forest_cap)
    _, _, pair_sorted = jax.lax.sort(
        (pair_key, pair_base, pair_ids), num_keys=2
    )
    pair_rank = jnp.zeros((n_pairs,), jnp.int32).at[pair_sorted].set(
        jnp.arange(n_pairs, dtype=jnp.int32)
    )

    def remap_forest_index(words):
        """Child-pair base b (always >= g_cap, parity-aligned) moves to
        tc + 2 * pair_rank[(b - g_cap) / 2]; leaves keep their global
        prim positions."""
        first = Index.first_id(words).astype(jnp.int32)
        is_lf = Index.is_leaf(words)
        k = jnp.clip((first - g_cap) >> 1, 0, n_pairs - 1)
        new_first = jnp.where(is_lf, first, tc + 2 * pair_rank[k])
        return jnp.where(
            is_lf, words, Index.make_inner(jnp.maximum(new_first, 0), idx_dtype)
        )

    final_cap = top_cap + forest_cap  # static
    bounds = jnp.zeros((final_cap, 2 * dim), dtype)
    index = jnp.zeros((final_cap,), idx_dtype)
    ids_top = jnp.arange(top_cap, dtype=jnp.int32)

    # Top-tree nodes: inner stay; leaves take their splice root's content.
    top_is_leaf = Index.is_leaf(top.index) & (ids_top < tc)
    tl_first = Index.first_id(top.index).astype(jnp.int32)
    tl_slot = top.prim_ids[jnp.clip(tl_first, 0, g2_cap - 1)].astype(jnp.int32)
    tl_root = proot_of[jnp.clip(tl_slot, 0, g2_cap - 1)]
    tl_root = jnp.clip(tl_root, 0, forest_cap - 1)
    root_content_bounds = forest.bounds[tl_root]
    root_content_index = remap_forest_index(forest.index[tl_root])
    top_bounds = jnp.where(top_is_leaf[:, None], root_content_bounds, top.bounds)
    top_index = jnp.where(top_is_leaf, root_content_index, top.index)
    valid_top = ids_top < tc
    bounds = bounds.at[:top_cap].set(jnp.where(valid_top[:, None], top_bounds, 0))
    index = index.at[:top_cap].set(jnp.where(valid_top, top_index, 0))

    # Live forest pairs, contiguously after the top tree.
    node_pair = jnp.clip((ids_f - g_cap) >> 1, 0, n_pairs - 1)
    node_live = (ids_f >= g_cap) & valid_f & strict_below
    dest = jnp.where(
        node_live, tc + 2 * node_pair_rank_of(pair_rank, node_pair) + ((ids_f - g_cap) & 1),
        final_cap,
    )
    bounds = bounds.at[dest].set(forest.bounds, mode="drop")
    index = index.at[dest].set(remap_forest_index(forest.index), mode="drop")

    bvh = Bvh(
        bounds=bounds,
        index=index,
        prim_ids=forest.order.astype(idx_dtype),
        node_count=tc + 2 * live_pairs,
        prim_count=jnp.asarray(n, jnp.int32),
    )
    return bvh


def node_pair_rank_of(pair_rank, node_pair):
    return pair_rank[node_pair]
