"""Level-synchronous frontier machinery shared by the top-down builders.

The reference's top-down builders are recursive with an explicit work
stack (reference: top_down_sah_builder.h:74-131). On TPU, recursion and
dynamic work queues do not map to XLA's static-shape model, so the
rebuild is *level-synchronous*: one `lax.while_loop` iteration splits
every open node at once using segmented scatters/scans over a single
flat primitive ordering. This file holds the state pytree and the
builder-agnostic "apply one round of splits" step; each builder
(binned/sweep) only decides, per round, which nodes split and which
primitives go left.

Contracts kept from the reference:
- SATO child ordering: the left child is the child with the larger
  half-area (reference: top_down_sah_builder.h:100-108).
- Leaf/inner packed index semantics (reference: index.h).
- min/max leaf-size policy (reference: top_down_sah_builder.h:89,
  sweep/binned try_split fallbacks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import (
    Bvh,
    Index,
    index_dtype_for,
    make_node_bounds_row,
    node_capacity_for,
)


class FrontierState(NamedTuple):
    """Builder loop state. `n` primitives, `cap = 2n - 1` node slots.

    order:  [n] int32 — primitive ids, contiguous per node segment
            (the analogue of the reference's `prim_ids_` vector).
    seg:    [n] int32 — node slot owning each position.
    bounds: [cap, 2*dim] — node bounds, interleaved min/max.
    index:  [cap] uint — packed index words (0 until finalized).
    begin/end: [cap] int32 — primitive range of each node.
    open_:  [cap] bool — nodes still to be processed.
    node_count: scalar int32.
    """

    order: jnp.ndarray
    seg: jnp.ndarray
    bounds: jnp.ndarray
    index: jnp.ndarray
    begin: jnp.ndarray
    end: jnp.ndarray
    open_: jnp.ndarray
    node_count: jnp.ndarray


def init_state(bboxes_min, bboxes_max, min_leaf_size: int) -> FrontierState:
    """Create the root node over all primitives
    (reference: top_down_sah_builder.h:77-83)."""
    n, dim = bboxes_min.shape
    assert n >= 1, "cannot build a BVH over zero primitives"
    cap = node_capacity_for(n)
    dtype = bboxes_min.dtype
    index_dtype = index_dtype_for(dtype)

    root_min = jnp.min(bboxes_min, axis=0)
    root_max = jnp.max(bboxes_max, axis=0)

    bounds = jnp.zeros((cap, 2 * dim), dtype)
    bounds = bounds.at[0].set(make_node_bounds_row(root_min, root_max))

    index = jnp.zeros((cap,), index_dtype)
    root_is_leaf = n <= min_leaf_size
    if root_is_leaf:
        index = index.at[0].set(Index.make_leaf(0, n, index_dtype))

    return FrontierState(
        order=jnp.arange(n, dtype=jnp.int32),
        seg=jnp.zeros((n,), jnp.int32),
        bounds=bounds,
        index=index,
        begin=jnp.zeros((cap,), jnp.int32),
        end=jnp.zeros((cap,), jnp.int32).at[0].set(n),
        open_=jnp.zeros((cap,), bool).at[0].set(not root_is_leaf),
        node_count=jnp.asarray(1, jnp.int32),
    )


def init_forest(
    bboxes_min,
    bboxes_max,
    order,
    group_begin,
    group_end,
    min_leaf_size: int,
    node_capacity: int,
) -> FrontierState:
    """Create a forest of root segments: root g owns positions
    [group_begin[g], group_end[g]) of `order`. Used by the mini-tree
    builder, whose per-tile sub-builds (reference:
    mini_tree_builder.h:105-139) all run inside ONE level-synchronous
    loop here — the load-balanced TPU replacement for per-tile thread
    tasks. Empty groups (begin == end) become closed zero-size roots
    that must never be referenced by callers."""
    n, dim = bboxes_min.shape
    g_cap = group_begin.shape[0]
    dtype = bboxes_min.dtype
    index_dtype = index_dtype_for(dtype)
    cap = node_capacity

    sizes = group_end - group_begin
    # Per-root bbox via segment scatter over member prims.
    gid = jnp.zeros((n,), jnp.int32).at[jnp.clip(group_begin, 0, n)].max(
        jnp.arange(g_cap, dtype=jnp.int32), mode="drop"
    )
    gid = jax.lax.associative_scan(jnp.maximum, gid)
    pb_min = bboxes_min[order]
    pb_max = bboxes_max[order]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    root_mn = jnp.full((cap, dim), big, dtype).at[gid].min(pb_min, mode="drop")
    root_mx = jnp.full((cap, dim), -big, dtype).at[gid].max(pb_max, mode="drop")
    bounds = jnp.zeros((cap, 2 * dim), dtype)
    rows = make_node_bounds_row(root_mn, root_mx)
    in_roots = jnp.arange(cap) < g_cap
    bounds = jnp.where(in_roots[:, None], rows, bounds)

    # Roots with 1..min_leaf prims are leaves; empty roots closed.
    index = jnp.zeros((cap,), index_dtype)
    g_ids = jnp.arange(cap, dtype=jnp.int32)
    sizes_p = jnp.zeros((cap,), jnp.int32).at[:g_cap].set(sizes)
    begin_p = jnp.zeros((cap,), jnp.int32).at[:g_cap].set(group_begin)
    end_p = jnp.zeros((cap,), jnp.int32).at[:g_cap].set(group_end)
    is_root = g_ids < g_cap
    leaf_now = is_root & (sizes_p > 0) & (sizes_p <= min_leaf_size)
    leaf_word = Index.make_leaf(
        jnp.maximum(begin_p, 0), jnp.maximum(sizes_p, 1), index_dtype
    )
    index = jnp.where(leaf_now, leaf_word, index)

    return FrontierState(
        order=order.astype(jnp.int32),
        seg=gid,
        bounds=bounds,
        index=index,
        begin=begin_p,
        end=end_p,
        open_=is_root & (sizes_p > min_leaf_size),
        node_count=jnp.asarray(g_cap, jnp.int32),
    )


def compact_frontier(open_):
    """Assign dense frontier positions to open nodes.

    Returns `(fpos, f2n, num_open)` where `fpos[node] in [0, F)` for open
    nodes (garbage elsewhere) and `f2n[fpos] = node`. `F_cap` is
    `max(1, n // 2)`: every open node holds >= 2 primitives in disjoint
    ranges.
    """
    cap = open_.shape[0]
    f_cap = max(1, (cap + 1) // 4)  # cap = 2n-1 -> floor(n/2) open nodes max
    fpos = jnp.cumsum(open_.astype(jnp.int32), dtype=jnp.int32) - 1
    safe_fpos = jnp.where(open_, fpos, f_cap)  # out-of-range -> dropped
    # Unused frontier slots map to the sentinel `cap` so that scatters
    # indexed through f2n are dropped rather than clobbering node 0.
    f2n = jnp.full((f_cap,), cap, jnp.int32).at[safe_fpos].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )
    return fpos, f2n, jnp.sum(open_, dtype=jnp.int32)


def segmented_left_rank(goes_left, begin_p):
    """Exclusive count of left-going positions before each position
    inside its segment. `begin_p[p]` is the segment start of position p.
    This is the stable-partition rank (the XLA replacement for
    std::stable_partition at sweep_sah_builder.h:132-136)."""
    gl = goes_left.astype(jnp.int32)
    ecs = jnp.cumsum(gl, dtype=jnp.int32) - gl
    return ecs - ecs[begin_p]


def apply_splits(
    state: FrontierState,
    bboxes_min,
    bboxes_max,
    do_split,
    goes_left,
    min_leaf_size: int,
    extra_orders=(),
    extra_goes_left=(),
):
    """Split every node with `do_split[node]`; close the rest of the open
    nodes as leaves. `goes_left[p]` routes position p (only meaningful in
    splitting segments). Performs the stable segmented partition, child
    allocation, SATO ordering, bbox computation, and leaf finalization.

    `extra_orders`/`extra_goes_left`: additional per-axis primitive
    orderings sharing the same segment ranges, partitioned stably with
    their own routing masks (the sweep builder's per-axis sorted id
    lists, reference: sweep_sah_builder.h:47,129-136). Returns
    `(state, new_extra_orders)`.
    """
    n = state.order.shape[0]
    cap = state.open_.shape[0]
    dim = bboxes_min.shape[1]
    index_dtype = state.index.dtype
    pos = jnp.arange(n, dtype=jnp.int32)

    nid = state.seg
    act = do_split[nid]  # positions whose segment splits this round
    begin_p = state.begin[nid]
    gl = goes_left & act

    # --- stable segmented partition --------------------------------
    count_left = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(act, nid, cap)
    ].add(gl.astype(jnp.int32), mode="drop")
    left_rank = segmented_left_rank(gl, begin_p)
    right_rank = (pos - begin_p) - left_rank
    new_pos = jnp.where(
        act,
        jnp.where(gl, begin_p + left_rank, begin_p + count_left[nid] + right_rank),
        pos,
    )
    new_order = jnp.zeros_like(state.order).at[new_pos].set(state.order)

    # Partition the extra per-axis orderings with their own routing but
    # the shared segment geometry (same counts by construction).
    new_extras = []
    for xorder, xgl in zip(extra_orders, extra_goes_left):
        xg = xgl & act
        xlr = segmented_left_rank(xg, begin_p)
        xrr = (pos - begin_p) - xlr
        xnew_pos = jnp.where(
            act,
            jnp.where(xg, begin_p + xlr, begin_p + count_left[nid] + xrr),
            pos,
        )
        new_extras.append(jnp.zeros_like(xorder).at[xnew_pos].set(xorder))

    mid = state.begin + count_left  # absolute split position per node

    # --- child slot allocation (pairs, left child at odd index;
    # reference: bvh.h:33-39, top_down_sah_builder.h:91-94) ----------
    split_i = do_split.astype(jnp.int32)
    child_base = state.node_count + 2 * (jnp.cumsum(split_i, dtype=jnp.int32) - split_i)
    num_splits = jnp.sum(split_i, dtype=jnp.int32)

    # --- per-side bounding boxes (reference: compute_bbox,
    # top_down_sah_builder.h:133-139) --------------------------------
    pb_min = bboxes_min[state.order]
    pb_max = bboxes_max[state.order]
    big = jnp.asarray(jnp.finfo(pb_min.dtype).max, pb_min.dtype)
    side = jnp.where(gl, 0, 1)
    scat_nid = jnp.where(act, nid, cap)
    side_min = jnp.full((cap, 2, dim), big, pb_min.dtype).at[scat_nid, side].min(
        pb_min, mode="drop"
    )
    side_max = jnp.full((cap, 2, dim), -big, pb_max.dtype).at[scat_nid, side].max(
        pb_max, mode="drop"
    )

    area_a = bbox_ops.get_half_area(side_min[:, 0], side_max[:, 0])
    area_b = bbox_ops.get_half_area(side_min[:, 1], side_max[:, 1])
    # SATO: the left child must be the larger-area child
    # (reference: top_down_sah_builder.h:100-108).
    swap = area_a < area_b

    # Child 0 (left) takes range A=[begin,mid) unless swapped.
    a_first = ~swap
    c0_min = jnp.where(a_first[:, None], side_min[:, 0], side_min[:, 1])
    c0_max = jnp.where(a_first[:, None], side_max[:, 0], side_max[:, 1])
    c1_min = jnp.where(a_first[:, None], side_min[:, 1], side_min[:, 0])
    c1_max = jnp.where(a_first[:, None], side_max[:, 1], side_max[:, 0])
    c0_begin = jnp.where(a_first, state.begin, mid)
    c0_end = jnp.where(a_first, mid, state.end)
    c1_begin = jnp.where(a_first, mid, state.begin)
    c1_end = jnp.where(a_first, state.end, mid)

    # --- scatter children into the node arrays ----------------------
    c0 = jnp.where(do_split, child_base, cap)  # out-of-range -> dropped
    c1 = jnp.where(do_split, child_base + 1, cap)

    bounds = state.bounds
    bounds = bounds.at[c0].set(make_node_bounds_row(c0_min, c0_max), mode="drop")
    bounds = bounds.at[c1].set(make_node_bounds_row(c1_min, c1_max), mode="drop")

    begin = state.begin.at[c0].set(c0_begin, mode="drop").at[c1].set(c1_begin, mode="drop")
    end = state.end.at[c0].set(c0_end, mode="drop").at[c1].set(c1_end, mode="drop")

    # A child is open iff its size exceeds min_leaf_size
    # (reference: top_down_sah_builder.h:89); otherwise it is a leaf now.
    c0_size = c0_end - c0_begin
    c1_size = c1_end - c1_begin
    c0_open = c0_size > min_leaf_size
    c1_open = c1_size > min_leaf_size

    index = state.index
    # Parent becomes inner (reference: top_down_sah_builder.h:92).
    index = index.at[jnp.where(do_split, jnp.arange(cap), cap)].set(
        Index.make_inner(child_base, index_dtype), mode="drop"
    )
    # Min-leaf children become leaves immediately
    # (reference: top_down_sah_builder.h:125).
    c0_leaf_idx = Index.make_leaf(
        jnp.maximum(c0_begin, 0), jnp.maximum(c0_size, 1), index_dtype
    )
    c1_leaf_idx = Index.make_leaf(
        jnp.maximum(c1_begin, 0), jnp.maximum(c1_size, 1), index_dtype
    )
    index = index.at[jnp.where(do_split & ~c0_open, c0, cap)].set(c0_leaf_idx, mode="drop")
    index = index.at[jnp.where(do_split & ~c1_open, c1, cap)].set(c1_leaf_idx, mode="drop")

    # Open nodes that did not split close as leaves
    # (reference: top_down_sah_builder.h:125).
    close_leaf = state.open_ & ~do_split
    size_all = state.end - state.begin
    leaf_idx_all = Index.make_leaf(
        jnp.maximum(state.begin, 0), jnp.maximum(size_all, 1), index_dtype
    )
    index = index.at[jnp.where(close_leaf, jnp.arange(cap), cap)].set(
        leaf_idx_all, mode="drop"
    )

    open_ = state.open_ & ~do_split & ~close_leaf
    open_ = open_.at[c0].set(c0_open, mode="drop")
    open_ = open_.at[c1].set(c1_open, mode="drop")

    # --- route primitives to their child segment --------------------
    child_of_a = jnp.where(swap, child_base + 1, child_base)
    child_of_b = jnp.where(swap, child_base, child_base + 1)
    new_seg_val = jnp.where(gl, child_of_a[nid], child_of_b[nid])
    seg = jnp.zeros_like(state.seg).at[new_pos].set(
        jnp.where(act, new_seg_val, state.seg)
    )

    new_state = FrontierState(
        order=new_order,
        seg=seg,
        bounds=bounds,
        index=index,
        begin=begin,
        end=end,
        open_=open_,
        node_count=state.node_count + 2 * num_splits,
    )
    return new_state, tuple(new_extras)


def finalize(state: FrontierState) -> Bvh:
    """Package the frontier state as a `Bvh` (reference:
    top_down_sah_builder.h:128-130). Slots past node_count stay zero."""
    n = state.order.shape[0]
    cap = state.open_.shape[0]
    valid = jnp.arange(cap) < state.node_count
    index_dtype = state.index.dtype
    return Bvh(
        bounds=jnp.where(valid[:, None], state.bounds, 0),
        index=jnp.where(valid, state.index, 0),
        prim_ids=state.order.astype(index_dtype),
        node_count=state.node_count,
        prim_count=jnp.asarray(n, jnp.int32),
    )


def segment_ranks_by_value(sort_key, values, sizes_by_key, key_cap: int):
    """Rank of each position among positions sharing `sort_key`, ordered
    by `values` (stable). Positions with `sort_key == key_cap` are
    ignored (rank garbage). Used for median fallback splits
    (reference: binned_sah_builder.h:118-126 partial_sort, and the
    forced-median path at sweep_sah_builder.h:116-124).

    `sizes_by_key[k]` must be the number of positions with key k.
    """
    n = values.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    key_sorted, _, pos_sorted = jax.lax.sort(
        (sort_key, values, pos), num_keys=2
    )
    offsets = jnp.cumsum(sizes_by_key, dtype=jnp.int32) - sizes_by_key  # exclusive
    offsets = jnp.concatenate([offsets, jnp.zeros((1,), offsets.dtype)])
    ranks_sorted = pos - offsets[jnp.minimum(key_sorted, key_cap)]
    return jnp.zeros((n,), jnp.int32).at[pos_sorted].set(ranks_sorted)
