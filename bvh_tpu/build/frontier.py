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
    force_closed=None,
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

    open_ = is_root & (sizes_p > min_leaf_size)
    if force_closed is not None:
        # Roots that must never open or be referenced (e.g. the padding
        # pseudo-group of a per-device shard, par/minitree_sharded.py).
        fc = jnp.zeros((cap,), bool).at[:g_cap].set(force_closed)
        open_ = open_ & ~fc

    return FrontierState(
        order=order.astype(jnp.int32),
        seg=gid,
        bounds=bounds,
        index=index,
        begin=begin_p,
        end=end_p,
        open_=open_,
        node_count=jnp.asarray(g_cap, jnp.int32),
    )


def segment_heads(state: FrontierState):
    """True at the first position of each node segment. Used as the
    reset flag for segmented scans (the scatter-free formulation of the
    reference's per-node loops; TPU scatter with n updates serializes,
    a flagged associative scan is bandwidth-bound)."""
    n = state.order.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    return pos == state.begin[state.seg]


def segmented_minmax(heads, vmin, vmax):
    """Inclusive segmented cummin/cummax over contiguous segments.

    heads: [n] bool segment-start flags. vmin/vmax: [n, K]. Returns the
    running (min, max) within each segment; row `end-1` of a segment is
    its full reduction.
    """

    def comb(a, b):
        fa, mna, mxa = a
        fb, mnb, mxb = b
        keep = fb[:, None] if mnb.ndim == 2 else fb
        mn = jnp.where(keep, mnb, jnp.minimum(mna, mnb))
        mx = jnp.where(keep, mxb, jnp.maximum(mxa, mxb))
        return fa | fb, mn, mx

    _, mn, mx = jax.lax.associative_scan(comb, (heads, vmin, vmax), axis=0)
    return mn, mx


def segment_sums_at(values, begin, end):
    """Per-query sums over position ranges [begin_i, end_i) via one
    inclusive cumsum + two boundary gathers (scatter-free segmented
    sum; segments are contiguous by the frontier invariant).

    values: [n] or [n, K]. begin/end: [q] int32. Returns [q] or [q, K].
    """
    n = values.shape[0]
    cs = jnp.cumsum(values, axis=0)
    if values.ndim == 1:
        def at(idx):
            return jnp.where(idx >= 0, cs[jnp.clip(idx, 0, n - 1)], 0)
    else:
        def at(idx):
            return jnp.where(
                (idx >= 0)[:, None], cs[jnp.clip(idx, 0, n - 1)], 0
            )
    return at(end - 1) - at(begin - 1)


def inverse_permute(new_pos, payloads):
    """Compute `out[new_pos[p]] = payload[p]` for each payload via one
    multi-payload sort keyed on the destination (the scatter-free
    permutation apply; `new_pos` must be a permutation of [0, n))."""
    res = jax.lax.sort((new_pos,) + tuple(payloads), num_keys=1)
    return res[1:]


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
    num_open = jnp.sum(open_, dtype=jnp.int32)
    # Compaction via one key sort (scatter-free): open nodes carry their
    # dense fpos as key, closed ones a big key, so the first num_open
    # sorted payloads are the open node ids in fpos order. Unused
    # frontier slots map to the sentinel `cap` so that reads indexed
    # through f2n can be masked.
    key = jnp.where(open_, fpos, cap)
    _, ids_sorted = jax.lax.sort(
        (key, jnp.arange(cap, dtype=jnp.int32)), num_keys=1
    )
    f2n = jnp.where(
        jnp.arange(f_cap, dtype=jnp.int32) < num_open, ids_sorted[:f_cap], cap
    )
    return fpos, f2n, num_open


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

    # --- stable segmented partition (scatter-free: cumsum ranks +
    # boundary gathers + one destination-keyed sort) -----------------
    count_left = segment_sums_at(gl.astype(jnp.int32), state.begin, state.end)
    count_left = jnp.where(do_split, count_left, 0)
    left_rank = segmented_left_rank(gl, begin_p)
    right_rank = (pos - begin_p) - left_rank
    new_pos = jnp.where(
        act,
        jnp.where(gl, begin_p + left_rank, begin_p + count_left[nid] + right_rank),
        pos,
    )

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
        (xnew,) = inverse_permute(xnew_pos, (xorder,))
        new_extras.append(xnew)

    mid = state.begin + count_left  # absolute split position per node

    # --- child slot allocation (pairs, left child at odd index;
    # reference: bvh.h:33-39, top_down_sah_builder.h:91-94) ----------
    split_i = do_split.astype(jnp.int32)
    child_base = state.node_count + 2 * (jnp.cumsum(split_i, dtype=jnp.int32) - split_i)
    num_splits = jnp.sum(split_i, dtype=jnp.int32)

    # --- per-side bounding boxes (reference: compute_bbox,
    # top_down_sah_builder.h:133-139) — scatter-free: one flagged
    # segmented min/max scan over [left-masked | right-masked] values,
    # read at each segment's last position.
    pb_min = bboxes_min[state.order]
    pb_max = bboxes_max[state.order]
    big = jnp.asarray(jnp.finfo(pb_min.dtype).max, pb_min.dtype)
    heads = segment_heads(state)
    gr = act & ~gl
    vals_mn = jnp.concatenate(
        [jnp.where(gl[:, None], pb_min, big), jnp.where(gr[:, None], pb_min, big)],
        axis=1,
    )
    vals_mx = jnp.concatenate(
        [jnp.where(gl[:, None], pb_max, -big), jnp.where(gr[:, None], pb_max, -big)],
        axis=1,
    )
    smn, smx = segmented_minmax(heads, vals_mn, vals_mx)
    last = jnp.clip(state.end - 1, 0, n - 1)
    side_min = smn[last].reshape(cap, 2, dim)
    side_max = smx[last].reshape(cap, 2, dim)

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

    # --- write children into the node arrays (scatter-free) ---------
    # Child pairs land in the contiguous fresh range
    # [node_count, node_count + 2*num_splits). One key sort compacts
    # the splitting node ids into rank order; every destination slot
    # then *gathers* its content from its source parent.
    rank = jnp.cumsum(split_i, dtype=jnp.int32) - split_i
    skey = jnp.where(do_split, rank, cap)
    _, split_node_of = jax.lax.sort(
        (skey, jnp.arange(cap, dtype=jnp.int32)), num_keys=1
    )

    slot = jnp.arange(cap, dtype=jnp.int32)
    rel = slot - state.node_count
    is_child = (rel >= 0) & (rel < 2 * num_splits)
    src = split_node_of[jnp.clip(rel >> 1, 0, cap - 1)]
    side1 = (rel & 1) == 1

    # A child is open iff its size exceeds min_leaf_size
    # (reference: top_down_sah_builder.h:89); otherwise it is a leaf now.
    c0_size = c0_end - c0_begin
    c1_size = c1_end - c1_begin
    c0_open = c0_size > min_leaf_size
    c1_open = c1_size > min_leaf_size

    c0_row = make_node_bounds_row(c0_min, c0_max)
    c1_row = make_node_bounds_row(c1_min, c1_max)
    child_row = jnp.where(side1[:, None], c1_row[src], c0_row[src])
    bounds = jnp.where(is_child[:, None], child_row, state.bounds)
    begin = jnp.where(is_child, jnp.where(side1, c1_begin[src], c0_begin[src]), state.begin)
    end = jnp.where(is_child, jnp.where(side1, c1_end[src], c0_end[src]), state.end)

    # Parent becomes inner (reference: top_down_sah_builder.h:92).
    index = jnp.where(
        do_split, Index.make_inner(child_base, index_dtype), state.index
    )
    # Min-leaf children become leaves immediately
    # (reference: top_down_sah_builder.h:125).
    c0_leaf_idx = Index.make_leaf(
        jnp.maximum(c0_begin, 0), jnp.maximum(c0_size, 1), index_dtype
    )
    c1_leaf_idx = Index.make_leaf(
        jnp.maximum(c1_begin, 0), jnp.maximum(c1_size, 1), index_dtype
    )
    child_leaf_idx = jnp.where(side1, c1_leaf_idx[src], c0_leaf_idx[src])
    child_open = jnp.where(side1, c1_open[src], c0_open[src])
    index = jnp.where(is_child & ~child_open, child_leaf_idx, index)

    # Open nodes that did not split close as leaves
    # (reference: top_down_sah_builder.h:125).
    close_leaf = state.open_ & ~do_split
    size_all = state.end - state.begin
    leaf_idx_all = Index.make_leaf(
        jnp.maximum(state.begin, 0), jnp.maximum(size_all, 1), index_dtype
    )
    index = jnp.where(close_leaf, leaf_idx_all, index)

    open_ = jnp.where(is_child, child_open, state.open_ & ~do_split & ~close_leaf)

    # --- route primitives to their child segment, applying the
    # partition permutation to (order, seg) with one sort -------------
    child_of_a = jnp.where(swap, child_base + 1, child_base)
    child_of_b = jnp.where(swap, child_base, child_base + 1)
    new_seg_val = jnp.where(gl, child_of_a[nid], child_of_b[nid])
    new_order, seg = inverse_permute(
        new_pos, (state.order, jnp.where(act, new_seg_val, state.seg))
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
    (ranks,) = inverse_permute(pos_sorted, (ranks_sorted,))
    return ranks
