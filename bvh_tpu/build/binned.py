"""Binned SAH builder, level-synchronous.

TPU-native counterpart of `BinnedSahBuilder`
(reference: src/bvh/v2/binned_sah_builder.h; Wald, "On Fast
Construction of SAH-based Bounding Volume Hierarchies"). One
`lax.while_loop` round bins every primitive of every open node into
`BIN_COUNT` bins per axis with scatter-adds (the parallel analogue of
`fill_bins`, binned_sah_builder.h:82-99), evaluates the SAH sweep over
bins (find_best_split, 101-116), partitions with a stable segmented
rank, and falls back to median splits exactly when the reference does
(try_split, 128-156).

Decision-parity notes:
- Cost ties select the first (axis-major, bin-ascending) minimum, the
  order the reference scans with a strict `<` update.
- Invalid splits (empty side) carry +inf cost, which the reference
  realizes as NaN costs that fail its comparisons.
- Partitioning here is stable while the reference's std::partition is
  not; the resulting trees can differ in intra-leaf primitive order,
  which does not affect traversal results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bvh_tpu.build import frontier
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Bvh

BIN_COUNT = 8  # reference: binned_sah_builder.h:18 (BinCount = 8)


def _round(state: frontier.FrontierState, bb_min, bb_max, centers, config: TopDownConfig):
    n, dim = centers.shape
    cap = state.open_.shape[0]
    dtype = centers.dtype
    B = BIN_COUNT
    inf = jnp.asarray(jnp.inf, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    sah = config.sah

    fpos, f2n, _ = frontier.compact_frontier(state.open_)
    f_cap = f2n.shape[0]

    # ---- per-position binning (reference: fill_bins, 82-99) --------
    nid = state.seg
    act = state.open_[nid]
    f = jnp.where(act, fpos[nid], f_cap)  # sentinel -> dropped
    prim = state.order
    c = centers[prim]
    node_row = state.bounds[nid]
    nmn, nmx = node_row[:, 0::2], node_row[:, 1::2]
    bin_scale = jnp.asarray(B, dtype) / (nmx - nmn)
    bin_offset = -nmn * bin_scale
    posf = c * bin_scale + bin_offset  # fma license as in the reference
    # robust_max(pos, 0) then min(B-1, trunc) (reference: 94-95);
    # NaN -> 0, +inf -> B-1.
    posf = jnp.where(posf > 0, posf, 0)
    posf = jnp.where(posf < B - 1, posf, B - 1)
    bins_of = posf.astype(jnp.int32)

    pbmn = bb_min[prim]
    pbmx = bb_max[prim]
    cnt = jnp.zeros((f_cap, dim, B), jnp.int32)
    bmn = jnp.full((f_cap, dim, B, dim), big, dtype)
    bmx = jnp.full((f_cap, dim, B, dim), -big, dtype)
    act_i = act.astype(jnp.int32)
    for axis in range(dim):
        b = bins_of[:, axis]
        cnt = cnt.at[f, axis, b].add(act_i, mode="drop")
        bmn = bmn.at[f, axis, b].min(pbmn, mode="drop")
        bmx = bmx.at[f, axis, b].max(pbmx, mode="drop")

    # ---- SAH sweep over bins (reference: find_best_split, 101-116) --
    right_cost = jnp.full((f_cap, dim, B), inf, dtype)
    racc_mn = jnp.full((f_cap, dim, dim), big, dtype)
    racc_mx = jnp.full((f_cap, dim, dim), -big, dtype)
    rcnt = jnp.zeros((f_cap, dim), jnp.int32)
    for i in range(B - 1, 0, -1):
        racc_mn = jnp.minimum(racc_mn, bmn[:, :, i])
        racc_mx = jnp.maximum(racc_mx, bmx[:, :, i])
        rcnt = rcnt + cnt[:, :, i]
        ha = bbox_ops.get_half_area(racc_mn, racc_mx)
        cost = sah.get_leaf_cost(rcnt, ha)
        right_cost = right_cost.at[:, :, i].set(jnp.where(rcnt > 0, cost, inf))

    costs = jnp.full((f_cap, dim, B - 1), inf, dtype)
    lacc_mn = jnp.full((f_cap, dim, dim), big, dtype)
    lacc_mx = jnp.full((f_cap, dim, dim), -big, dtype)
    lcnt = jnp.zeros((f_cap, dim), jnp.int32)
    for i in range(B - 1):
        lacc_mn = jnp.minimum(lacc_mn, bmn[:, :, i])
        lacc_mx = jnp.maximum(lacc_mx, bmx[:, :, i])
        lcnt = lcnt + cnt[:, :, i]
        ha = bbox_ops.get_half_area(lacc_mn, lacc_mx)
        total = sah.get_leaf_cost(lcnt, ha) + right_cost[:, :, i + 1]
        costs = costs.at[:, :, i].set(jnp.where(lcnt > 0, total, inf))

    flat = costs.reshape(f_cap, dim * (B - 1))
    flat = jnp.where(jnp.isnan(flat), inf, flat)
    best_flat = jnp.argmin(flat, axis=1)  # first min = reference scan order
    best_cost = jnp.take_along_axis(flat, best_flat[:, None], axis=1)[:, 0]
    best_axis_f = (best_flat // (B - 1)).astype(jnp.int32)
    best_bin_f = (best_flat % (B - 1) + 1).astype(jnp.int32)

    # ---- per-node decisions (reference: try_split, 128-156) --------
    node_f = f2n  # frontier -> node ids (sentinel cap when unused)
    size_f = state.end[jnp.minimum(node_f, cap - 1)] - state.begin[jnp.minimum(node_f, cap - 1)]
    row_f = state.bounds[jnp.minimum(node_f, cap - 1)]
    fmn, fmx = row_f[:, 0::2], row_f[:, 1::2]
    diag_f = fmx - fmn
    node_ha = bbox_ops.get_half_area(fmn, fmx)
    non_split = sah.get_non_split_cost(size_f, node_ha)
    sah_ok_f = best_cost < non_split
    largest_f = jnp.argmax(diag_f, axis=1).astype(jnp.int32)  # first max, vec.h:33
    # Chosen split plane (reference: 145-148).
    diag_best = jnp.take_along_axis(diag_f, best_axis_f[:, None], axis=1)[:, 0]
    min_best = jnp.take_along_axis(fmn, best_axis_f[:, None], axis=1)[:, 0]
    split_val_f = (diag_best / jnp.asarray(B, dtype)) * best_bin_f.astype(dtype) + min_best

    # Scatter frontier decisions to node-indexed arrays.
    node_axis = jnp.zeros((cap,), jnp.int32).at[node_f].set(best_axis_f, mode="drop")
    node_split_val = jnp.zeros((cap,), dtype).at[node_f].set(split_val_f, mode="drop")
    node_sah_ok = jnp.zeros((cap,), bool).at[node_f].set(sah_ok_f, mode="drop")
    node_largest = jnp.zeros((cap,), jnp.int32).at[node_f].set(largest_f, mode="drop")

    # ---- SAH partition test per position ---------------------------
    axis_p = node_axis[nid]
    center_on_axis = jnp.take_along_axis(c, axis_p[:, None], axis=1)[:, 0]
    gl_sah = center_on_axis < node_split_val[nid]

    count_left = jnp.zeros((cap,), jnp.int32).at[jnp.where(act, nid, cap)].add(
        (gl_sah & act).astype(jnp.int32), mode="drop"
    )
    size_all = state.end - state.begin
    degenerate = node_sah_ok & ((count_left == 0) | (count_left == size_all))
    do_split = state.open_ & (node_sah_ok | (size_all > config.max_leaf_size))
    use_fb = do_split & (~node_sah_ok | degenerate)

    # ---- median fallback (reference: fallback_split, 118-126) ------
    def fb_ranks():
        key = jnp.where(act & use_fb[nid], fpos[nid], f_cap)
        largest_p = node_largest[nid]
        vals = jnp.take_along_axis(c, largest_p[:, None], axis=1)[:, 0]
        sizes_by_key = jnp.zeros((f_cap,), jnp.int32).at[
            jnp.where(use_fb, fpos, f_cap)
        ].set(size_all, mode="drop")
        return frontier.segment_ranks_by_value(key, vals, sizes_by_key, f_cap)

    ranks = jax.lax.cond(
        jnp.any(use_fb), fb_ranks, lambda: jnp.zeros((n,), jnp.int32)
    )
    # Left count of a median split: (size + 1) // 2
    # (reference: fallback mid = (begin + end + 1) / 2).
    gl_fb = ranks < ((size_all[nid] + 1) // 2)

    goes_left = jnp.where(use_fb[nid], gl_fb, gl_sah)
    new_state, _ = frontier.apply_splits(
        state, bb_min, bb_max, do_split, goes_left, config.min_leaf_size
    )
    return new_state


def build_binned(bb_min, bb_max, centers, config: TopDownConfig | None = None) -> Bvh:
    """Build a BVH with the binned SAH builder.

    Args:
      bb_min, bb_max: [n, dim] primitive bounding boxes.
      centers: [n, dim] primitive centers.
      config: `TopDownConfig` (static; defaults match the reference).

    Fully jittable; shapes are static in `n`.
    """
    if config is None:
        config = TopDownConfig()
    state = frontier.init_state(bb_min, bb_max, config.min_leaf_size)
    state = jax.lax.while_loop(
        lambda s: jnp.any(s.open_),
        lambda s: _round(s, bb_min, bb_max, centers, config),
        state,
    )
    return frontier.finalize(state)
