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

    # Scatter-free segmented binning: counts via one cumsum + boundary
    # gathers, bin bboxes via one flagged segmented min/max scan, both
    # read per open node at its segment's last position. (TPU scatter
    # with n updates serializes; scans/gathers are bandwidth-bound.)
    pbmn = bb_min[prim]
    pbmx = bb_max[prim]
    onehot = bins_of[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
    node_f = f2n  # frontier -> node ids (sentinel cap when unused)
    node_f_c = jnp.minimum(node_f, cap - 1)
    begin_f = state.begin[node_f_c]
    end_f = state.end[node_f_c]
    cnt_cols = (onehot & act[:, None, None]).reshape(n, dim * B).astype(jnp.int32)
    cnt = frontier.segment_sums_at(cnt_cols, begin_f, end_f).reshape(f_cap, dim, B)
    mask4 = onehot[:, :, :, None]
    vals_mn = jnp.where(mask4, pbmn[:, None, None, :], big).reshape(n, dim * B * dim)
    vals_mx = jnp.where(mask4, pbmx[:, None, None, :], -big).reshape(n, dim * B * dim)
    heads = frontier.segment_heads(state)
    smn, smx = frontier.segmented_minmax(heads, vals_mn, vals_mx)
    last_f = jnp.clip(end_f - 1, 0, n - 1)
    bmn = smn[last_f].reshape(f_cap, dim, B, dim)
    bmx = smx[last_f].reshape(f_cap, dim, B, dim)
    # Sentinel frontier slots (f2n == cap) must read as empty bins.
    live_f = (node_f < cap)[:, None, None]
    cnt = jnp.where(live_f, cnt, 0)
    bmn = jnp.where(live_f[..., None], bmn, big)
    bmx = jnp.where(live_f[..., None], bmx, -big)

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
    size_f = end_f - begin_f
    row_f = state.bounds[node_f_c]
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

    # Broadcast frontier decisions back to node indexing by gathering
    # at each node's frontier position (fpos; garbage for closed nodes,
    # masked by open_ — scatter-free).
    fpos_c = jnp.clip(fpos, 0, f_cap - 1)
    node_axis = jnp.where(state.open_, best_axis_f[fpos_c], 0)
    node_split_val = jnp.where(state.open_, split_val_f[fpos_c], 0)
    node_sah_ok = state.open_ & sah_ok_f[fpos_c]
    node_largest = jnp.where(state.open_, largest_f[fpos_c], 0)

    # ---- SAH partition test per position ---------------------------
    axis_p = node_axis[nid]
    center_on_axis = jnp.take_along_axis(c, axis_p[:, None], axis=1)[:, 0]
    gl_sah = center_on_axis < node_split_val[nid]

    count_left = frontier.segment_sums_at(
        (gl_sah & act).astype(jnp.int32), state.begin, state.end
    )
    count_left = jnp.where(state.open_, count_left, 0)
    size_all = state.end - state.begin
    degenerate = node_sah_ok & ((count_left == 0) | (count_left == size_all))
    do_split = state.open_ & (node_sah_ok | (size_all > config.max_leaf_size))
    use_fb = do_split & (~node_sah_ok | degenerate)

    # ---- median fallback (reference: fallback_split, 118-126) ------
    def fb_ranks():
        key = jnp.where(act & use_fb[nid], fpos[nid], f_cap)
        largest_p = node_largest[nid]
        vals = jnp.take_along_axis(c, largest_p[:, None], axis=1)[:, 0]
        sizes_by_key = jnp.where(use_fb[node_f_c] & (node_f < cap), size_f, 0)
        return frontier.segment_ranks_by_value(key, vals, sizes_by_key, f_cap)

    # The false branch derives its zeros from the (device-varying)
    # center data rather than a fresh constant so both cond branches
    # have the same varying-axes type when this round runs inside
    # shard_map (par/minitree_sharded.py).
    ranks = jax.lax.cond(
        jnp.any(use_fb), fb_ranks,
        lambda: (center_on_axis * 0).astype(jnp.int32),
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
