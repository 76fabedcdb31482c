"""Sweep SAH builder, level-synchronous.

TPU-native counterpart of `SweepSahBuilder`
(reference: src/bvh/v2/sweep_sah_builder.h). Primitives are argsorted
once per axis (reference: ctor, 56-63); each round evaluates the exact
SAH at *every* split position of every open node with two segmented
scans per axis (prefix/suffix bbox-union via `associative_scan`), then
stable-partitions all axis orderings by a shared mark array
(reference: mark_primitives + stable_partition, 103-136).

The reference's chunked early-exit (68-101) is a serial-CPU
optimization that never changes the selected split (skipped candidates
are provably worse); on parallel hardware the full scan is the cheap
and exact choice, so it is used here.

Decision parity: candidate costs tie-break to the first (axis-major,
position-ascending) minimum and must beat the non-split cost strictly,
mirroring try_split (108-124); the median fallback forces a split on
the largest axis when the node exceeds max_leaf_size (116-123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bvh_tpu.build import frontier
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Bvh


def _segmented_union_scan(mn, mx, seg_start, reverse: bool):
    """Inclusive segmented bbox-union scan along axis 0.

    `seg_start[p]` marks segment starts for a forward scan; for a
    reverse scan it must mark segment *ends*. Returns per-position
    accumulated (mn, mx) from the segment boundary to p inclusive.
    """
    if reverse:
        mn, mx = mn[::-1], mx[::-1]
        seg_start = seg_start[::-1]

    def op(a, b):
        af, amn, amx = a
        bf, bmn, bmx = b
        return (
            af | bf,
            jnp.where(bf[:, None], bmn, jnp.minimum(amn, bmn)),
            jnp.where(bf[:, None], bmx, jnp.maximum(amx, bmx)),
        )

    _, out_mn, out_mx = jax.lax.associative_scan(op, (seg_start, mn, mx))
    if reverse:
        out_mn, out_mx = out_mn[::-1], out_mx[::-1]
    return out_mn, out_mx


def _round(state, extras, bb_min, bb_max, centers, config: TopDownConfig):
    n, dim = centers.shape
    cap = state.open_.shape[0]
    dtype = centers.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    sah = config.sah
    pos = jnp.arange(n, dtype=jnp.int32)

    orders = (state.order,) + extras  # orders[axis][p] = prim id

    nid = state.seg
    act = state.open_[nid]
    begin_p = state.begin[nid]
    end_p = state.end[nid]
    seg_start = (pos == begin_p) | ~act
    seg_end = (pos == end_p - 1) | ~act

    # ---- exact SAH over every split position, per axis --------------
    # (reference: find_best_split, 68-101, without the serial early-exit)
    axis_costs = []
    for axis in range(dim):
        pid = orders[axis]
        pmn = bb_min[pid]
        pmx = bb_max[pid]
        lmn, lmx = _segmented_union_scan(pmn, pmx, seg_start, reverse=False)
        rmn, rmx = _segmented_union_scan(pmn, pmx, seg_end, reverse=True)
        left_ha = bbox_ops.get_half_area(lmn, lmx)
        right_ha = bbox_ops.get_half_area(rmn, rmx)
        left_cost = sah.get_leaf_cost(pos + 1 - begin_p, left_ha)
        right_cost = sah.get_leaf_cost(end_p - pos, right_ha)
        # Split after position p (split index p+1): left [begin, p],
        # right [p+1, end). Invalid at the last segment position.
        cost = left_cost + jnp.where(
            pos + 1 < end_p, jnp.roll(right_cost, -1), inf
        )
        cost = jnp.where(act & (pos + 1 < end_p), cost, inf)
        cost = jnp.where(jnp.isnan(cost), inf, cost)
        axis_costs.append(cost)

    # Per-node (cost, split position) via a flagged segmented
    # lexicographic-min scan over all axes at once, read at each
    # segment's last position (scatter-free; smallest position wins
    # ties, the reference's strict-< scan order).
    cost_nd = jnp.stack(axis_costs, axis=1)
    pos_nd = jnp.broadcast_to((pos + 1)[:, None], (n, dim))
    heads = pos == begin_p

    def comb(a, b):
        fa, ca, pa = a
        fb, cb, pb = b
        take_b = fb[:, None] | (cb < ca) | ((cb == ca) & (pb < pa))
        return fa | fb, jnp.where(take_b, cb, ca), jnp.where(take_b, pb, pa)

    _, sc, sp = jax.lax.associative_scan(comb, (heads, cost_nd, pos_nd), axis=0)
    last = jnp.clip(state.end - 1, 0, n - 1)
    bc = sc[last]  # [cap, dim]
    bp = sp[last]

    # Lexicographic combine across axes (axis-ascending, strict <).
    best_cost = bc[:, 0]
    best_axis = jnp.zeros((cap,), jnp.int32)
    best_pos = bp[:, 0]
    for axis in range(1, dim):
        better = bc[:, axis] < best_cost
        best_cost = jnp.where(better, bc[:, axis], best_cost)
        best_pos = jnp.where(better, bp[:, axis], best_pos)
        best_axis = jnp.where(better, axis, best_axis)

    # ---- split / leaf / fallback decision (try_split, 108-124) ------
    size_all = state.end - state.begin
    row = state.bounds
    node_ha = bbox_ops.get_half_area(row[:, 0::2], row[:, 1::2])
    non_split = sah.get_non_split_cost(size_all, node_ha)
    sah_ok = state.open_ & (best_cost < non_split)
    do_split = state.open_ & (sah_ok | (size_all > config.max_leaf_size))
    use_fb = do_split & ~sah_ok

    largest = jnp.argmax(row[:, 1::2] - row[:, 0::2], axis=1).astype(jnp.int32)
    split_axis = jnp.where(use_fb, largest, best_axis)
    # Fallback median: (begin + end + 1) / 2 (reference: 122).
    split_pos = jnp.where(use_fb, (state.begin + state.end + 1) // 2, best_pos)

    # ---- mark primitives on the split axis (103-106) -----------------
    # Scatter-free: invert each axis ordering with one sort, then every
    # prim reads its position in its node's split-axis ordering and
    # compares against the node's split position.
    inv0, nid_by_prim = frontier.inverse_permute(orders[0], (pos, nid))
    invs = [inv0]
    for axis in range(1, dim):
        (inva,) = frontier.inverse_permute(orders[axis], (pos,))
        invs.append(inva)
    ax_q = split_axis[nid_by_prim]
    pos_q = invs[0]
    for axis in range(1, dim):
        pos_q = jnp.where(ax_q == axis, invs[axis], pos_q)
    marks = pos_q < split_pos[nid_by_prim]

    goes_left = [marks[orders[axis]] for axis in range(dim)]
    new_state, new_extras = frontier.apply_splits(
        state,
        bb_min,
        bb_max,
        do_split,
        goes_left[0],
        config.min_leaf_size,
        extra_orders=extras,
        extra_goes_left=tuple(goes_left[1:]),
    )
    return new_state, new_extras


def build_sweep(bb_min, bb_max, centers, config: TopDownConfig | None = None) -> Bvh:
    """Build a BVH with the exact sweep SAH builder
    (reference: sweep_sah_builder.h:30-36). Fully jittable."""
    if config is None:
        config = TopDownConfig()
    n, dim = centers.shape
    state = frontier.init_state(bb_min, bb_max, config.min_leaf_size)
    # Per-axis stable argsort by center (reference: ctor, 56-63; stable
    # sort makes rebuilds deterministic where std::sort ties are not).
    orders = tuple(
        jnp.argsort(centers[:, axis], stable=True).astype(jnp.int32)
        for axis in range(dim)
    )
    state = state._replace(order=orders[0])
    extras = orders[1:]

    state, extras = jax.lax.while_loop(
        lambda se: jnp.any(se[0].open_),
        lambda se: _round(se[0], se[1], bb_min, bb_max, centers, config),
        (state, extras),
    )
    return frontier.finalize(state)
