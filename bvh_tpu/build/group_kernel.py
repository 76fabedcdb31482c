"""Per-group binned-SAH build kernel (Pallas, TPU).

The mini-tree forest build (reference: src/bvh/v2/mini_tree_builder.h:
105-205) runs every per-bin BinnedSahBuilder task as one Pallas grid
step: each step loads its group's primitives into VMEM and builds the
whole subtree with a sequential BFS work loop — splits, SATO ordering,
median fallbacks and stable partitions all on-chip.

Why a kernel: the level-synchronous XLA forest loop (build/minitree.py
step 4) is exact but pays the measured ~10 ms/stage fusion-boundary
floor of this backend ~12 times per level x ~25 levels (~4.8 s at 262K
prims, PERFORMANCE.md). One kernel launch amortizes that floor over
every node of every group: the same decisions run at the Pallas
while-loop iteration cost (~1-3 us/node).

Decision parity: every split reproduces `build/binned.py::_round`
semantics — 8-bin SAH with axis-major first-min ties, robust_max bin
clamping, non-split cost comparison, exact median fallback ranks
(stable by (value, position)), SATO larger-area-left child order
(reference: binned_sah_builder.h:82-156, top_down_sah_builder.h:
89-125) — and BFS slot allocation matches the level-synchronous
forest's per-tree order, so the assembled mini-tree BVH is
bit-identical to `build_minitree`'s when the FP primitives agree
(guaranteed in interpret mode; validated on hardware by the parity
tests).

Layouts:
  prim block  [16, P] f32   rows 0..dim-1 centers, dim..2*dim-1 bb_min,
                            2*dim..3*dim-1 bb_max, row 3*dim source
                            lane (f32-exact: lanes < P <= 2^24)
  node  nbf   [8, NCAP] f32 rows 0..2*dim-1 interleaved min/max
                            bounds, row 6 half-area, row 7 ancestor
                            min half-area (+BIG at roots)
  node  nbi   [8, NCAP] i32 row 0 begin (local), row 1 end (local),
                            row 2 first-child local slot (-1 = leaf),
                            row 3 BFS queue
  order       [8, P]    i32 row 0: source lane of each final position;
                            row 1 col 0: node count
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIN_COUNT = 8  # reference: binned_sah_builder.h:18


def _half_area(d, dim):
    """Half-area from a list of per-axis diagonals (bbox.h:32-38)."""
    if dim == 3:
        return (d[0] + d[1]) * d[2] + d[0] * d[1]
    if dim == 2:
        return d[0] + d[1]
    acc = None
    for i in range(dim):
        for j in range(i + 1, dim):
            acc = d[i] * d[j] if acc is None else acc + d[i] * d[j]
    return acc


def _scan_incl(x, lane, P):
    """Inclusive cumsum along lanes of a [1, P] row (log-step rolls)."""
    k = 1
    while k < P:
        sh = pltpu.roll(x, k, 1)
        x = x + jnp.where(lane >= k, sh, 0.0)
        k *= 2
    return x


def _group_build_kernel(
    size_ref, pf_ref, nbf_ref, nbi_ref, ordo_ref, pd, s2,
    *, dim, P, NCAP, min_leaf, max_leaf, log_cluster, cost_ratio, chunk,
    debug=False,
):
    f32, i32 = jnp.float32, jnp.int32
    B = BIN_COUNT
    BIG = jnp.asarray(np.finfo(np.float32).max, f32)
    INF = jnp.asarray(np.inf, f32)
    g = pl.program_id(0)
    size = size_ref[g]

    lane = jax.lax.broadcasted_iota(i32, (1, P), 1)
    nlane = jax.lax.broadcasted_iota(i32, (1, NCAP), 1)
    nrow = jax.lax.broadcasted_iota(i32, (8, NCAP), 0)

    def place(tab, colmask, vals):
        """Write vals[k] (scalar) at (k, col) for cols in colmask.
        Scatter-free: Mosaic has no scatter lowering; static-index
        .at[].set would emit one."""
        out = tab
        for k, v in enumerate(vals):
            if v is None:
                continue
            out = jnp.where((nrow == k) & colmask, v, out)
        return out

    # ---- init ---------------------------------------------------------
    pd[0:16, :] = pf_ref[0:16, :]
    pd[3 * dim:3 * dim + 1, :] = lane.astype(f32)
    nbf_ref[:, :] = jnp.zeros((8, NCAP), f32)
    nbi_ref[:, :] = jnp.where(
        jax.lax.broadcasted_iota(i32, (8, NCAP), 0) == 2, -1, 0)

    valid = lane < size
    mnsel = [
        jnp.min(jnp.where(valid, pd[dim + d:dim + d + 1, :], BIG))
        for d in range(dim)
    ]
    mxsel = [
        jnp.max(jnp.where(valid, pd[2 * dim + d:2 * dim + d + 1, :], -BIG))
        for d in range(dim)
    ]
    root_area = _half_area([mxsel[d] - mnsel[d] for d in range(dim)], dim)
    rvals = [None] * 8
    for d in range(dim):
        rvals[2 * d] = mnsel[d]
        rvals[2 * d + 1] = mxsel[d]
    rvals[6] = root_area
    rvals[7] = BIG
    nbf_ref[:, :] = place(nbf_ref[:, :], nlane == 0, rvals)
    root_leaf = size <= min_leaf  # reference: frontier.init_forest:139
    nbi_ref[:, :] = place(
        nbi_ref[:, :], nlane == 0,
        [jnp.asarray(0, i32), size, jnp.where(root_leaf, -1, 0),
         None, None, None, None, None])
    # queue row: slot 0 queued iff the root is open
    nbi_ref[3:4, :] = jnp.zeros((1, NCAP), i32)

    def read_col_f(q):
        return jnp.sum(jnp.where(nlane == q, nbf_ref[:, :], 0.0), axis=1)

    def read_i(row, q):
        return jnp.sum(jnp.where(nlane == q, nbi_ref[row:row + 1, :], 0))

    n_open0 = jnp.where((size > min_leaf), 1, 0).astype(i32)

    def body(carry):
        qh, qt, tail = carry
        q = read_i(3, qh)
        col_f = read_col_f(q)
        b = read_i(0, q)
        e = read_i(1, q)
        sz = e - b
        rng = (lane >= b) & (lane < e)

        # ---- binning (binned_sah_builder.h:82-99 / binned.py:48-90) --
        bins = []
        cnt_db = []
        bmn_db = []
        bmx_db = []
        for d in range(dim):
            nmn = col_f[2 * d]
            nmx = col_f[2 * d + 1]
            bscale = jnp.asarray(B, f32) / (nmx - nmn)
            boff = -nmn * bscale
            posf = pd[d:d + 1, :] * bscale + boff
            posf = jnp.where(posf > 0, posf, 0.0)
            posf = jnp.where(posf < B - 1, posf, float(B - 1))
            bin_d = posf.astype(i32)
            bins.append(bin_d)
            for bb in range(B):
                m = rng & (bin_d == bb)
                cnt_db.append(jnp.sum(m.astype(i32)))
                vmn = jnp.where(m, pd[dim:2 * dim, :], BIG)
                vmx = jnp.where(m, pd[2 * dim:3 * dim, :], -BIG)
                bmn_db.append(jnp.min(vmn, axis=1))
                bmx_db.append(jnp.max(vmx, axis=1))

        # ---- SAH sweep (binned_sah_builder.h:101-116 / binned.py) ----
        def leaf_cost(cnt_i, ha):
            pc = (cnt_i + ((1 << log_cluster) - 1)) >> log_cluster
            return ha * pc.astype(f32)

        best_cost = INF
        best_axis = jnp.asarray(0, i32)
        best_bin = jnp.asarray(1, i32)
        for d in range(dim):
            right_cost = [INF] * B
            rmn = jnp.full((dim,), BIG, f32)
            rmx = jnp.full((dim,), -BIG, f32)
            rcnt = jnp.asarray(0, i32)
            for i in range(B - 1, 0, -1):
                rmn = jnp.minimum(rmn, bmn_db[d * B + i])
                rmx = jnp.maximum(rmx, bmx_db[d * B + i])
                rcnt = rcnt + cnt_db[d * B + i]
                ha = _half_area([rmx[a] - rmn[a] for a in range(dim)], dim)
                right_cost[i] = jnp.where(
                    rcnt > 0, leaf_cost(rcnt, ha), INF)
            lmn = jnp.full((dim,), BIG, f32)
            lmx = jnp.full((dim,), -BIG, f32)
            lcnt = jnp.asarray(0, i32)
            for i in range(B - 1):
                lmn = jnp.minimum(lmn, bmn_db[d * B + i])
                lmx = jnp.maximum(lmx, bmx_db[d * B + i])
                lcnt = lcnt + cnt_db[d * B + i]
                ha = _half_area([lmx[a] - lmn[a] for a in range(dim)], dim)
                cost = jnp.where(
                    lcnt > 0, leaf_cost(lcnt, ha) + right_cost[i + 1], INF)
                cost = jnp.where(jnp.isnan(cost), INF, cost)
                # strict < keeps the axis-major first minimum
                # (binned.py:119: argmin over the flattened table)
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_axis = jnp.where(better, d, best_axis)
                best_bin = jnp.where(better, i + 1, best_bin)

        # ---- decisions (binned_sah_builder.h:128-156) ----------------
        diag = [col_f[2 * d + 1] - col_f[2 * d] for d in range(dim)]
        node_ha = col_f[6]
        pc_node = (sz + ((1 << log_cluster) - 1)) >> log_cluster
        non_split = node_ha * (pc_node.astype(f32)
                               - jnp.asarray(cost_ratio, f32))
        sah_ok = best_cost < non_split
        largest = jnp.asarray(0, i32)
        dbest_l = diag[0]
        for d in range(1, dim):
            gtr = diag[d] > dbest_l  # first max (vec.h:33)
            largest = jnp.where(gtr, d, largest)
            dbest_l = jnp.where(gtr, diag[d], dbest_l)
        diag_best = diag[0] * 0.0
        min_best = diag_best
        c_axis = jnp.zeros((1, P), f32)
        v_larg = jnp.zeros((1, P), f32)
        for d in range(dim):
            isd = best_axis == d
            diag_best = jnp.where(isd, diag[d], diag_best)
            min_best = jnp.where(isd, col_f[2 * d], min_best)
            c_axis = jnp.where(isd, pd[d:d + 1, :], c_axis)
            v_larg = jnp.where(largest == d, pd[d:d + 1, :], v_larg)
        split_val = (diag_best / jnp.asarray(B, f32)) \
            * best_bin.astype(f32) + min_best

        gl_sah = (c_axis < split_val) & rng
        count_left = jnp.sum(gl_sah.astype(i32))
        degenerate = sah_ok & ((count_left == 0) | (count_left == sz))
        do_split = sah_ok | (sz > max_leaf)
        use_fb = do_split & (~sah_ok | degenerate)

        # ---- median fallback (binned_sah_builder.h:118-126) ----------
        # Exact stable rank by (value, position) via a 32-step binary
        # search in monotone int32 key space for the k-th smallest,
        # then position-ranked ties — matches
        # frontier.segment_ranks_by_value's stable sort semantics.
        vbits = jax.lax.bitcast_convert_type(v_larg, i32)
        vkey = jnp.where(vbits < 0, jnp.asarray(-0x80000000, i32) - vbits
                         - 1, vbits)
        half = (sz + 1) // 2

        def fb_fn():
            def sstep(_, lh):
                lo, hi = lh
                # floor((lo+hi)/2) without the int32 overflow of
                # lo + (hi - lo)//2 when the span exceeds 2^31
                mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
                cnt_le = jnp.sum(
                    (rng & (vkey <= mid)).astype(i32))
                take_hi = cnt_le >= half
                return (jnp.where(take_hi, lo, mid + 1),
                        jnp.where(take_hi, mid, hi))

            lo0 = jnp.asarray(-0x80000000, i32)
            hi0 = jnp.asarray(0x7FFFFFFF, i32)
            lo, _ = jax.lax.fori_loop(0, 33, sstep, (lo0, hi0))
            below = jnp.sum((rng & (vkey < lo)).astype(i32))
            need = half - below  # ties (== lo) admitted, in lane order
            tie = rng & (vkey == lo)
            tie_rank = _scan_incl(tie.astype(f32), lane, P) - tie
            gl_ = (vkey < lo) | (tie & (tie_rank < need.astype(f32)))
            return gl_.astype(i32)  # bool region results break Mosaic

        gl = jax.lax.cond(
            use_fb, fb_fn, lambda: gl_sah.astype(i32)).astype(bool) & rng
        cl = jnp.where(use_fb, half, count_left)
        mid = b + cl
        if debug:
            jax.debug.print(
                "q={q} b={b} e={e} cl={cl} popgl={p} fb={fb} sah={s} "
                "cntl={c} tail={t}", q=q, b=b, e=e, cl=cl,
                p=jnp.sum(gl.astype(i32)), fb=use_fb, s=sah_ok,
                c=count_left, t=tail)

        # ---- stable partition (one-hot MXU apply) --------------------
        glf = gl.astype(f32)
        incl = _scan_incl(glf, lane, P)
        lrank = incl - glf
        rrank = (lane - b).astype(f32) - lrank
        new_pos = jnp.where(
            gl, b.astype(f32) + lrank, mid.astype(f32) + rrank)
        new_pos = jnp.where(rng, new_pos, -1.0)
        n_chunks = P // chunk
        for ci in range(n_chunks):
            dest = jax.lax.broadcasted_iota(i32, (chunk, P), 0) \
                + ci * chunk
            oht = (dest.astype(f32) == new_pos).astype(f32)  # [chunk, P]
            out_c = jax.lax.dot_general(
                pd[0:16, :], oht, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
            s2[:, ci * chunk:(ci + 1) * chunk] = out_c
        wr = rng & do_split
        pd[0:16, :] = jnp.where(wr, s2[0:16, :], pd[0:16, :])

        # ---- child bboxes + SATO (top_down_sah_builder.h:100-125) ----
        in_a = (lane >= b) & (lane < mid)
        in_b = (lane >= mid) & (lane < e)
        amn = [jnp.min(jnp.where(in_a, pd[dim + d:dim + d + 1, :], BIG))
               for d in range(dim)]
        amx = [jnp.max(jnp.where(in_a, pd[2 * dim + d:2 * dim + d + 1, :],
                                 -BIG)) for d in range(dim)]
        bmn_ = [jnp.min(jnp.where(in_b, pd[dim + d:dim + d + 1, :], BIG))
                for d in range(dim)]
        bmx_ = [jnp.max(jnp.where(in_b, pd[2 * dim + d:2 * dim + d + 1, :],
                                  -BIG)) for d in range(dim)]
        area_a = _half_area([amx[d] - amn[d] for d in range(dim)], dim)
        area_b = _half_area([bmx_[d] - bmn_[d] for d in range(dim)], dim)
        swap = area_a < area_b  # SATO: larger area goes left

        anc_child = jnp.minimum(col_f[7], node_ha)
        c0vals = [None] * 8
        c1vals = [None] * 8
        for d in range(dim):
            c0vals[2 * d] = jnp.where(swap, bmn_[d], amn[d])
            c0vals[2 * d + 1] = jnp.where(swap, bmx_[d], amx[d])
            c1vals[2 * d] = jnp.where(swap, amn[d], bmn_[d])
            c1vals[2 * d + 1] = jnp.where(swap, amx[d], bmx_[d])
        c0vals[6] = jnp.where(swap, area_b, area_a)
        c1vals[6] = jnp.where(swap, area_a, area_b)
        c0vals[7] = anc_child
        c1vals[7] = anc_child
        c0b = jnp.where(swap, mid, b)
        c0e = jnp.where(swap, e, mid)
        c1b = jnp.where(swap, b, mid)
        c1e = jnp.where(swap, mid, e)
        c0_open = (c0e - c0b) > min_leaf
        c1_open = (c1e - c1b) > min_leaf

        is_c0 = (nlane == tail) & do_split
        is_c1 = (nlane == tail + 1) & do_split
        nbf_new = place(nbf_ref[:, :], is_c0, c0vals)
        nbf_ref[:, :] = place(nbf_new, is_c1, c1vals)
        neg1 = jnp.asarray(-1, i32)
        meta = place(nbi_ref[:, :], is_c0,
                     [c0b, c0e, neg1, None, None, None, None, None])
        meta = place(meta, is_c1,
                     [c1b, c1e, neg1, None, None, None, None, None])
        # parent becomes inner (child slot) or closes as a leaf
        parent_child = jnp.where(do_split, tail, neg1)
        meta = place(meta, nlane == q,
                     [None, None, parent_child, None, None, None, None,
                      None])
        nbi_ref[:, :] = meta

        # queue open children (BFS = slot order)
        d0 = do_split & c0_open
        d1 = do_split & c1_open
        q0 = qt
        q1 = qt + d0.astype(i32)
        qrow = nbi_ref[3:4, :]
        qrow = jnp.where((nlane == q0) & d0, tail, qrow)
        qrow = jnp.where((nlane == q1) & d1, tail + 1, qrow)
        nbi_ref[3:4, :] = qrow
        return (qh + 1, q1 + d1.astype(i32),
                tail + 2 * do_split.astype(i32))

    qh, qt, tail = jax.lax.while_loop(
        lambda c: c[0] < c[1], body,
        (jnp.asarray(0, i32), n_open0, jnp.asarray(1, i32)))

    nc = jnp.where(size > 0, tail, 0)
    cnt_row = jnp.where(lane == 0, nc, 0)  # [1, P]
    ordo_ref[:, :] = jnp.concatenate(
        [pd[3 * dim:3 * dim + 1, :].astype(i32), cnt_row,
         jnp.zeros((6, P), i32)], axis=0)


def _group_build_kernel_ls(
    size_ref, pf_ref, nbf_ref, nbi_ref, ordo_ref, pd, ri, nb, s2,
    *, dim, P, NCAP, min_leaf, max_leaf, log_cluster, cost_ratio, chunk,
):
    """Level-synchronous variant: one while-iteration processes EVERY
    open node of the group's current BFS level at once.

    All per-node state lives on lanes (prims of a node are contiguous;
    each lane carries its node's begin/end/slot/bounds), per-level
    reductions are segmented log-step roll scans, head->segment
    broadcasts and node-table writes are one-hot MXU dots. Split
    decisions are arithmetic-identical to the BFS kernel (same scalar
    sequence per node, min/max reductions are order-independent), and
    slot allocation follows parent-slot order per level, so the output
    is bit-identical to `_group_build_kernel` / `build_binned`.

    Cost per level is O(P) lanes regardless of how many nodes the level
    holds — ~depth iterations per group instead of ~node_count.
    """
    f32, i32 = jnp.float32, jnp.int32
    B = BIN_COUNT
    BIG = jnp.asarray(np.finfo(np.float32).max, f32)
    INF = jnp.asarray(np.inf, f32)
    g = pl.program_id(0)
    size = size_ref[g]

    lane = jax.lax.broadcasted_iota(i32, (1, P), 1)
    nlane = jax.lax.broadcasted_iota(i32, (1, NCAP), 1)
    nrow = jax.lax.broadcasted_iota(i32, (8, NCAP), 0)

    def place(tab, colmask, vals):
        out = tab
        for k, v in enumerate(vals):
            if v is None:
                continue
            out = jnp.where((nrow == k) & colmask, v, out)
        return out

    def seg_suffix(rows, sege_r, combine, identity):
        """Segment-bounded inclusive right-to-left scan along lanes.
        rows: [R, P]; at each lane i: combine over j in [i, e_i)."""
        x = rows
        lane_r = jax.lax.broadcasted_iota(i32, (1, P), 1)
        k = 1
        while k < P:
            y = pltpu.roll(x, P - k, 1)  # lane i reads lane i+k (mod P)
            take = (lane_r + k) < sege_r  # same segment & in range
            x = combine(x, jnp.where(take, y, identity))
            k *= 2
        return x

    def seg_prefix_sum(row, segb_r):
        """Segment-bounded inclusive left-to-right cumsum of [R, P]."""
        x = row
        lane_r = jax.lax.broadcasted_iota(i32, (1, P), 1)
        k = 1
        while k < P:
            y = pltpu.roll(x, k, 1)
            take = (lane_r - k) >= segb_r
            x = x + jnp.where(take, y, 0.0)
            k *= 2
        return x

    def bcast_dot(rows_f32, src_lane_row):
        """out[r, i] = rows[r, src_lane_row[i]] — head->lane broadcast
        (or any per-lane gather along lanes) via tiled one-hot dots.
        The contraction dim is tiled to <=256 sublanes and the one-hot
        compares full-width (lane offset 0): Mosaic cannot broadcast
        [1, n] vectors to >256 sublanes or from nonzero lane offsets.
        The tile must divide P exactly or trailing lanes are dropped
        (P is always a multiple of 128 by construction)."""
        tile = 256 if P % 256 == 0 else 128
        src = src_lane_row.astype(f32)  # [1, P], lane offset 0
        acc = None
        for pi in range(P // tile):
            j = jax.lax.broadcasted_iota(
                i32, (tile, P), 0).astype(f32) + float(pi * tile)
            oht = (j == src).astype(f32)  # [tile, P]
            part = jax.lax.dot_general(
                rows_f32[:, pi * tile:(pi + 1) * tile], oht,
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
            acc = part if acc is None else acc + part
        return acc

    def write_dot(rows_f32, slot_row, mask_row):
        """Accumulate rows into node-slot space: out[r, s] =
        sum_i mask_i * (slot_i == s) * rows[r, i]  ([R, NCAP])."""
        R = rows_f32.shape[0]
        outs = []
        n_chunks = NCAP // chunk
        sl = jnp.where(mask_row, slot_row, -1).astype(f32)
        rows_m = jnp.where(mask_row, rows_f32, 0.0)
        for ci in range(n_chunks):
            s_ids = jax.lax.broadcasted_iota(i32, (P, chunk), 1) \
                .astype(f32) + float(ci * chunk)
            oht = (jnp.transpose(sl)
                   == s_ids).astype(f32)  # [P, chunk]
            outs.append(jax.lax.dot_general(
                rows_m, oht, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST))
        return jnp.concatenate(outs, axis=1)

    # ---- init ---------------------------------------------------------
    pd[0:16, :] = pf_ref[0:16, :]
    pd[3 * dim:3 * dim + 1, :] = lane.astype(f32)
    nbf_ref[:, :] = jnp.zeros((8, NCAP), f32)
    nbi_ref[:, :] = jnp.where(nrow == 2, -1, 0)

    act0 = lane < size
    mnsel = [jnp.min(jnp.where(act0, pd[dim + d:dim + d + 1, :], BIG))
             for d in range(dim)]
    mxsel = [jnp.max(jnp.where(act0, pd[2 * dim + d:2 * dim + d + 1, :],
                               -BIG)) for d in range(dim)]
    root_area = _half_area([mxsel[d] - mnsel[d] for d in range(dim)], dim)
    rvals = [None] * 8
    for d in range(dim):
        rvals[2 * d] = mnsel[d]
        rvals[2 * d + 1] = mxsel[d]
    rvals[6] = root_area
    rvals[7] = BIG
    nbf_ref[:, :] = place(nbf_ref[:, :], nlane == 0, rvals)
    root_leaf = size <= min_leaf
    nbi_ref[:, :] = place(
        nbi_ref[:, :], nlane == 0,
        [jnp.asarray(0, i32), size, jnp.where(root_leaf, -1, 0),
         None, None, None, None, None])

    # per-lane state rows
    ri[0:1, :] = jnp.zeros((1, P), i32)                      # segb
    ri[1:2, :] = jnp.where(lane < size, size, 0)             # sege
    ri[2:3, :] = jnp.zeros((1, P), i32)                      # slot
    ri[3:4, :] = ((lane < size) & ~root_leaf).astype(i32)    # alive
    nbrows = jnp.zeros((8, P), f32)
    for d in range(dim):
        nbrows = jnp.where(
            jax.lax.broadcasted_iota(i32, (8, P), 0) == 2 * d,
            mnsel[d], nbrows)
        nbrows = jnp.where(
            jax.lax.broadcasted_iota(i32, (8, P), 0) == 2 * d + 1,
            mxsel[d], nbrows)
    nbrows = jnp.where(jax.lax.broadcasted_iota(i32, (8, P), 0) == 6,
                       root_area, nbrows)
    nbrows = jnp.where(jax.lax.broadcasted_iota(i32, (8, P), 0) == 7,
                       BIG, nbrows)
    nb[:, :] = nbrows

    def body(carry):
        tail, _go = carry
        segb = ri[0:1, :]
        sege = ri[1:2, :]
        slot = ri[2:3, :]
        act = ri[3:4, :] > 0
        is_head = act & (lane == segb)
        sz = sege - segb

        # ---- binning (per lane) --------------------------------------
        bins = []
        for d in range(dim):
            nmn = nb[2 * d:2 * d + 1, :]
            nmx = nb[2 * d + 1:2 * d + 2, :]
            bscale = jnp.asarray(B, f32) / (nmx - nmn)
            boff = -nmn * bscale
            posf = pd[d:d + 1, :] * bscale + boff
            posf = jnp.where(posf > 0, posf, 0.0)
            posf = jnp.where(posf < B - 1, posf, float(B - 1))
            bins.append(posf.astype(i32))

        # ---- segmented per-bin reductions ----------------------------
        cnt_rows = jnp.concatenate(
            [(act & (bins[d] == bb)).astype(f32)
             for d in range(dim) for bb in range(B)], axis=0)
        box_rows = []
        for d in range(dim):
            for bb in range(B):
                m = act & (bins[d] == bb)
                box_rows.append(jnp.where(m, pd[dim:2 * dim, :], BIG))
                box_rows.append(jnp.where(m, -pd[2 * dim:3 * dim, :],
                                          BIG))
        box_rows = jnp.concatenate(box_rows, axis=0)  # [dim*B*2*dim, P]
        cnt_t = seg_suffix(cnt_rows, sege, lambda a, b: a + b, 0.0)
        box_t = seg_suffix(box_rows, sege, jnp.minimum, BIG)
        # valid at head lanes: totals over the segment
        DB = 2 * dim

        def bmn_at(d, bb):
            return [box_t[(d * B + bb) * DB + a:(d * B + bb) * DB + a + 1,
                          :] for a in range(dim)]

        def bmx_at(d, bb):
            return [-box_t[(d * B + bb) * DB + dim + a:
                           (d * B + bb) * DB + dim + a + 1, :]
                    for a in range(dim)]

        def cnt_at(d, bb):
            return cnt_t[d * B + bb:d * B + bb + 1, :]

        # ---- SAH sweep (rows; valid at heads) ------------------------
        def leaf_cost(cnt_f, ha):
            pc = (cnt_f.astype(i32) + ((1 << log_cluster) - 1)) \
                >> log_cluster
            return ha * pc.astype(f32)

        best_cost = jnp.full((1, P), INF, f32)
        best_axis = jnp.zeros((1, P), f32)
        best_bin = jnp.ones((1, P), f32)
        for d in range(dim):
            right_cost = [None] * B
            rmn = [jnp.full((1, P), BIG, f32) for _ in range(dim)]
            rmx = [jnp.full((1, P), -BIG, f32) for _ in range(dim)]
            rcnt = jnp.zeros((1, P), f32)
            for i in range(B - 1, 0, -1):
                bmn_i = bmn_at(d, i)
                bmx_i = bmx_at(d, i)
                rmn = [jnp.minimum(rmn[a], bmn_i[a]) for a in range(dim)]
                rmx = [jnp.maximum(rmx[a], bmx_i[a]) for a in range(dim)]
                rcnt = rcnt + cnt_at(d, i)
                ha = _half_area([rmx[a] - rmn[a] for a in range(dim)],
                                dim)
                right_cost[i] = jnp.where(rcnt > 0, leaf_cost(rcnt, ha),
                                          INF)
            lmn = [jnp.full((1, P), BIG, f32) for _ in range(dim)]
            lmx = [jnp.full((1, P), -BIG, f32) for _ in range(dim)]
            lcnt = jnp.zeros((1, P), f32)
            for i in range(B - 1):
                bmn_i = bmn_at(d, i)
                bmx_i = bmx_at(d, i)
                lmn = [jnp.minimum(lmn[a], bmn_i[a]) for a in range(dim)]
                lmx = [jnp.maximum(lmx[a], bmx_i[a]) for a in range(dim)]
                lcnt = lcnt + cnt_at(d, i)
                ha = _half_area([lmx[a] - lmn[a] for a in range(dim)],
                                dim)
                cost = jnp.where(
                    lcnt > 0, leaf_cost(lcnt, ha) + right_cost[i + 1],
                    INF)
                cost = jnp.where(jnp.isnan(cost), INF, cost)
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_axis = jnp.where(better, float(d), best_axis)
                best_bin = jnp.where(better, float(i + 1), best_bin)

        # ---- per-node decisions (rows at heads) ----------------------
        node_ha = nb[6:7, :]
        pc_node = (sz + ((1 << log_cluster) - 1)) >> log_cluster
        non_split = node_ha * (pc_node.astype(f32)
                               - jnp.asarray(cost_ratio, f32))
        sah_ok = (best_cost < non_split).astype(f32)
        diag = [nb[2 * d + 1:2 * d + 2, :] - nb[2 * d:2 * d + 1, :]
                for d in range(dim)]
        largest = jnp.zeros((1, P), f32)
        dbest_l = diag[0]
        for d in range(1, dim):
            gtr = diag[d] > dbest_l
            largest = jnp.where(gtr, float(d), largest)
            dbest_l = jnp.where(gtr, diag[d], dbest_l)
        diag_best = jnp.zeros((1, P), f32)
        min_best = jnp.zeros((1, P), f32)
        for d in range(dim):
            isd = best_axis == float(d)
            diag_best = jnp.where(isd, diag[d], diag_best)
            min_best = jnp.where(isd, nb[2 * d:2 * d + 1, :], min_best)
        split_val = (diag_best / jnp.asarray(B, f32)) * best_bin \
            + min_best
        # decision rows are identical across a segment's lanes (all
        # inputs are nb rows / scan totals... totals only at heads) —
        # broadcast head values to every lane in one dot
        dec = jnp.concatenate(
            [best_axis, split_val, sah_ok, largest, best_cost], axis=0)
        dec = bcast_dot(dec, segb)
        best_axis_b = dec[0:1, :]
        split_val_b = dec[1:2, :]
        sah_ok_b = dec[2:3, :] > 0
        largest_b = dec[3:4, :]

        # ---- SAH partition predicate + fallback ----------------------
        c_axis = jnp.zeros((1, P), f32)
        v_larg = jnp.zeros((1, P), f32)
        for d in range(dim):
            c_axis = jnp.where(best_axis_b == float(d), pd[d:d + 1, :],
                               c_axis)
            v_larg = jnp.where(largest_b == float(d), pd[d:d + 1, :],
                               v_larg)
        gl_sah = (c_axis < split_val_b) & act
        # segment total of gl_sah at every lane: prefix + suffix - self
        glf = gl_sah.astype(f32)
        pre = seg_prefix_sum(glf, segb)
        suf = seg_suffix(glf, sege, lambda a, b: a + b, 0.0)
        count_left = pre + suf - glf
        szf = sz.astype(f32)
        degenerate = sah_ok_b & ((count_left == 0) | (count_left == szf))
        do_split = act & (sah_ok_b | (sz > max_leaf))
        use_fb = do_split & (~sah_ok_b | degenerate)
        any_fb = jnp.max(jnp.where(use_fb, 1, 0))

        # ---- vectorized median fallback ------------------------------
        vbits = jax.lax.bitcast_convert_type(v_larg, i32)
        vkey = jnp.where(vbits < 0,
                         jnp.asarray(-0x80000000, i32) - vbits - 1, vbits)
        half = (sz + 1) // 2

        def fb_fn():
            rngm = act & use_fb

            def sstep(_, lh):
                lo, hi = lh
                mid_k = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
                pred = (rngm & (vkey <= mid_k)).astype(f32)
                p1 = seg_prefix_sum(pred, segb)
                s1 = seg_suffix(pred, sege, lambda a, b: a + b, 0.0)
                cnt_le = (p1 + s1 - pred).astype(i32)
                take_hi = cnt_le >= half
                return (jnp.where(take_hi, lo, mid_k + 1),
                        jnp.where(take_hi, mid_k, hi))

            lo0 = jnp.full((1, P), -0x80000000, i32)
            hi0 = jnp.full((1, P), 0x7FFFFFFF, i32)
            lo, _ = jax.lax.fori_loop(0, 33, sstep, (lo0, hi0))
            ltf = (rngm & (vkey < lo)).astype(f32)
            p2 = seg_prefix_sum(ltf, segb)
            s2_ = seg_suffix(ltf, sege, lambda a, b: a + b, 0.0)
            below = p2 + s2_ - ltf
            need = half.astype(f32) - below
            tie = rngm & (vkey == lo)
            tie_rank = seg_prefix_sum(tie.astype(f32), segb) \
                - tie.astype(f32)
            gl_ = (rngm & (vkey < lo)) | (tie & (tie_rank < need))
            return gl_.astype(i32)

        gl_fb = jax.lax.cond(any_fb > 0, fb_fn,
                             lambda: jnp.zeros((1, P), i32))
        # int-space select: Mosaic cannot lower select over i8-backed
        # bool vectors (trunci i8->i1 is unsupported)
        gl_i = jnp.where(use_fb, gl_fb, gl_sah.astype(i32))
        gl = (gl_i > 0) & act
        cl = jnp.where(use_fb, half, count_left.astype(i32))
        mid = segb + cl

        # ---- stable partition (all split segments at once) -----------
        glf2 = gl.astype(f32)
        lrank = seg_prefix_sum(glf2, segb) - glf2
        rrank = (lane - segb).astype(f32) - lrank
        new_pos = jnp.where(gl, segb.astype(f32) + lrank,
                            mid.astype(f32) + rrank)
        new_pos = jnp.where(act & do_split, new_pos, -1.0)
        n_chunks = P // chunk
        for ci in range(n_chunks):
            dest = jax.lax.broadcasted_iota(i32, (chunk, P), 0) \
                + ci * chunk
            oht = (dest.astype(f32) == new_pos).astype(f32)
            out_c = jax.lax.dot_general(
                pd[0:16, :], oht, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
            s2[:, ci * chunk:(ci + 1) * chunk] = out_c
        wr = act & do_split
        pd[0:16, :] = jnp.where(wr, s2[0:16, :], pd[0:16, :])

        # ---- new segments + child bboxes -----------------------------
        left = lane < mid
        nsegb = jnp.where(wr, jnp.where(left, segb, mid), segb)
        nsege = jnp.where(wr, jnp.where(left, mid, sege), sege)
        cbox = jnp.concatenate(
            [jnp.where(wr, pd[dim:2 * dim, :], BIG),
             jnp.where(wr, -pd[2 * dim:3 * dim, :], BIG)], axis=0)
        cbox_t = seg_suffix(cbox, nsege, jnp.minimum, BIG)  # [2dim, P]
        # child bbox per lane (broadcast from the child's head)
        cb = bcast_dot(cbox_t, nsegb)
        cmn = [cb[a:a + 1, :] for a in range(dim)]
        cmx = [-cb[dim + a:dim + a + 1, :] for a in range(dim)]
        area_self = _half_area([cmx[a] - cmn[a] for a in range(dim)],
                               dim)
        sib_head = jnp.where(left, mid, segb)
        sib_box = bcast_dot(cbox_t, sib_head)
        smn = [sib_box[a:a + 1, :] for a in range(dim)]
        smx = [-sib_box[dim + a:dim + a + 1, :] for a in range(dim)]
        area_sib = _half_area([smx[a] - smn[a] for a in range(dim)], dim)
        # SATO: c0 (lower slot) = larger-area child
        area_a = jnp.where(left, area_self, area_sib)  # area of [b,mid)
        area_b = jnp.where(left, area_sib, area_self)
        swap = area_a < area_b

        # ---- slot allocation (parent-slot order) ---------------------
        head_split = (is_head & do_split).astype(f32)
        slot_mask = write_dot(head_split[0:1, :], slot, is_head & do_split)
        # rank among splitting parents by slot: exclusive cumsum
        rank_sl = slot_mask
        k = 1
        while k < NCAP:
            y = pltpu.roll(rank_sl, k, 1)
            rank_sl = rank_sl + jnp.where(nlane >= k, y, 0.0)
            k *= 2
        rank_excl = rank_sl - slot_mask  # [1, NCAP] f32
        num_split = jnp.max(rank_sl).astype(i32)
        # per-lane parent rank: gather rank_excl[slot] (lane<-slot dot,
        # tiled + full-width one-hot like bcast_dot; tile divides NCAP)
        tile = 256 if NCAP % 256 == 0 else 128
        slot_f = slot.astype(f32)
        acc = None
        for pi in range(NCAP // tile):
            s_ids = jax.lax.broadcasted_iota(
                i32, (tile, P), 0).astype(f32) + float(pi * tile)
            oht = (s_ids == slot_f).astype(f32)  # [tile, P]
            part = jax.lax.dot_general(
                rank_excl[:, pi * tile:(pi + 1) * tile], oht,
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
            acc = part if acc is None else acc + part
        prank = acc.astype(i32)  # [1, P]
        cbase = tail + 2 * prank
        in_c0 = swap ^ left  # [b,mid) = c0 unless swap (bool select
        # via where() hits Mosaic's unsupported i8->i1 trunci)
        nslot = jnp.where(in_c0, cbase, cbase + 1)
        nslot = jnp.where(wr, nslot, slot)

        # ---- node-table writes ---------------------------------------
        new_head = wr & (lane == nsegb)
        anc_child = jnp.minimum(nb[7:8, :], nb[6:7, :])
        brows = []
        for d in range(dim):
            brows.append(cmn[d])
            brows.append(cmx[d])
        while len(brows) < 6:
            brows.append(jnp.zeros((1, P), f32))
        brows.append(area_self)
        brows.append(anc_child)
        fwrite = write_dot(jnp.concatenate(brows, axis=0), nslot,
                           new_head)  # [8, NCAP]
        written = write_dot(jnp.ones((1, P), f32), nslot, new_head) > 0
        nbf_ref[:, :] = jnp.where(written, fwrite, nbf_ref[:, :])
        irows = jnp.concatenate(
            [nsegb.astype(f32), nsege.astype(f32),
             jnp.full((1, P), -1.0, f32), jnp.zeros((5, P), f32)],
            axis=0)
        iwrite = write_dot(irows, nslot, new_head)
        nbi_new = jnp.where(
            written & (nrow < 3), iwrite.astype(i32), nbi_ref[:, :])
        # parent child pointer: c0 slot at splitting parents' slots, and
        # -1 (leaf) at heads that processed this level without splitting
        # (their slot was written with child=0 "open" at init/creation)
        pval = jnp.where(do_split, cbase.astype(f32), -1.0)
        pwrite = write_dot(pval, slot, is_head)
        pmask = write_dot(jnp.ones((1, P), f32), slot, is_head) > 0
        nbi_ref[:, :] = jnp.where(pmask & (nrow == 2),
                                  pwrite.astype(i32), nbi_new)

        # ---- advance lane state --------------------------------------
        open_child = wr & ((nsege - nsegb) > min_leaf)
        ri[0:1, :] = nsegb
        ri[1:2, :] = nsege
        ri[2:3, :] = nslot
        ri[3:4, :] = open_child.astype(i32)
        nbn = nb[:, :]
        for d in range(dim):
            nbn = jnp.where(
                (jax.lax.broadcasted_iota(i32, (8, P), 0) == 2 * d)
                & wr, cmn[d], nbn)
            nbn = jnp.where(
                (jax.lax.broadcasted_iota(i32, (8, P), 0) == 2 * d + 1)
                & wr, cmx[d], nbn)
        nbn = jnp.where(
            (jax.lax.broadcasted_iota(i32, (8, P), 0) == 6) & wr,
            area_self, nbn)
        nbn = jnp.where(
            (jax.lax.broadcasted_iota(i32, (8, P), 0) == 7) & wr,
            anc_child, nbn)
        nb[:, :] = nbn

        go = jnp.max(jnp.where(open_child, 1, 0)).astype(i32)
        return ((tail + 2 * num_split).astype(i32), go)

    tail, _ = jax.lax.while_loop(
        lambda c: c[1] > 0, body,
        (jnp.asarray(1, i32),
         jnp.where(root_leaf | (size <= 0), 0, 1).astype(i32)))

    nc = jnp.where(size > 0, tail, 0)
    cnt_row = jnp.where(lane == 0, nc, 0)
    ordo_ref[:, :] = jnp.concatenate(
        [pd[3 * dim:3 * dim + 1, :].astype(i32), cnt_row,
         jnp.zeros((6, P), i32)], axis=0)


def group_forest_build(
    pf, sizes, *, dim, P, NCAP=None, min_leaf=1, max_leaf=8,
    log_cluster=0, cost_ratio=1.0, chunk=256, interpret=False,
    debug=False, variant="ls",
):
    """Run the per-group build kernel over G = pf.shape[1] // P groups.

    pf: [16, G*P] f32 packed prim rows (see module docstring).
    sizes: [G] i32 per-group primitive counts (<= P).
    variant: "ls" (level-synchronous rounds, fast) or "bfs" (one node
    per iteration, simpler reference); outputs are bit-identical.

    Returns (nbf [8, G*NCAP] f32, nbi [8, G*NCAP] i32,
             src [G*P] i32 source lanes, counts [G] i32).
    """
    assert P % 128 == 0, "P must be a multiple of 128 (one-hot tiling)"
    G = pf.shape[1] // P
    if NCAP is None:
        NCAP = 2 * P
    f32, i32 = jnp.float32, jnp.int32
    chunk = min(chunk, P)
    while P % chunk:  # the chunked one-hot loops must tile P exactly
        chunk //= 2
    scratch = [
        pltpu.VMEM((16, P), f32),
        pltpu.VMEM((16, P), f32),
    ]
    if variant == "ls":
        scratch = [
            pltpu.VMEM((16, P), f32),
            pltpu.VMEM((8, P), i32),
            pltpu.VMEM((8, P), f32),
            pltpu.VMEM((16, P), f32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((16, P), lambda g, *_: (0, g))],
        out_specs=[
            pl.BlockSpec((8, NCAP), lambda g, *_: (0, g)),
            pl.BlockSpec((8, NCAP), lambda g, *_: (0, g)),
            pl.BlockSpec((8, P), lambda g, *_: (0, g)),
        ],
        scratch_shapes=scratch,
    )
    if variant == "ls":
        kernel = partial(
            _group_build_kernel_ls, dim=dim, P=P, NCAP=NCAP,
            min_leaf=min_leaf, max_leaf=max_leaf,
            log_cluster=log_cluster, cost_ratio=cost_ratio, chunk=chunk)
    else:
        kernel = partial(
            _group_build_kernel, dim=dim, P=P, NCAP=NCAP,
            min_leaf=min_leaf, max_leaf=max_leaf,
            log_cluster=log_cluster, cost_ratio=cost_ratio,
            chunk=chunk, debug=debug)
    nbf, nbi, ordo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, G * NCAP), f32),
            jax.ShapeDtypeStruct((8, G * NCAP), i32),
            jax.ShapeDtypeStruct((8, G * P), i32),
        ],
        # the ls variant holds ~[dim*B*2*dim, P] scan rows + one-hot
        # tiles live at once; the 16M default scoped-vmem cap is too
        # small at P>=1024
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sizes.astype(i32), pf)
    cnt = ordo[1].reshape(G, P)[:, 0]
    return nbf, nbi, ordo[0], cnt
