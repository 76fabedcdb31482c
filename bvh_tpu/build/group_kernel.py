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
  order       [8, P]    i32 row 0: source lane of each final position
  cnt         [8, 1]    i32 row 0 node count, row 1 overflow flag
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
    size_ref, pf_ref, nbf_ref, nbi_ref, ordo_ref, cnt_ref, pd, s2,
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
    root_frow = jnp.zeros((8, 1), f32)
    for d in range(dim):
        root_frow = root_frow.at[2 * d, 0].set(mnsel[d])
        root_frow = root_frow.at[2 * d + 1, 0].set(mxsel[d])
    root_frow = root_frow.at[6, 0].set(root_area)
    root_frow = root_frow.at[7, 0].set(BIG)
    nbf_ref[:, :] = jnp.where(nlane == 0, root_frow, nbf_ref[:, :])
    root_leaf = size <= min_leaf  # reference: frontier.init_forest:139
    root_irow = jnp.zeros((8, 1), i32)
    root_irow = root_irow.at[1, 0].set(size)
    root_irow = root_irow.at[2, 0].set(jnp.where(root_leaf, -1, 0))
    nbi_ref[:, :] = jnp.where(nlane == 0, root_irow, nbi_ref[:, :])
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
            return (vkey < lo) | (tie & (tie_rank < need.astype(f32)))

        gl = jax.lax.cond(use_fb, fb_fn, lambda: gl_sah) & rng
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
        c0row = jnp.zeros((8, 1), f32)
        c1row = jnp.zeros((8, 1), f32)
        for d in range(dim):
            c0row = c0row.at[2 * d, 0].set(
                jnp.where(swap, bmn_[d], amn[d]))
            c0row = c0row.at[2 * d + 1, 0].set(
                jnp.where(swap, bmx_[d], amx[d]))
            c1row = c1row.at[2 * d, 0].set(
                jnp.where(swap, amn[d], bmn_[d]))
            c1row = c1row.at[2 * d + 1, 0].set(
                jnp.where(swap, amx[d], bmx_[d]))
        c0row = c0row.at[6, 0].set(jnp.where(swap, area_b, area_a))
        c1row = c1row.at[6, 0].set(jnp.where(swap, area_a, area_b))
        c0row = c0row.at[7, 0].set(anc_child)
        c1row = c1row.at[7, 0].set(anc_child)
        c0b = jnp.where(swap, mid, b)
        c0e = jnp.where(swap, e, mid)
        c1b = jnp.where(swap, b, mid)
        c1e = jnp.where(swap, mid, e)
        c0_open = (c0e - c0b) > min_leaf
        c1_open = (c1e - c1b) > min_leaf

        is_c0 = nlane == tail
        is_c1 = nlane == tail + 1
        nbf_new = jnp.where(is_c0, c0row,
                            jnp.where(is_c1, c1row, nbf_ref[:, :]))
        nbf_ref[:, :] = jnp.where(do_split, nbf_new, nbf_ref[:, :])
        c0i = jnp.zeros((8, 1), i32).at[0, 0].set(c0b).at[1, 0].set(c0e) \
            .at[2, 0].set(-1)
        c1i = jnp.zeros((8, 1), i32).at[0, 0].set(c1b).at[1, 0].set(c1e) \
            .at[2, 0].set(-1)
        meta = nbi_ref[0:3, :]
        meta = jnp.where(is_c0, c0i[0:3], jnp.where(is_c1, c1i[0:3], meta))
        # parent becomes inner (child slot) or closes as a leaf
        parent_child = jnp.where(do_split, tail, -1)
        meta = jnp.where(
            (nlane == q)
            & (jax.lax.broadcasted_iota(i32, (3, NCAP), 0) == 2),
            parent_child, meta)
        nbi_ref[0:3, :] = jnp.where(do_split | (nlane == q), meta,
                                    nbi_ref[0:3, :])

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

    cnt_out = jnp.zeros((8, 1), i32)
    cnt_out = cnt_out.at[0, 0].set(jnp.where(size > 0, tail, 0))
    cnt_ref[:, :] = cnt_out
    ordo_ref[:, :] = jnp.concatenate(
        [pd[3 * dim:3 * dim + 1, :].astype(i32),
         jnp.zeros((7, P), i32)], axis=0)


def group_forest_build(
    pf, sizes, *, dim, P, NCAP=None, min_leaf=1, max_leaf=8,
    log_cluster=0, cost_ratio=1.0, chunk=256, interpret=False,
    debug=False,
):
    """Run the per-group build kernel over G = pf.shape[1] // P groups.

    pf: [16, G*P] f32 packed prim rows (see module docstring).
    sizes: [G] i32 per-group primitive counts (<= P).

    Returns (nbf [8, G*NCAP] f32, nbi [8, G*NCAP] i32,
             src [G*P] i32 source lanes, counts [G] i32).
    """
    G = pf.shape[1] // P
    if NCAP is None:
        NCAP = 2 * P
    f32, i32 = jnp.float32, jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((16, P), lambda g, *_: (0, g))],
        out_specs=[
            pl.BlockSpec((8, NCAP), lambda g, *_: (0, g)),
            pl.BlockSpec((8, NCAP), lambda g, *_: (0, g)),
            pl.BlockSpec((8, P), lambda g, *_: (0, g)),
            pl.BlockSpec((8, 1), lambda g, *_: (0, g)),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, P), f32),
            pltpu.VMEM((16, P), f32),
        ],
    )
    kernel = partial(
        _group_build_kernel, dim=dim, P=P, NCAP=NCAP, min_leaf=min_leaf,
        max_leaf=max_leaf, log_cluster=log_cluster, cost_ratio=cost_ratio,
        chunk=min(chunk, P), debug=debug)
    nbf, nbi, ordo, cnt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, G * NCAP), f32),
            jax.ShapeDtypeStruct((8, G * NCAP), i32),
            jax.ShapeDtypeStruct((8, G * P), i32),
            jax.ShapeDtypeStruct((8, G), i32),
        ],
        interpret=interpret,
    )(sizes.astype(i32), pf)
    return nbf, nbi, ordo[0], cnt[0]
