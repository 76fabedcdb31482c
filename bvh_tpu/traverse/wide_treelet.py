"""Wide (8-ary) treelet traversal — the large-scene fast path.

Round-2 redesign of the two-phase treelet scheme (treelet.py), built
around two hardware facts measured on this TPU (tools/probe_tpu.py):

- a synced host<->device roundtrip costs ~35 ms (tunnel latency), so
  the WHOLE render — phase A, portal sort, and every phase-B round —
  runs inside ONE jitted call (`lax.while_loop` over rounds, with the
  Pallas kernels inside the loop body);
- the marginal cost of a kernel while-iteration is ~1-3 us and scales
  with (table columns x block width), so nodes are 8-wide with 4-prim
  quad leaves: ~3x fewer iterations per treelet visit than the binary
  kernel, amortizing the one-hot fetch over 8 slab tests / 4 triangle
  tests.

Scheme (semantics match Bvh::intersect, reference: bvh.h:124-182):

- Preprocessing (`build_wide_treelets`, vectorized numpy — no
  per-node Python loops, San-Miguel-scale friendly): the binary tree
  is cut at subtrees of <= max_prims primitives (treelets); the top
  region becomes a binary pair table for the phase-A collect kernel;
  each treelet is collapsed into 8-wide nodes (greedy largest-area
  expansion, as `widen()` does) with leaves packed into quad columns
  of 4 triangles, all in ONE combined [64, P] table per treelet.
- Phase A: the existing collect kernel (treelet.py) records every
  portal (treelet entry distance) per ray.
- Phase B: rounds inside `lax.while_loop`. Round k processes portal k
  of every ray (portals are pre-sorted ascending by entry distance, so
  a ray whose portal k lies beyond its current tmax is finished —
  entry distances only grow and tmax only shrinks). Rays sort by the
  round's treelet id; fixed-size blocks then each stream exactly one
  treelet table (PrefetchScalarGridSpec), traverse it 8-wide, and
  results merge back by a payload sort.

Closest-hit results are exact (same slab/Moller-Trumbore arithmetic
and tmax-shrink semantics as the binary kernels); among exactly-tied
primitives the winner may differ (the 8-way sorting network is not
stable), matching the documented one-tie tolerance of the test suite.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import Bvh
from bvh_tpu.traverse.wavefront import Hit, TraversalStats

WIDTH = 8
QUAD = 4  # prims per leaf column
ROWS = 64  # combined table rows: 8*6 bounds + 8 words | 4*13 tri rows
# kernel-table rows (pack_kernel_table): the fused bf16 layout the
# traversal kernel actually fetches — node columns use rows 0-71
# (48 conservatively-rounded bounds + 8 words x 3 bytes), quad columns
# all 156 (4 quads x (12 tri values x 3 exact bf16 splits + 3 gpos
# bytes)). The normal is FETCHED, not recomputed: the table's
# precomputed n = cross(e1, e2) (tri.h:29-45) carries the host/XLA
# FMA-contraction rounding, while Mosaic lowers mul-sub with separate
# rounding — recomputing flipped ~3 ppm of boundary hits vs the C++
# oracle (measured; Pallas matched separate-round 8192/8192 in a
# direct probe while 35% of cross components differ by 1 ulp).
KROWS = 156
# state-machine steps per while-loop iteration in the wide kernel
_UNROLL = 2
# minimum table width (columns) at which the drivers switch from the
# raw 64-row f32 table + 3x-split fetch to the packed single-pass
# table: at P=384 (sponza) the raw path wins (honest r5 re-measure:
# 118.9 vs 132.6 ms/render — the packed layout's per-iteration
# reconstruction ops cost more than the two saved dots at narrow P);
# at P=1280 (San-Miguel) the fetch dominates and the packed table
# wins. Overridable per call via `packed_table`.
PACK_MIN_P = 512


class WideTreelets(NamedTuple):
    """Preprocessed two-level wide scene.

    top_node_t: [16, Pt]     binary pair table of the top region
                             (phase-A collect kernel format); top
                             leaves are portal words (tid << 4 | 1),
                             where tid < T names a treelet and
                             tid >= T names super-treelet tid - T
                             (San-Miguel-scale scenes).
    top_root:   int          top root word (static).
    table:      [T, 64, P]   per-treelet combined tables: columns
                             [0, Wn) are wide nodes (rows 0-47 child
                             bounds, 48-55 child words-as-f32), columns
                             [Wn, Wn+Q) are quad leaves (rows
                             q*13..q*13+11 triangle, q*13+12 GLOBAL
                             prim position, -1 padding).
    n_prims:    int          total primitive positions (static).
    n_wide:     np.ndarray    [T] wide-node column count per treelet
                             (host metadata; quad columns start there).
    sup_table:  [S, 16, Ps]  per-super mid-region pair tables (phase-A2
                             collect format, same 14-row layout as
                             top_node_t; leaf words are GLOBAL treelet
                             portals); [0, 16, 128] when the scene has
                             no super level.
    sup_depth:  int          max pair-tree depth inside any super
                             (A2 stack sizing).
    """

    top_node_t: jnp.ndarray
    top_root: int
    table: jnp.ndarray
    n_prims: int
    n_wide: np.ndarray
    top_depth: int
    wide_depth: int
    sup_table: jnp.ndarray
    sup_depth: int


def _round_up(x, m):
    return -(-x // m) * m


def _cumcount_by(keys: np.ndarray) -> np.ndarray:
    """Rank of each element among equal keys, preserving order."""
    if len(keys) == 0:
        return np.zeros(0, np.int64)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    starts = np.r_[0, np.nonzero(sk[1:] != sk[:-1])[0] + 1]
    group_start = np.repeat(starts, np.diff(np.r_[starts, len(sk)]))
    ranks = np.arange(len(sk)) - group_start
    out = np.empty(len(keys), np.int64)
    out[order] = ranks
    return out


def _half_area_rows(rows: np.ndarray) -> np.ndarray:
    """SAH half-area of interleaved bounds rows [k, 6]."""
    d = rows[:, 1::2] - rows[:, 0::2]
    return (d[:, 0] + d[:, 1]) * d[:, 2] + d[:, 0] * d[:, 1]


def _collapse_wide(bounds, first, count, roots, tids, terminal):
    """Collapse binary subtrees into 8-wide nodes, vectorized over all
    subtrees at once (level-synchronous; Python loops only over tree
    levels and the 7 expansion steps).

    roots:    [F0] binary node ids of the wide roots to start from.
    tids:     [F0] group id per root (wide nodes inherit it).
    terminal: bool[nc], slots where expansion stops: binary leaves and
              small subtrees that become quad leaves (leaf collapsing —
              SAH builders emit ~1.4-prim leaves, so packing whole
              small subtrees into quads keeps quad columns dense).

    Returns (wide_tid, wide_local, slot_node [W, 8], child_local [W, 8],
    n_wide_per_group), where slot_node holds binary node ids (-1 =
    empty slot) and child_local gives the wide-local id of slots that
    became child wide nodes (-1 for terminal/empty slots).
    """
    nc = len(first)
    areas_all = _half_area_rows(bounds)

    all_tid: list[np.ndarray] = []
    all_local: list[np.ndarray] = []
    all_slots: list[np.ndarray] = []
    all_child_local: list[np.ndarray] = []
    n_wide = np.zeros(int(tids.max()) + 1 if len(tids) else 1, np.int64)

    froot = np.asarray(roots, np.int64)
    ftid = np.asarray(tids, np.int64)
    flocal = _cumcount_by(ftid)  # roots are the first wide nodes per group
    n_wide_acc = np.bincount(ftid, minlength=len(n_wide)).astype(np.int64)

    n_levels = 0
    while len(froot):
        n_levels += 1
        F = len(froot)
        slots = np.full((F, WIDTH), -1, np.int64)
        slots[:, 0] = froot
        nslot = np.ones(F, np.int64)
        for _ in range(WIDTH - 1):
            valid = slots >= 0
            sl = np.clip(slots, 0, nc - 1)
            expandable = valid & ~terminal[sl]
            a = np.where(expandable, areas_all[sl], -np.inf)
            pick = np.argmax(a, axis=1)
            can = (a[np.arange(F), pick] > -np.inf) & (nslot < WIDTH)
            rows_i = np.nonzero(can)[0]
            if len(rows_i) == 0:
                break
            pk = pick[rows_i]
            b = slots[rows_i, pk]
            slots[rows_i, pk] = first[b]
            slots[rows_i, nslot[rows_i]] = first[b] + 1
            nslot[rows_i] += 1

        # classify slots: non-terminal slots become child wide nodes.
        valid = slots >= 0
        sl = np.clip(slots, 0, nc - 1)
        is_child = valid & ~terminal[sl]

        # next frontier in row-major order; assign local ids per group.
        rows_i, cols_i = np.nonzero(is_child)
        kids = slots[rows_i, cols_i]
        ktid = ftid[rows_i]
        klocal = n_wide_acc[ktid] + _cumcount_by(ktid)
        n_wide_acc += np.bincount(ktid, minlength=len(n_wide)).astype(np.int64)

        child_local = np.full((F, WIDTH), -1, np.int64)
        child_local[rows_i, cols_i] = klocal

        all_tid.append(ftid)
        all_local.append(flocal)
        all_slots.append(slots)
        all_child_local.append(child_local)

        froot, ftid, flocal = kids, ktid, klocal

    if all_tid:
        wide_tid = np.concatenate(all_tid)
        wide_local = np.concatenate(all_local)
        slot_node = np.concatenate(all_slots, axis=0)
        child_local = np.concatenate(all_child_local, axis=0)
    else:
        wide_tid = np.zeros(0, np.int64)
        wide_local = np.zeros(0, np.int64)
        slot_node = np.zeros((0, WIDTH), np.int64)
        child_local = np.zeros((0, WIDTH), np.int64)
    return wide_tid, wide_local, slot_node, child_local, n_wide_acc, n_levels


def wide_treelet_max_prims(n_prims: int) -> int:
    """Scale-derived default treelet size (max_prims) for a scene of
    `n_prims` primitives. One source of truth for the pre-build scale
    heuristic: at San-Miguel scale the round-4 hardware A/B showed the
    wider P=1280 fetch (max_prims=4096, T~3456) beats more rounds over
    narrow tables (max_prims=1024, T~13363); at sponza scale P=384
    measured best. The 2M threshold is the prim count at which
    max_prims=4096 still yields T >= 2048 (the wide_treelet_perf
    large-scale tier) — keep the two coupled: a scene above this
    threshold lands in perf's T >= 2048 branch with the size this
    function picks."""
    return 4096 if n_prims >= 2_000_000 else 1024


def build_wide_treelets(bvh: Bvh, tri_flat, permuted: bool = False,
                        max_prims: int | None = None,
                        leaf_prims: int = 16,
                        super_prims: int | None = None) -> WideTreelets:
    """Cut `bvh` into treelets of <= max_prims primitives and pack the
    wide kernel tables. Host-side vectorized numpy, one-time per BVH
    (the TPU analogue of the reference's PrecomputedTri step).

    `leaf_prims`: subtrees with at most this many primitives collapse
    into dense quad leaves (must be <= 60 so the quad count fits the
    4-bit count field of the packed word, index.h:74-78).

    `super_prims`: San-Miguel-scale scenes additionally cut the top
    region at subtrees of <= super_prims primitives (supers). Phase A
    then traverses only the small super-top table, recording
    super-portals (tid >= T), and phase-A2 rounds stream each super's
    mid-region pair table per kernel block — keeping both the resident
    phase-A table and the per-block treelet tables at sponza-class
    sizes regardless of scene size. None = auto (enabled when the top
    region exceeds 4096 nodes).

    `max_prims`: None = scale-derived (wide_treelet_max_prims)."""
    if max_prims is None:
        max_prims = wide_treelet_max_prims(int(tri_flat.shape[0]))
    assert 1 <= leaf_prims <= 60
    import os as _os
    import time as _time
    _dbg = _os.environ.get("BVH_TPU_PP_DEBUG")
    _t = [_time.perf_counter()]

    def _mark(name):
        if _dbg:
            now = _time.perf_counter()
            print(f"# pp {name}: {now - _t[0]:.2f} s", flush=True)
            _t[0] = now

    nc = int(bvh.node_count)
    dim = bvh.dim
    assert dim == 3, "wide treelet path is specialized for 3D"
    bounds = np.asarray(bvh.bounds[:nc], np.float32)
    index = np.asarray(bvh.index[:nc]).astype(np.uint64)
    first = (index >> 4).astype(np.int64)
    count = (index & 15).astype(np.int64)
    prim_ids = np.asarray(bvh.prim_ids).astype(np.int64)
    tri_np = np.asarray(tri_flat, np.float32)
    inner = count == 0

    # ---- subtree prim counts via level-synchronous BFS ---------------
    levels = [np.asarray([0], np.int64)]
    frontier = levels[0]
    while True:
        fi = frontier[inner[frontier]]
        if len(fi) == 0:
            break
        kids = np.concatenate([first[fi], first[fi] + 1])
        levels.append(kids)
        frontier = kids

    nprims = np.where(inner, 0, count)
    for lev in reversed(levels):
        li = lev[inner[lev]]
        if len(li):
            nprims[li] = nprims[first[li]] + nprims[first[li] + 1]

    _mark("subtree-counts")
    # ---- treelet roots + top region ----------------------------------
    parent = np.full(nc, -1, np.int64)
    ii = np.nonzero(inner)[0]
    parent[first[ii]] = ii
    parent[first[ii] + 1] = ii
    is_top = nprims > max_prims  # the top region (always inner nodes)
    troot = (~is_top) & ((parent < 0) | is_top[np.clip(parent, 0, nc - 1)])
    troot[0] = not is_top[0]
    troots = np.nonzero(troot)[0]
    T = len(troots)
    tid_of_root = np.full(nc, -1, np.int64)
    tid_of_root[troots] = np.arange(T)

    _mark("roots")
    # ---- collapse every treelet into wide nodes ----------------------
    # Leaf collapsing: a slot whose subtree holds <= leaf_prims prims
    # terminates and becomes a dense run of quad columns (SAH builders
    # emit ~1.4-prim leaves; packing whole subtrees keeps quads full).
    terminal = (~inner) | (nprims <= leaf_prims)
    wide_tid, wide_local, slot_node, child_local, n_wide, wide_depth = (
        _collapse_wide(bounds, first, count, troots, np.arange(T), terminal)
    )
    W = len(wide_tid)

    _mark("collapse")
    # ---- quad leaf assignment (global, vectorized) --------------------
    valid = slot_node >= 0
    sl = np.clip(slot_node, 0, nc - 1)
    is_leaf_slot = valid & terminal[sl]
    lr, lc = np.nonzero(is_leaf_slot)
    leaf_node = slot_node[lr, lc]
    # quad columns are assigned per treelet in (wide local id, slot) order
    order = np.lexsort((lc, wide_local[lr], wide_tid[lr]))
    lr, lc = lr[order], lc[order]
    leaf_node = leaf_node[order]
    leaf_tid = wide_tid[lr]
    leaf_np = nprims[leaf_node]
    leaf_nq = -(-leaf_np // QUAD)
    # exclusive cumsum of nq within each treelet
    cs = np.cumsum(leaf_nq) - leaf_nq
    if len(leaf_tid):
        starts = np.r_[0, np.nonzero(leaf_tid[1:] != leaf_tid[:-1])[0] + 1]
        base_of_group = cs[starts]
        leaf_qoff = cs - np.repeat(
            base_of_group, np.diff(np.r_[starts, len(leaf_tid)]))
    else:
        leaf_qoff = cs
    n_quads = np.bincount(leaf_tid, weights=leaf_nq, minlength=T).astype(np.int64)

    # collect every leaf slot's subtree prim positions in left-to-right
    # (in-order) sequence: assign each slot a contiguous output range,
    # propagate offsets down level-by-level, then leaves write ranges.
    out_base = np.cumsum(leaf_np) - leaf_np
    total_out = int(leaf_np.sum())
    offset = np.full(nc, -1, np.int64)
    offset[leaf_node] = out_base  # leaf slots are disjoint subtrees
    frontier = leaf_node[inner[leaf_node]]
    while len(frontier):
        l = first[frontier]
        r = l + 1
        offset[l] = offset[frontier]
        offset[r] = offset[frontier] + nprims[l]
        nxt = np.concatenate([l, r])
        frontier = nxt[inner[nxt]]
    ln = np.nonzero((offset >= 0) & ~inner)[0]
    c = count[ln]
    tot = int(c.sum())
    within = np.arange(tot) - np.repeat(np.cumsum(c) - c, c)
    out = np.empty(total_out, np.int64)
    out[np.repeat(offset[ln], c) + within] = np.repeat(first[ln], c) + within
    assert tot == total_out

    _mark("quad-assign")
    P = int(_round_up(max(1, int((n_wide[:T] + n_quads).max())), 128))

    # ---- pack per-treelet combined tables -----------------------------
    table = np.zeros((max(T, 1), ROWS, P), np.float32)
    big = np.float32(np.finfo(np.float32).max)
    # empty child slots: empty box (never hit), word 0
    # node columns: bounds rows 0-47
    col_of_wide = wide_local  # node columns come first
    vr, vc = np.nonzero(valid)
    vslot = slot_node[vr, vc]
    trow = wide_tid[vr]
    ccol = col_of_wide[vr]
    b6 = bounds[vslot]  # [k, 6]
    # one fused fancy write for all 6 bounds rows (the per-row loop was
    # a San-Miguel-scale hot spot: 6 scattered passes over ~W*8 slots)
    d6 = np.arange(6)
    table[trow[:, None], vc[:, None] * 6 + d6[None, :],
          ccol[:, None]] = b6
    # default empty boxes for invalid slots
    er, ec = np.nonzero(~valid)
    if len(er):
        etrow = wide_tid[er]
        ecol = col_of_wide[er]
        empty6 = np.tile(np.asarray([big, -big, big, -big, big, -big],
                                    np.float32), (len(er), 1))
        table[etrow[:, None], ec[:, None] * 6 + d6[None, :],
              ecol[:, None]] = empty6

    # slot words: inner child -> (child column << 4); leaf -> quad word
    words = np.zeros((W, WIDTH), np.int64)
    icr, icc = np.nonzero(child_local >= 0)
    words[icr, icc] = child_local[icr, icc] << 4
    quad_col_base = n_wide[np.clip(leaf_tid, 0, T - 1)] if T else leaf_tid
    assert leaf_nq.max(initial=0) <= 15
    leaf_word = ((quad_col_base + leaf_qoff) << 4) | leaf_nq
    words[lr, lc] = leaf_word
    wr = np.repeat(np.arange(W), WIDTH).reshape(W, WIDTH)
    table[wide_tid[wr.ravel()], 48 + np.tile(np.arange(WIDTH), W),
          col_of_wide[wr.ravel()]] = words.ravel().astype(np.float32)

    # quad columns: gpos rows default to -1 (padding prims never hit,
    # and the kernel guards on gpos >= 0), then real quads overwrite.
    col_idx = np.arange(P)[None, :]
    in_quad_region = col_idx >= n_wide[:T, None]  # [T, P]
    gpos_rows = table[:, 12:13 * QUAD:13, :]  # view of rows 12,25,38,51
    gpos_rows[...] = np.where(in_quad_region[:, None, :], -1.0, gpos_rows)
    if len(leaf_tid):
        qrep = np.repeat(np.arange(len(leaf_tid)), leaf_nq)
        qk = _cumcount_by(qrep)  # quad index within its leaf
        qtid = leaf_tid[qrep]
        qcol = n_wide[qtid] + leaf_qoff[qrep] + qk
        # 4 prim positions per quad, read from the collected sequence
        oidx = (out_base[qrep][:, None] + qk[:, None] * QUAD
                + np.arange(QUAD)[None, :])
        pvalid = oidx < (out_base[qrep] + leaf_np[qrep])[:, None]
        ppos = out[np.clip(oidx, 0, total_out - 1)]
        ppos_c = np.clip(ppos, 0, len(prim_ids) - 1)
        tri_idx = ppos_c if permuted else prim_ids[ppos_c]
        # route invalid slots to a zero sentinel row INSIDE the gather
        # (a [q, 4, 12] np.where over the gathered buffer cost ~4.5 s
        # at San-Miguel scale; the sentinel is free)
        tri_pad = np.concatenate(
            [tri_np, np.zeros((1, tri_np.shape[1]), np.float32)])
        tri_idx = np.where(pvalid, np.clip(tri_idx, 0, len(tri_np) - 1),
                           len(tri_np))
        geo = tri_pad[tri_idx]                                 # [q, 4, 12]
        gpos = np.where(pvalid, ppos, -1).astype(np.float32)
        # Write the quad region with ONE strided slice per treelet:
        # quad columns are contiguous ([n_wide[t], n_wide[t]+nq[t]))
        # and qtid is sorted, so each treelet's quads form a slice of
        # `geo`/`gpos`. The previous single fancy-index write computed
        # q x 52 int64 flat indices (~1 GB of index math at 10M,
        # the dominant pack-tables cost: 23 s -> ~4 s).
        rows_g = (np.arange(QUAD)[:, None] * 13
                  + np.arange(12)[None, :]).ravel()            # [48]
        rows_p = np.arange(QUAD) * 13 + 12                     # [4]
        geo_f = geo.reshape(-1, 48)
        tstart = np.r_[0, np.cumsum(np.bincount(
            qtid, minlength=T).astype(np.int64))]
        for t in range(T):
            a, b = tstart[t], tstart[t + 1]
            if a == b:
                continue
            c0 = int(n_wide[t])
            table[t, rows_g, c0:c0 + (b - a)] = geo_f[a:b].T
            table[t, rows_p, c0:c0 + (b - a)] = gpos[a:b].T

    _mark("pack-tables")
    # ---- super level (San-Miguel scale): cut the top region ----------
    top_all = np.nonzero(is_top)[0]
    if super_prims is None and len(top_all) > 4096:
        super_prims = int(max_prims
                          * max(8, round(np.sqrt(len(top_all)))))
    use_super = (super_prims is not None and super_prims > max_prims
                 and bool((nprims > super_prims).any()))
    sup_table = np.zeros((0, 16, 128), np.float32)
    sup_depth = 1
    sid_node = np.full(nc, -1, np.int64)
    if use_super:
        is_stop = is_top & (nprims > super_prims)
        is_mid = is_top & ~is_stop
        sroot = is_mid & ((parent < 0) | is_stop[np.clip(parent, 0, nc - 1)])
        sroots = np.nonzero(sroot)[0]
        S = len(sroots)
        sid_node[sroots] = np.arange(S)
        order_nodes = [sroots]
        frontier = sroots
        sup_depth = 1
        while True:
            kids = np.concatenate([first[frontier], first[frontier] + 1])
            par_sid = np.tile(sid_node[frontier], 2)
            keep = is_mid[kids]
            kids, par_sid = kids[keep], par_sid[keep]
            if len(kids) == 0:
                break
            sid_node[kids] = par_sid
            order_nodes.append(kids)
            frontier = kids
            sup_depth += 1
        mid_seq = np.concatenate(order_nodes)
        mid_sid = sid_node[mid_seq]
        local = _cumcount_by(mid_sid)  # stable: BFS order, roots first
        local_of = np.full(nc, -1, np.int64)
        local_of[mid_seq] = local
        Ps = int(_round_up(int(np.bincount(mid_sid).max()), 128))

        def word_sup(nids):
            return np.where(
                tid_of_root[nids] >= 0,
                (tid_of_root[nids] << 4) | 1,
                (2 * local_of[nids] + 1) << 4,
            ).astype(np.float32)

        l = first[mid_seq]
        sup_rows = np.zeros((len(mid_seq), 14), np.float32)
        sup_rows[:, 0:6] = bounds[l]
        sup_rows[:, 6:12] = bounds[l + 1]
        sup_rows[:, 12] = word_sup(l)
        sup_rows[:, 13] = word_sup(l + 1)
        sup_table = np.zeros((S, 16, Ps), np.float32)
        sup_table[mid_sid[:, None], np.arange(14)[None, :],
                  local[:, None]] = sup_rows
        top_nodes = np.nonzero(is_stop)[0]
    else:
        top_nodes = top_all

    _mark("super")
    # ---- top-region binary pair table (phase-A collect format) -------
    if len(top_nodes) == 0:
        top_rows = np.zeros((1, 14), np.float32)
        top_rows[0, 0:6] = bounds[0]
        top_rows[0, 6:12:2] = big
        top_rows[0, 7:12:2] = -big
        top_rows[0, 12] = float(1)  # (0 << 4) | 1: portal to treelet 0
        top_rows[0, 13] = float(1)
        top_root = 1 << 4
        Pt = 128
        top_node_t = np.zeros((16, Pt), np.float32)
        top_node_t[:14, :1] = top_rows.T
    else:
        top_pair = np.full(nc, -1, np.int64)
        top_pair[top_nodes] = np.arange(len(top_nodes))

        def top_word(nids):
            # treelet portal | super portal (T + sid) | inner pair
            w = np.where(
                tid_of_root[nids] >= 0,
                (tid_of_root[nids] << 4) | 1,
                np.where(
                    top_pair[nids] >= 0,
                    (2 * top_pair[nids] + 1) << 4,
                    ((T + sid_node[nids]) << 4) | 1,
                ),
            )
            return w.astype(np.float32)

        l = first[top_nodes]
        top_rows = np.zeros((len(top_nodes), 14), np.float32)
        top_rows[:, 0:6] = bounds[l]
        top_rows[:, 6:12] = bounds[l + 1]
        top_rows[:, 12] = top_word(l)
        top_rows[:, 13] = top_word(l + 1)
        top_root = int(top_word(np.asarray([0]))[0])
        Pt = int(_round_up(len(top_nodes), 128))
        top_node_t = np.zeros((16, Pt), np.float32)
        top_node_t[:14, : len(top_nodes)] = top_rows.T

    # exact top-region depth (the phase-A stack bound): deepest BFS
    # level that still contains a pair-table node, +1 root margin
    in_region = np.zeros(nc, bool)
    in_region[top_nodes] = True
    top_depth = 1
    for li, lev in enumerate(levels):
        if in_region[lev].any():
            top_depth = li + 2

    _mark("top-table")
    return WideTreelets(
        top_node_t=jnp.asarray(top_node_t),
        top_root=top_root,
        table=jnp.asarray(table),
        n_prims=len(prim_ids),
        n_wide=np.asarray(n_wide[:T], np.int64),
        top_depth=top_depth,
        wide_depth=max(1, int(wide_depth)),
        sup_table=jnp.asarray(sup_table),
        sup_depth=int(sup_depth) + 1,
    )


# ------------------------------------------------------------- kernel
def _bf16_round_dir(x, up):
    """Round f32 `x` to bf16 toward +inf (`up`) or -inf (directed
    rounding; exactly-representable values pass through). Used for
    conservative node bounds: lo bounds round down, hi bounds round
    up, so every box only widens — a widened box can admit extra
    traversal but never lose a true hit (slab-test semantics,
    node.h:68-88).

    Implemented entirely in integer bit arithmetic: the obvious
    `convert(bf16(x)) > x` probe is simplified away by XLA:TPU (the
    round-trip compare folds to an always-equal bf16 compare), which
    silently degraded this to round-to-nearest and SHRANK half the
    boxes (measured: 16629/2^20 lost sponza hits). Truncating the low
    16 mantissa bits rounds toward zero; adding 1 when any were lost
    steps the magnitude outward. FLT_MAX sentinels may round to
    +-2^127 or +-inf — after the fetch's doubling both behave as the
    exact empty-slot sentinel (t0 = +inf / t1 = -inf in the slab
    test)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    inexact = (u & jnp.uint32(0xFFFF)) != 0
    if up:
        step = inexact & (u < jnp.uint32(0x80000000))   # positive
    else:
        step = inexact & (u >= jnp.uint32(0x80000000))  # negative
    b16 = ((u >> 16) + jnp.where(step, 1, 0).astype(jnp.uint32))
    return jax.lax.bitcast_convert_type(
        b16.astype(jnp.uint16), jnp.bfloat16)


def _bf16_rne_bits(x):
    """Round f32 `x` to bf16 with round-to-nearest-even, computed in
    integer bit arithmetic, returning (bf16 value, exact f32 of that
    value). The float identity x.astype(bf16).astype(f32) CANNOT be
    used for the exact-split residuals here: under XLA:TPU the
    `x - convert(convert(x, bf16), f32)` pattern is algebraically
    simplified and the residual collapses to zero, silently truncating
    the packed triangle data to bf16 precision (measured: ~26K/2^20
    sponza hits flipped to neighboring prims). Bit arithmetic leaves
    nothing to fold."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    half = jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    b16 = ((u + half) >> 16).astype(jnp.uint16)
    bval = jax.lax.bitcast_convert_type(b16, jnp.bfloat16)
    bf32 = jax.lax.bitcast_convert_type(
        b16.astype(jnp.uint32) << 16, jnp.float32)
    return bval, bf32


def _split3_bits(x):
    """Exact 3-way bf16 split of f32 `x` (x == hi + mid + lo in f32),
    via the integer RNE rounding above (see _bf16_rne_bits for why the
    float-op form is unsafe outside Mosaic)."""
    hi, hif = _bf16_rne_bits(x)
    r = x - hif
    mid, midf = _bf16_rne_bits(r)
    lo, _ = _bf16_rne_bits(r - midf)
    return hi, mid, lo


def pack_kernel_table(table, n_wide):
    """Pack the f32 combined table [T, 64, P] into the fused bf16
    kernel table [T, KROWS, P] the traversal kernel fetches with ONE
    bf16 MXU pass per iteration (make_onehot_fetch_packed) instead of
    three (the 3x-bf16 split fetch) — the fetch is the dominant
    per-iteration cost at San-Miguel-scale table widths (BENCHMARKS_r4
    sweeps).

    All values are HALF-scaled (so FLT_MAX empty-box sentinels stay
    finite in bf16, as split_bf16x3 documents); the kernel's fetch
    doubles its output, which is exact.

    Node columns (col < n_wide[t]):
      rows 0-47:  bounds, conservatively rounded (lo down, hi up) —
                  boxes only widen, results stay exact (leaf tests are
                  bit-exact); only the tie winner among exactly-equal
                  hits can shift, within the documented one-tie budget.
      rows 48-71: packed child words split into 3 exact byte rows
                  (b0 rows 48-55, b1 56-63, b2 64-71; every value
                  <= 255 and byte/2 is bf16-exact).
    Quad columns, per quad j at base = 39*j:
      rows base+0..35:  p0|e1|e2|n (12 values) split hi/mid/lo — the
                        exact 3-way bf16 split (onehot.split_bf16x3);
                        12 hi rows, then 12 mid, then 12 lo. The
                        normal rides along so the leaf test reproduces
                        the reference's PrecomputedTri arithmetic
                        bit-for-bit (tri.h:56-74).
      rows base+36..38: bytes of (gpos + 1)  (0 = padding slot).
    """
    f32, bf16, i32 = jnp.float32, jnp.bfloat16, jnp.int32
    T, _, P = table.shape
    half = table * jnp.asarray(0.5, f32)
    # node layout
    b2 = half[:, :48].reshape(T, 24, 2, P)
    lo = _bf16_round_dir(b2[:, :, 0], up=False)
    hi = _bf16_round_dir(b2[:, :, 1], up=True)
    bnd = jnp.stack([lo, hi], axis=2).reshape(T, 48, P)
    w = table[:, 48:56].astype(i32)  # f32-encoded ints, exact
    wb = jnp.concatenate([w & 255, (w >> 8) & 255, w >> 16], axis=1)
    wb = (wb.astype(f32) * 0.5).astype(bf16)
    node = jnp.concatenate(
        [bnd, wb, jnp.zeros((T, KROWS - 72, P), bf16)], axis=1)
    # quad layout
    q = half[:, :52].reshape(T, QUAD, 13, P)
    c = q[:, :, 0:12]
    chi, cmid, clo = _split3_bits(c)
    g = (table[:, :52].reshape(T, QUAD, 13, P)[:, :, 12]
         .astype(i32) + 1)                                # [T, 4, P]
    gb = jnp.stack([g & 255, (g >> 8) & 255, g >> 16], axis=2)
    gb = (gb.astype(f32) * 0.5).astype(bf16)              # [T, 4, 3, P]
    quad = jnp.concatenate([chi, cmid, clo, gb], axis=2)
    quad = quad.reshape(T, KROWS, P)
    is_node = (jax.lax.broadcasted_iota(i32, (T, 1, P), 2)
               < n_wide.reshape(T, 1, 1).astype(i32))
    return jnp.where(is_node, node, quad)


def _sort8(keys, words):
    """Batcher odd-even merge sort of 8 rows by key: [8, B] each."""
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7),
             (0, 2), (1, 3), (4, 6), (5, 7),
             (1, 2), (5, 6),
             (0, 4), (1, 5), (2, 6), (3, 7),
             (2, 4), (3, 5),
             (1, 2), (3, 4), (5, 6)]
    kt = [keys[i:i + 1] for i in range(8)]
    wt = [words[i:i + 1] for i in range(8)]
    for a, b in pairs:
        swap = kt[a] > kt[b]
        ka = jnp.where(swap, kt[b], kt[a])
        kb = jnp.where(swap, kt[a], kt[b])
        wa = jnp.where(swap, wt[b], wt[a])
        wb = jnp.where(swap, wt[a], wt[b])
        kt[a], kt[b] = ka, kb
        wt[a], wt[b] = wa, wb
    return kt, wt


# Measurement-only ablation switches for tools/ablate_kernel2.py:
# trace-time gates that drop kernel phases to attribute the
# per-iteration budget. Empty in production (the default build); any
# non-empty value produces WRONG results by design.
_ABLATE: frozenset = frozenset()


def _traverse_core(table, org, dir_, tmin, tmax0, lane_active,
                   *, any_hit, robust, stack_depth):
    """The 8-wide traversal state machine over ONE treelet table.

    Fresh-hit contract: best/u/v/pos start empty (inf/-1); the caller
    merges kernel results against each ray's prior best host-side, so
    pair payloads carry only org/dir/tmin/tmax (tmax = the ray's
    current best, which is all the pruning needs, bvh.h:137-149).

    Returns rows [1, B]: best_t, best_u, best_v, best_pos(f32), iters,
    sticky stack-overflow flag (the SmallStack assert analogue,
    stack.h:21; overflowing lanes report instead of corrupting).
    """
    B = org.shape[1]
    f32, i32 = jnp.float32, jnp.int32

    eps = jnp.asarray(np.finfo(np.float32).eps, f32)
    big = jnp.asarray(np.finfo(np.float32).max, f32)
    if robust:
        inv_dir = 1.0 / dir_
    else:
        inv_dir = jnp.where(jnp.abs(dir_) <= eps,
                            jnp.where(jnp.signbit(dir_), -big, big),
                            1.0 / dir_)
    inv_org = -inv_dir * org
    ui = jax.lax.bitcast_convert_type(inv_dir, jnp.uint32)
    padded = jax.lax.bitcast_convert_type(ui + jnp.uint32(2), f32)
    inv_pad = jnp.where(jnp.isfinite(inv_dir), padded, inv_dir)
    neg = jnp.signbit(dir_)

    # dual table layout: the raw 64-row f32 table rides the bit-exact
    # 3x-bf16 split fetch (cheaper at narrow P where the fetch is not
    # dominant — sponza P=384: 118.9 vs 132.6 ms/render, honest r5); the
    # 156-row pre-packed bf16 table (pack_kernel_table) fetches in ONE
    # MXU pass and wins at San-Miguel-scale widths where the fetch
    # dominates the iteration.
    packed_layout = table.shape[0] == KROWS
    if packed_layout:
        from bvh_tpu.traverse.onehot import make_onehot_fetch_packed

        fetch = make_onehot_fetch_packed(table, B)
    else:
        from bvh_tpu.traverse.onehot import make_onehot_fetch

        nparts = 1 if "fetch1" in _ABLATE else (
            2 if "fetch2" in _ABLATE else 3)
        fetch = make_onehot_fetch(table, B, nparts=nparts)

    inf_row = jnp.full((1, B), jnp.inf, f32)

    state = (
        jnp.zeros((stack_depth, B), i32),      # stack of packed words
        jnp.zeros((1, B), i32),                # sp
        jnp.zeros((1, B), i32),                # top word (wide node col 0)
        jnp.zeros((1, B), i32),                # leaf_cur (quad column)
        jnp.zeros((1, B), i32),                # leaf_rem (quad count)
        (lane_active & (tmin <= tmax0)).astype(i32),
        tmax0,
        inf_row,                               # best t (fresh)
        jnp.zeros((1, B), f32),                # best u
        jnp.zeros((1, B), f32),                # best v
        jnp.full((1, B), -1, i32),             # best pos
        jnp.zeros((1, B), i32),                # iterations
        jnp.zeros((1, B), i32),                # sticky stack overflow
        jnp.zeros((1, B), i32),                # per-lane active steps
        jnp.zeros((1, B), i32),                # stack high-water mark
    )

    def cond(s):
        return jnp.any(s[5] > 0)

    def one_step(s):
        (stack, sp, top, leaf_cur, leaf_rem, active_i, tmax,
         best_t, best_u, best_v, best_pos, iters, ovf, asteps, hwm) = s
        iters = iters + 1
        asteps = asteps + active_i
        active = active_i > 0
        in_leaf = active & (leaf_rem > 0)

        fid = top >> 4
        fetch_idx = jnp.where(in_leaf, leaf_cur, fid)
        row = fetch(fetch_idx)

        # ---- quad leaf step: 4 sequential Moller-Trumbore tests ------
        # Gated behind a block-wide any(): pair sorting groups lanes by
        # (treelet, octant), so whole blocks spend runs of iterations
        # all-inner (descending) or all-leaf (draining quad columns);
        # skipping the dead phase saves its ~140 VPU ops per lane.
        def leaf_phase(args):
            (best_t, tmax, best_u, best_v, best_pos) = args
            done_by_hit = jnp.zeros((1, B), i32)
            for j in range(QUAD):
                if packed_layout:
                    base = j * 39
                    # exact f32 reconstruction: the three split rows
                    # occupy disjoint mantissa windows, sums are exact
                    coords = (row[base: base + 12]
                              + row[base + 12: base + 24]
                              + row[base + 24: base + 36])
                    p0 = coords[0:3]
                    e1 = coords[3:6]
                    e2 = coords[6:9]
                    nrm = coords[9:12]
                    gpos = (row[base + 36: base + 37]
                            + 256.0 * row[base + 37: base + 38]
                            + 65536.0 * row[base + 38: base + 39]
                            ).astype(i32) - 1
                else:
                    p0 = row[j * 13: j * 13 + 3]
                    e1 = row[j * 13 + 3: j * 13 + 6]
                    e2 = row[j * 13 + 6: j * 13 + 9]
                    nrm = row[j * 13 + 9: j * 13 + 12]
                    gpos = row[j * 13 + 12: j * 13 + 13].astype(i32)
                cvec = p0 - org
                rvec = jnp.concatenate(
                    [dir_[1:2] * cvec[2:3] - dir_[2:3] * cvec[1:2],
                     dir_[2:3] * cvec[0:1] - dir_[0:1] * cvec[2:3],
                     dir_[0:1] * cvec[1:2] - dir_[1:2] * cvec[0:1]],
                    axis=0)
                inv_det = 1.0 / jnp.sum(nrm * dir_, axis=0, keepdims=True)
                uu = jnp.sum(rvec * e2, axis=0, keepdims=True) * inv_det
                vv = jnp.sum(rvec * e1, axis=0, keepdims=True) * inv_det
                ww = 1.0 - uu - vv
                tt = jnp.sum(nrm * cvec, axis=0, keepdims=True) * inv_det
                tol = -eps
                tri_hit = ((uu >= tol) & (vv >= tol) & (ww >= tol)
                           & (tt >= tmin) & (tt <= tmax) & in_leaf
                           & (gpos >= 0) & (done_by_hit == 0))
                best_t = jnp.where(tri_hit, tt, best_t)
                if not any_hit:
                    tmax = jnp.where(tri_hit, tt, tmax)
                else:
                    done_by_hit = done_by_hit | tri_hit.astype(i32)
                best_u = jnp.where(tri_hit, uu, best_u)
                best_v = jnp.where(tri_hit, vv, best_v)
                best_pos = jnp.where(tri_hit, gpos, best_pos)
            return (best_t, tmax, best_u, best_v, best_pos, done_by_hit)

        # NOTE: gating the phases behind lax.cond(any(in_leaf)) was
        # measured SLOWER (r4 A/B; the reading predates the r5 chain
        # fix, so treat it as directional): the scf.if boundary costs
        # more than the skipped VPU work. Both phases run
        # unconditionally, lane-masked.
        if "leaf" in _ABLATE:
            done_i = jnp.zeros((1, B), i32)
        else:
            (best_t, tmax, best_u, best_v, best_pos, done_i) = leaf_phase(
                (best_t, tmax, best_u, best_v, best_pos))
        done_by_hit = done_i > 0
        leaf_cur = jnp.where(in_leaf, leaf_cur + 1, leaf_cur)
        leaf_rem = jnp.where(in_leaf, leaf_rem - 1, leaf_rem)
        leaf_exhausted = in_leaf & (leaf_rem == 0) & ~done_by_hit

        # ---- wide inner step: 8 slab tests, sorted multi-push --------
        in_inner = active & ~in_leaf
        top_is_leaf = (top & 15) != 0
        enter_leaf = in_inner & top_is_leaf
        do_node = in_inner & ~top_is_leaf

        def inner_phase(args):
            stack, sp, ovf = args
            t0s = []
            hits = []
            for c in range(WIDTH):
                t0 = tmin
                t1 = tmax
                for d in range(3):
                    lo = row[c * 6 + 2 * d: c * 6 + 2 * d + 1]
                    hi = row[c * 6 + 2 * d + 1: c * 6 + 2 * d + 2]
                    ng = neg[d:d + 1]
                    nb = jnp.where(ng, hi, lo)
                    fb = jnp.where(ng, lo, hi)
                    if robust:
                        tn = (nb - org[d:d + 1]) * inv_dir[d:d + 1]
                        tf = (fb - org[d:d + 1]) * inv_pad[d:d + 1]
                    else:
                        tn = nb * inv_dir[d:d + 1] + inv_org[d:d + 1]
                        tf = fb * inv_dir[d:d + 1] + inv_org[d:d + 1]
                    # robust_max/min, NaN swallowed as node.h:105-117
                    t0 = jnp.maximum(tn, t0)
                    t1 = jnp.minimum(tf, t1)
                t0s.append(t0)
                # Mosaic cannot concatenate i1 vregs; carry as i32.
                hits.append((t0 <= t1).astype(i32))
            t0v = jnp.concatenate(t0s, axis=0)       # [8, B]
            hitm = jnp.concatenate(hits, axis=0) > 0
            if packed_layout:
                # exact byte recombination (every term < 2^24 fits f32)
                words = (row[48:56] + 256.0 * row[56:64]
                         + 65536.0 * row[64:72]).astype(i32)
            else:
                words = row[48:56].astype(i32)
            if any_hit:
                # slot order (SATO: slots area-descending by collapse)
                # int iota then cast: Mosaic's tpu.iota is integer-only
                keys = jnp.where(
                    hitm,
                    jax.lax.broadcasted_iota(
                        i32, (WIDTH, B), 0).astype(f32),
                    inf_row * jnp.ones((WIDTH, 1), f32),
                )
            else:
                keys = jnp.where(hitm, t0v, jnp.inf)
            if "nosort8" in _ABLATE:
                kt = [keys[i:i + 1] for i in range(WIDTH)]
                wt = [words[i:i + 1] for i in range(WIDTH)]
            else:
                kt, wt = _sort8(keys, words)
            n_hits = jnp.sum(hitm.astype(i32), axis=0, keepdims=True)

            descend = do_node & (n_hits > 0)
            new_top = wt[0]
            # push far-to-near so the nearest remaining pops first.
            # The stack keeps its TOP at row 0: a push is a conditional
            # one-row shift-down (static concat + one [D, B] select),
            # which costs ~2 row-ops per row where the old sp-masked
            # addressing (iota compare + and + select, plus a masked
            # max-reduce per pop) cost ~3-4 — the [stack_depth, B] mask
            # traffic was the single largest VPU term of the iteration.
            # Pushing with sp already at stack_depth drops the BOTTOM
            # entry; the sticky ovf flag marks the run invalid exactly
            # as the old no-write form did (results discarded either
            # way: wide_treelet_intersect_tris auto-retries deeper).
            for j in range(WIDTH - 1, 0, -1):
                push_j = do_node & (n_hits > j)
                shifted = jnp.concatenate([wt[j], stack[:-1]], axis=0)
                stack = jnp.where(push_j, shifted, stack)
                ovf = jnp.where(push_j & (sp >= stack_depth), 1, ovf)
                sp = jnp.where(push_j, jnp.minimum(sp + 1, stack_depth),
                               sp)
            return (stack, sp, ovf, descend.astype(i32), new_top)

        (stack, sp, ovf, descend_i, new_top) = inner_phase(
            (stack, sp, ovf))
        descend = descend_i > 0

        leaf_cur = jnp.where(enter_leaf, fid, leaf_cur)
        leaf_rem = jnp.where(enter_leaf, top & 15, leaf_rem)

        need_pop = (do_node & ~descend) | leaf_exhausted
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[0:1]  # top-at-row-0: the pop read is free
        shifted_up = jnp.concatenate(
            [stack[1:], jnp.zeros((1, B), i32)], axis=0)
        stack = jnp.where(can_pop, shifted_up, stack)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~done_by_hit & ~(need_pop & ~can_pop)
        hwm = jnp.maximum(hwm, sp)
        return (stack, sp, top, leaf_cur, leaf_rem, active.astype(i32),
                tmax, best_t, best_u, best_v, best_pos, iters, ovf,
                asteps, hwm)

    def body(s):
        # Unroll 2 state-machine steps per while iteration (the binary
        # mega-kernel's trick, pallas_kernel.py): a step is a no-op for
        # inactive lanes, so chaining steps is semantically free; it
        # halves the while-loop boundary cost (cond reduce + scalar
        # sync) and widens the scheduler's window across two
        # independent-ish step bodies. `iters` counts STEPS (a block
        # whose max lane finishes on an odd step pays one trailing
        # no-op step, honestly counted), so the diag's lane-slot
        # arithmetic is unchanged.
        for _ in range(_UNROLL):
            s = one_step(s)
        return s

    out = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, _, tmax, best_t, best_u, best_v, best_pos,
     iters, ovf, asteps, hwm) = out
    # overflow flag and high-water mark share one output row:
    # enc = hwm + 1000*ovf (hwm <= stack_depth <= 999 always). A max
    # over lanes/blocks decodes to (any overflow, max needed depth);
    # when any block overflowed the decoded hwm may understate — fine,
    # overflowed runs are discarded and re-run deeper anyway.
    enc = hwm + 1000 * ovf
    return (best_t, best_u, best_v, best_pos.astype(f32),
            iters.astype(f32), enc.astype(f32), asteps.astype(f32))


def _wide_kernel_pair(tid_ref, table_ref, pair_ref, out_ref,
                      *, any_hit, robust, stack_depth, n_pairs):
    """Reference/interpret kernel: the pair payload arrives pre-gathered
    as a dense [10, block] BlockSpec input.

    pair rows: org(0-2), dir(3-5), tmin(6), tmax(7), pair id(8),
    valid(9). out rows: best t/u/v/pos(0-3), pair id echo(4, so the
    driver can unsort results with one payload sort), iterations(5 —
    the traversal-stats hook, benchmark.cpp:258-267 analogue),
    stack-overflow flag(6), per-lane active steps(7 — lane_steps /
    (block_iters * block) is the lockstep occupancy)."""
    del tid_ref
    pair = pair_ref[:, :]
    active = pair[9:10] > 0
    bt, bu, bv, pos, iters, ovf, asteps = _traverse_core(
        table_ref[0], pair[0:3], pair[3:6], pair[6:7], pair[7:8], active,
        any_hit=any_hit, robust=robust, stack_depth=stack_depth)
    out_ref[:, :] = jnp.concatenate(
        [bt, bu, bv, pos, pair[8:9], iters, ovf, asteps], axis=0)


def _wide_kernel_dma(tid_ref, start128_ref, off_ref, erel_ref, table_ref,
                     data_ref, out_ref, scratch, sem,
                     *, any_hit, robust, stack_depth, n_pairs):
    """TPU kernel: each grid block DMAs its OWN contiguous [16, block]
    slice of the treelet-sorted pair array (dynamic offset from the
    scalar-prefetched start array) instead of the driver materializing
    a [rows, n_blocks*block] gather — the gather was the single
    largest glue cost (~7.6 ms per 1.4M lanes on this backend).

    Mosaic requires provably 128-aligned dynamic lane offsets, so the
    copy starts at start128*128 with 128 extra lanes and the residual
    offset is applied with a dynamic lane rotate.

    Lanes at j >= erel[i] fall outside the block's treelet run (block
    windows overlap the next run; the erel bound keeps each pair
    processed exactly once); they echo pair id n_pairs so the driver's
    unsort slides them past every real pair."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    W = scratch.shape[2]
    B = W - 128
    f32, i32 = jnp.float32, jnp.int32
    slot = jax.lax.rem(i, 2)

    def copy_in(k, s):
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(start128_ref[k] * 128, W)],
            scratch.at[s], sem.at[s])

    # double buffering: block 0 fetches itself, every block prefetches
    # its successor, so the (serial) grid hides the HBM latency behind
    # the previous block's traversal loop
    @pl.when(i == 0)
    def _():
        copy_in(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        copy_in(i + 1, jax.lax.rem(i + 1, 2)).start()

    copy_in(i, slot).wait()
    off = off_ref[i]
    shift = jax.lax.rem(W - off, W)
    pair = pltpu.roll(scratch[slot], shift, 1)[:, :B]
    window = jax.lax.broadcasted_iota(i32, (1, B), 1) < erel_ref[i]
    active = window & (pair[9:10] > 0)
    pid = jnp.where(window, pair[8:9], jnp.asarray(float(n_pairs), f32))
    bt, bu, bv, pos, iters, ovf, asteps = _traverse_core(
        table_ref[0], pair[0:3], pair[3:6], pair[6:7], pair[7:8], active,
        any_hit=any_hit, robust=robust, stack_depth=stack_depth)
    out_ref[:, :] = jnp.concatenate(
        [bt, bu, bv, pos, pid, iters, ovf, asteps], axis=0)


def _phase_b(btid, bstart, berel, table, data, *, block, any_hit, robust,
             stack_depth, interpret):
    """Run the wide kernel over nb blocks; `data` is the
    [16, L+block+128] treelet-sorted pair array (HBM-resident on TPU).
    Returns [8, nb*block].

    interpret mode (CPU tests) pre-gathers the per-block slices and
    feeds them as a BlockSpec input — same numerics, no TPU DMA
    primitives."""
    nb = btid.shape[0]
    n_pairs = data.shape[1] - block - 128
    if interpret:
        pos = bstart[:, None] + jnp.arange(block, dtype=jnp.int32)[None, :]
        window = (jnp.arange(block, dtype=jnp.int32)[None, :]
                  < berel[:, None])
        gat = jnp.take(data, pos.reshape(-1), axis=1)  # [10, nb*block]
        wflat = window.reshape(-1)
        gat = gat.at[9].set(jnp.where(wflat, gat[9], 0.0))
        gat = gat.at[8].set(jnp.where(wflat, gat[8], float(n_pairs)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, table.shape[1], table.shape[2]),
                             lambda i, tid: (tid[i], 0, 0)),
                pl.BlockSpec((16, block), lambda i, tid: (0, i)),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i, tid: (0, i)),
        )
        kernel = partial(_wide_kernel_pair, any_hit=any_hit, robust=robust,
                         stack_depth=stack_depth, n_pairs=n_pairs)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, nb * block), jnp.float32),
            interpret=True,
        )(btid, table, gat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, table.shape[1], table.shape[2]),
                         lambda i, tid, st, of, er: (tid[i], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((8, block),
                               lambda i, tid, st, of, er: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, block + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_wide_kernel_dma, any_hit=any_hit, robust=robust,
                     stack_depth=stack_depth, n_pairs=n_pairs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, nb * block), jnp.float32),
    )(btid, bstart // 128, bstart % 128, berel, table, data)


# ---------------------------------------------------- phase A2 (supers)
def _collect_core(table, org, dir_, tmin, tmax0, lane_active, root_word,
                  *, robust, stack_depth, max_new):
    """Binary collect over ONE pair table (14-row format): records
    (portal word >> 4, entry t) for every portal leaf whose box the ray
    enters. Same traversal semantics as treelet._collect_kernel, but
    over a block-streamed table. Returns (ptid [max_new, B] as f32,
    ptent [max_new, B], pcnt [1, B]); pcnt counts every recordable
    portal so overflow (pcnt > max_new) is detectable exactly."""
    B = org.shape[1]
    f32, i32 = jnp.float32, jnp.int32
    eps = jnp.asarray(np.finfo(np.float32).eps, f32)
    big = jnp.asarray(np.finfo(np.float32).max, f32)
    if robust:
        inv_dir = 1.0 / dir_
    else:
        inv_dir = jnp.where(jnp.abs(dir_) <= eps,
                            jnp.where(jnp.signbit(dir_), -big, big),
                            1.0 / dir_)
    inv_org = -inv_dir * org
    ui = jax.lax.bitcast_convert_type(inv_dir, jnp.uint32)
    padded = jax.lax.bitcast_convert_type(ui + jnp.uint32(2), f32)
    inv_pad = jnp.where(jnp.isfinite(inv_dir), padded, inv_dir)
    neg = jnp.signbit(dir_)

    from bvh_tpu.traverse.onehot import make_onehot_fetch

    fetch = make_onehot_fetch(table, B)

    def slab(row6, tmax):
        t0, t1 = tmin, tmax
        for d in range(3):
            lo = row6[2 * d: 2 * d + 1]
            hi = row6[2 * d + 1: 2 * d + 2]
            ng = neg[d:d + 1]
            nb_ = jnp.where(ng, hi, lo)
            fb = jnp.where(ng, lo, hi)
            if robust:
                tn = (nb_ - org[d:d + 1]) * inv_dir[d:d + 1]
                tf = (fb - org[d:d + 1]) * inv_pad[d:d + 1]
            else:
                tn = nb_ * inv_dir[d:d + 1] + inv_org[d:d + 1]
                tf = fb * inv_dir[d:d + 1] + inv_org[d:d + 1]
            t0 = jnp.maximum(tn, t0)
            t1 = jnp.minimum(tf, t1)
        return t0, t1

    state = (
        jnp.zeros((stack_depth, B), i32),
        jnp.zeros((1, B), i32),                    # sp
        jnp.zeros((1, B), i32) + root_word,        # top
        (lane_active & (tmin <= tmax0)).astype(i32),
        jnp.full((max_new, B), -1, i32),           # portal ids
        jnp.full((max_new, B), jnp.inf, f32),      # portal entry t
        jnp.zeros((1, B), i32),                    # portal count
    )

    def cond(s):
        return jnp.any(s[3] > 0)

    def body(s):
        stack, sp, top, active_i, ptid, ptent, pcnt = s
        active = active_i > 0
        lanes_p = jax.lax.broadcasted_iota(i32, (max_new, B), 0)
        # a leaf top word is a portal handed down directly: record at tmin
        top_is_leaf = (top & 15) != 0
        rec_root = active & top_is_leaf
        rec_row = (lanes_p == pcnt) & rec_root & (pcnt < max_new)
        ptid = jnp.where(rec_row, top >> 4, ptid)
        ptent = jnp.where(rec_row, tmin, ptent)
        pcnt = jnp.where(rec_root, pcnt + 1, pcnt)

        do_node = active & ~top_is_leaf
        fid = top >> 4
        nrow = fetch(fid >> 1)
        idx_l = nrow[12:13].astype(i32)
        idx_r = nrow[13:14].astype(i32)
        tl0, tl1 = slab(nrow[0:6], tmax0)
        tr0, tr1 = slab(nrow[6:12], tmax0)
        hit_l = (tl0 <= tl1) & do_node
        hit_r = (tr0 <= tr1) & do_node
        leaf_l = (idx_l & 15) != 0
        leaf_r = (idx_r & 15) != 0

        rec_l = hit_l & leaf_l
        rec_row = (lanes_p == pcnt) & rec_l & (pcnt < max_new)
        ptid = jnp.where(rec_row, idx_l >> 4, ptid)
        ptent = jnp.where(rec_row, tl0, ptent)
        pcnt = jnp.where(rec_l, pcnt + 1, pcnt)
        rec_r = hit_r & leaf_r
        rec_row = (lanes_p == pcnt) & rec_r & (pcnt < max_new)
        ptid = jnp.where(rec_row, idx_r >> 4, ptid)
        ptent = jnp.where(rec_row, tr0, ptent)
        pcnt = jnp.where(rec_r, pcnt + 1, pcnt)

        dl = hit_l & ~leaf_l
        dr = hit_r & ~leaf_r
        both = dl & dr
        swap = tl0 > tr0
        near = jnp.where(swap, idx_r, idx_l)
        far = jnp.where(swap, idx_l, idx_r)
        new_top = jnp.where(both, near, jnp.where(dl, idx_l, idx_r))
        descend = do_node & (dl | dr)

        push = do_node & both
        # top-at-row-0 shift stack (see _traverse_core's inner_phase)
        stack = jnp.where(
            push, jnp.concatenate([far, stack[:-1]], axis=0), stack)
        sp = jnp.where(push, jnp.minimum(sp + 1, stack_depth), sp)

        need_pop = active & ~descend
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[0:1]
        stack = jnp.where(
            can_pop,
            jnp.concatenate([stack[1:], jnp.zeros((1, B), i32)], axis=0),
            stack)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~(need_pop & ~can_pop)
        return (stack, sp, top, active.astype(i32), ptid, ptent, pcnt)

    out = jax.lax.while_loop(cond, body, state)
    return out[4].astype(jnp.float32), out[5], out[6].astype(jnp.float32)


def _sup_kernel_pair(tid_ref, table_ref, pair_ref, out_ref,
                     *, robust, stack_depth, max_new, n_pairs):
    """Interpret-path A2 kernel (pre-gathered pair input)."""
    del tid_ref
    pair = pair_ref[:, :]
    active = pair[9:10] > 0
    ptid, ptent, pcnt = _collect_core(
        table_ref[0], pair[0:3], pair[3:6], pair[6:7], pair[7:8], active,
        1 << 4, robust=robust, stack_depth=stack_depth, max_new=max_new)
    out_ref[:, :] = jnp.concatenate(
        [ptid, ptent, pair[8:9], pcnt], axis=0)


def _sup_kernel_dma(tid_ref, start128_ref, off_ref, erel_ref, table_ref,
                    data_ref, out_ref, scratch, sem,
                    *, robust, stack_depth, max_new, n_pairs):
    """TPU A2 kernel: per-block DMA pair fetch (see _wide_kernel_dma)."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    W = scratch.shape[2]
    B = W - 128
    f32, i32 = jnp.float32, jnp.int32
    slot = jax.lax.rem(i, 2)

    def copy_in(k, s):
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(start128_ref[k] * 128, W)],
            scratch.at[s], sem.at[s])

    @pl.when(i == 0)
    def _():
        copy_in(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        copy_in(i + 1, jax.lax.rem(i + 1, 2)).start()

    copy_in(i, slot).wait()
    off = off_ref[i]
    shift = jax.lax.rem(W - off, W)
    pair = pltpu.roll(scratch[slot], shift, 1)[:, :B]
    window = jax.lax.broadcasted_iota(i32, (1, B), 1) < erel_ref[i]
    active = window & (pair[9:10] > 0)
    pid = jnp.where(window, pair[8:9], jnp.asarray(float(n_pairs), f32))
    ptid, ptent, pcnt = _collect_core(
        table_ref[0], pair[0:3], pair[3:6], pair[6:7], pair[7:8], active,
        1 << 4, robust=robust, stack_depth=stack_depth, max_new=max_new)
    out_ref[:, :] = jnp.concatenate([ptid, ptent, pid, pcnt], axis=0)


def _phase_a2(btid, bstart, berel, sup_table, data, *, block, robust,
              stack_depth, max_new, interpret):
    """Run the A2 collect kernel over nb blocks, one super pair table
    per block. Returns [2*max_new + 2, nb*block]: rows [0, max_new) =
    recorded treelet ids (-1 empty), [max_new, 2*max_new) = entry ts,
    then pair id echo and recordable-portal count."""
    nb = btid.shape[0]
    n_pairs = data.shape[1] - block - 128
    rows_out = 2 * max_new + 2
    if interpret:
        pos = bstart[:, None] + jnp.arange(block, dtype=jnp.int32)[None, :]
        window = (jnp.arange(block, dtype=jnp.int32)[None, :]
                  < berel[:, None])
        gat = jnp.take(data, pos.reshape(-1), axis=1)
        wflat = window.reshape(-1)
        gat = gat.at[9].set(jnp.where(wflat, gat[9], 0.0))
        gat = gat.at[8].set(jnp.where(wflat, gat[8], float(n_pairs)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 16, sup_table.shape[2]),
                             lambda i, tid: (tid[i], 0, 0)),
                pl.BlockSpec((16, block), lambda i, tid: (0, i)),
            ],
            out_specs=pl.BlockSpec((rows_out, block),
                                   lambda i, tid: (0, i)),
        )
        kernel = partial(_sup_kernel_pair, robust=robust,
                         stack_depth=stack_depth, max_new=max_new,
                         n_pairs=n_pairs)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows_out, nb * block),
                                           jnp.float32),
            interpret=True,
        )(btid, sup_table, gat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 16, sup_table.shape[2]),
                         lambda i, tid, st, of, er: (tid[i], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((rows_out, block),
                               lambda i, tid, st, of, er: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, block + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_sup_kernel_dma, robust=robust,
                     stack_depth=stack_depth, max_new=max_new,
                     n_pairs=n_pairs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out, nb * block),
                                       jnp.float32),
    )(btid, bstart // 128, bstart % 128, berel, sup_table, data)


# ------------------------------------------------------------- driver
def _lcm(a, b):
    return a * b // int(np.gcd(a, b))


def phase_a_plan(cols, top_block, *, top_stack=48, max_portals=32,
                 budget_bytes=15 * 1024 * 1024):
    """Pre-compile *scoped-VMEM* estimate for the phase-A collect
    kernel; picks (top_block, fetch_chunk) that fit the budget instead
    of dying in the remote Mosaic compile (the round-2 San-Miguel
    failure mode).

    Mosaic gives a kernel 16 MB of scoped VMEM. The per-ray-lane word
    model is calibrated against hardware: the double-buffered portal
    outputs 2*(2*MP+8), the while-carry portal lists + scalars
    (2*MP+4), the record-row iota (MP), the stack and its lane iota
    (2*top_stack), and the double-buffered ray block + fetched node
    row (32). It predicts a measured OOM exactly (B=8192, MP=64,
    top_stack=48 -> 19.5 MB predicted, 19.45 MB reported) and the
    proven sponza config inside budget (B=8192, MP=32 -> 12.2 MB,
    compiles and runs). The single-dot one-hot fetch intermediate does
    NOT materialize at cols x B (Mosaic tiles the dot): cols only
    enter via the resident table. fetch_chunk bounds the one-hot
    streaming at very large tables (the round-2 San-Miguel failure
    mode) and is bit-identical by construction; the chunked fetch runs
    as a fori_loop so exactly ONE [chunk, B] one-hot buffer is live
    (an unrolled chunk loop kept all of them live — measured 84 MB
    scoped at 7 x [1024, 4096], failing the remote Mosaic compile),
    and that buffer IS budgeted below."""
    budget_w = budget_bytes // 4
    fetch_chunk = 512 if cols > 2048 else None
    # 4*top_stack (not 2): the round-5 top-at-row-0 shift stack
    # materializes a shifted copy of the [top_stack, B] stack per
    # conditional push/pop concat, and the hwm carry adds a few rows —
    # re-calibrated against a measured 16.23 MB at (B=8192, MP=32,
    # top_stack=48): per_ray = 497 observed, 500 modeled.
    per_ray = 7 * max_portals + 4 * top_stack + 84 + (fetch_chunk or 0)
    while top_block > 1024 and per_ray * top_block + 16 * cols > budget_w:
        top_block //= 2
    return top_block, fetch_chunk


@partial(jax.jit, static_argnames=(
    "top_root", "any_hit", "robust", "block", "tail_block", "top_block",
    "top_stack", "stack_depth", "max_portals", "max_rounds", "sel_cap",
    "portals_per_round", "interpret", "sup_stack", "max_new", "k2",
    "mps", "a2_cap", "max_runs", "tail_cap", "fetch_chunk", "tail_k"))
def _render_jit(top_node_t, table, packed, sup_table=None, *, top_root,
                any_hit, robust,
                block, tail_block, top_block, top_stack, stack_depth,
                max_portals, max_rounds, sel_cap, portals_per_round,
                interpret, sup_stack=8, max_new=16, k2=2, mps=16,
                a2_cap=None, max_runs=4096, tail_cap=None,
                fetch_chunk=None, tail_k=None):
    """The whole render in ONE jitted call: phase-A collect, a single
    compaction to the rays that reached any treelet, dense pair rounds
    over the compact set, and one scatter write-back — zero host
    roundtrips until the final readback.

    Compact-once scheme (round-3 redesign, measured on hardware,
    tools/profile_r3.py): only ~10% of primary rays record any portal
    in phase A, and a ray that records none can never become ready —
    so ALL post-phase-A work (the per-ray portal sort, the pair
    expansion, the tail rounds' partition sorts) runs at `sel_cap`
    width instead of full ray-count width.  The old design paid a
    full-width 7-operand payload sort (~7 ms at 1M rays) to write
    round-1 results back plus a full-width portal sort (~1.7 ms); the
    compact design pays four 1-D scatters (~0.8 ms each) once at the
    very end.  If more than `sel_cap` rays are ready, an outer loop
    simply processes the ready list in `sel_cap`-sized chunks (rays
    are independent, so chunked processing is exact).

    Each pair round expands every compact ray's next
    `portals_per_round` portals into a dense pair list sorted by
    (treelet id, ray direction octant) — the octant is a secondary key
    only (kernel blocks stay aligned to treelet runs) so lanes in one
    block traverse the treelet in similar order and the lockstep
    while-loop converges sooner.  A ray's portals are entry-ascending,
    so the portal at the cursor being dead (exhausted, or entry > tmax
    which only shrinks) means every later one is too — `ready ⟺
    portal[cursor] live`.  Pairs of one ray run with the same input
    tmax (no intra-round pruning); results merge by first-j
    strict-min, matching the reference's near-to-far traversal order
    (bvh.h:124-182)."""
    from bvh_tpu.traverse.collect import collect_kernel as _collect_kernel

    f32, i32 = jnp.float32, jnp.int32
    Rp = packed.shape[1]
    T = table.shape[0]
    MP = max_portals
    Rc = min(sel_cap, Rp)
    K1 = portals_per_round
    # tail rounds may expand a different (usually larger) window: each
    # tail round costs ~6 ms of fixed per-stage overhead at sponza
    # (honest r5 decomposition), so draining straggler portals in one
    # or two wide windows beats many narrow rounds. Exactness is
    # unaffected: windows are masked by per-portal validity and the
    # merge is idempotent (bvh.h:137-149 near-to-far rule preserved by
    # the first-j strict-min).
    K2 = tail_k if tail_k is not None else portals_per_round

    # ---- phase A ------------------------------------------------------
    if fetch_chunk and top_node_t.shape[1] % fetch_chunk:
        # the chunked fetch streams whole chunks: pad to a multiple
        # (zero columns are never addressed — every fetched idx < cols)
        top_node_t = jnp.pad(
            top_node_t,
            ((0, 0), (0, -top_node_t.shape[1] % fetch_chunk)))
    root = jnp.full((8, 128), top_root, i32)
    n_blocks = Rp // top_block
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(top_node_t.shape, lambda i: (0, 0)),
            pl.BlockSpec((8, top_block), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((MP, top_block), lambda i: (0, i)),
            pl.BlockSpec((MP, top_block), lambda i: (0, i)),
            pl.BlockSpec((8, top_block), lambda i: (0, i)),
        ],
    )
    kernel = partial(_collect_kernel, dim=3, robust=robust,
                     stack_depth=top_stack, max_portals=MP,
                     fetch_chunk=fetch_chunk)
    ptid, ptent, cnt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((MP, Rp), i32),
            jax.ShapeDtypeStruct((MP, Rp), f32),
            jax.ShapeDtypeStruct((8, Rp), i32),
        ],
        interpret=interpret,
    )(top_node_t, packed, root)

    # ---- compact once: rays with no portal can never become ready ----
    iota_r = jax.lax.broadcasted_iota(i32, (Rp, 1), 0)[:, 0]
    ready0 = cnt[0] > 0
    nready = jnp.sum(ready0.astype(i32))
    _, ids = jax.lax.sort((1 - ready0.astype(i32), iota_r), num_keys=1)
    n_chunks = -(-Rp // Rc)

    iota_c = jax.lax.broadcasted_iota(i32, (Rc, 1), 0)[:, 0]
    iota_mp = jax.lax.broadcasted_iota(i32, (MP, 1), 0)
    two_level = sup_table is not None and sup_table.shape[0] > 0

    if tail_cap is None:
        tail_cap = min(max(tail_block, _round_up(Rc // 8, tail_block)), Rc)
    else:
        tail_cap = min(_round_up(tail_cap, tail_block), Rc)
    AC = tail_cap

    def ready_of(S6, ptid_, ptent_):
        """ready ⟺ the portal at the cursor is live (entries ascend).
        Monotone: a ray that stops being ready never becomes ready
        again (the cursor only advances, tmax only shrinks, the portal
        list is fixed after phase A/A2)."""
        cur = S6[5].astype(i32)[None, :]
        rowmask = iota_mp == cur
        p_t = jnp.max(jnp.where(rowmask, ptent_, -jnp.inf), axis=0)
        p_tid = jnp.max(jnp.where(rowmask, ptid_, -1), axis=0)
        live = (S6[4] < 0) if any_hit else jnp.ones((S6.shape[1],), bool)
        return live & (p_tid >= 0) & (p_t <= S6[0])

    def pair_pass(wtid, wt_, validk, raysel, tmaxsel, octsel, K, blk, rot):
        """One dense pair pass over a [K, W] portal window: sort pairs
        by (treelet, octant), run the kernel over run-padded blocks,
        unsort by the pair-id echo.  Returns (out_pair [4, K, W],
        adv — per-ray cursor advance, block iters, overflow flag).

        The pair payload rides THROUGH the sort — per-lane flat
        gathers cost ~7 ns/row on this backend, the multi-operand sort
        ~1 ms at 524K.  The payload is only org/dir/tmin/tmax + id +
        valid (10 rows): the kernel reports fresh hits and the caller
        folds them into each ray's prior best, so best/u/v/pos never
        enter the sort.

        Run-padding cap: the worst case is one padded block per
        distinct treelet touched (<= T), which is absurd for
        San-Miguel-scale T.  Blocks are capped at `max_runs` runs;
        pairs whose run placement spills past the cap are NOT
        processed this pass — their ray's cursor only advances to its
        first dropped portal, so they re-expand next round (the
        min-merge is idempotent under reprocessing).  Capped passes
        rotate the tid -> sort-key mapping each round (`rot`) so every
        treelet periodically sorts into the surviving prefix of runs —
        without this a ray whose cursor portal always lands in a
        spilled run would starve."""
        W = wtid.shape[1]
        L = K * W
        capped = (T + 2) > max_runs
        NBL = -(-L // blk) + min(T + 2, max_runs)
        iota_L = jax.lax.broadcasted_iota(i32, (L, 1), 0)[:, 0]
        blocks_i = jnp.arange(NBL, dtype=i32)

        if capped and rot is not None:
            ktid = jax.lax.rem(wtid + rot.astype(wtid.dtype),
                               jnp.asarray(T, wtid.dtype))
        else:
            ktid = wtid
        key8 = ktid * 8 + octsel[None, :]
        keyL = jnp.where(validk, key8, T * 8).reshape(L)
        pidf = iota_L.astype(f32)
        validf = validk.reshape(L).astype(f32)
        ops = (keyL,) + tuple(
            jnp.tile(raysel[i], (K,)) for i in range(7)) + (
            jnp.tile(tmaxsel, (K,)), pidf, validf)
        sorted_ = jax.lax.sort(ops, num_keys=1)
        keyS = sorted_[0]
        tidS = keyS >> 3
        dataS = jnp.stack(sorted_[1:11])
        # blk+128 pad columns so every block's (128-aligned) DMA window
        # is in bounds (pads: valid 0, pair id n_pairs); 16 rows because
        # Mosaic DMA slices must be 8-aligned in the sublane dim
        pad = jnp.zeros((10, blk + 128), f32).at[8].set(float(L))
        dataS = jnp.concatenate([dataS, pad], axis=1)
        dataS = jnp.concatenate(
            [dataS, jnp.zeros((6, L + blk + 128), f32)], axis=0)

        # -- block-aligned run placement via scans (gather-free) -------
        # runs are delimited by TREELET id (octant is ordering only);
        # lane_slot[i] = i + padding inserted before i's run start
        prev = jnp.concatenate([jnp.full((1,), -1, i32), tidS[:-1]])
        flag = tidS != prev
        run_start = jax.lax.cummax(jnp.where(flag, iota_L, 0))
        prev_start = jnp.concatenate(
            [jnp.zeros((1,), i32), run_start[:-1]])
        prev_len = jnp.where(flag, iota_L - prev_start, 0)
        pad_delta = jnp.where(flag, (-prev_len) % blk, 0)
        lane_slot = iota_L + jnp.cumsum(pad_delta)

        p0_b = jnp.searchsorted(
            lane_slot, blocks_i * blk, side="left").astype(i32)
        p0c = jnp.clip(p0_b, 0, L - 1)
        t_b = jnp.take(tidS, p0c)
        if capped and rot is not None:
            tb_c = jnp.clip(t_b, 0, T - 1)
            tid_of_block = jax.lax.rem(
                tb_c - rot.astype(tb_c.dtype)
                + jnp.asarray(T, tb_c.dtype),
                jnp.asarray(T, tb_c.dtype))
        else:
            tid_of_block = jnp.clip(t_b, 0, T - 1)
        l0_b = jnp.take(lane_slot, p0c)
        # block i's lanes are pair positions start_b[i] + j; lanes with
        # j >= erel_b[i] spill past the block's treelet run (they alias
        # the next run) and are masked in-kernel. Invalid-pair (tid T)
        # runs keep their lanes so every pair id echoes exactly once.
        e_b = jnp.searchsorted(tidS, t_b, side="right").astype(i32)
        start_un = p0_b - l0_b + blocks_i * blk
        start_b = jnp.clip(start_un, 0, L)
        erel_b = jnp.where(start_un == start_b,
                           jnp.maximum(e_b - start_un, 0), 0)

        fout = _phase_b(
            tid_of_block, start_b, erel_b, table, dataS,
            block=blk, any_hit=any_hit, robust=robust,
            stack_depth=stack_depth, interpret=interpret,
        )

        # -- unsort by the kernel's pair-id echo ------------------------
        if capped:
            # pairs whose run spilled past the block cap were never
            # processed: append filler echoes (pid, inert results,
            # drop=1) so the unsort stays aligned over all L pairs
            drop_sorted = (lane_slot >= NBL * blk).astype(f32)
            fill_pid = jnp.where(drop_sorted > 0, dataS[8, :L], float(L))
            inf_l = jnp.full((L,), jnp.inf, f32)
            zero_l = jnp.zeros((L,), f32)
            ops6 = (
                jnp.concatenate([fout[4], fill_pid]),
                jnp.concatenate([fout[0], inf_l]),
                jnp.concatenate([fout[1], zero_l]),
                jnp.concatenate([fout[2], zero_l]),
                jnp.concatenate([fout[3], -jnp.ones((L,), f32)]),
                jnp.concatenate([jnp.zeros((fout.shape[1],), f32),
                                 drop_sorted]),
            )
            so = jax.lax.sort(ops6, num_keys=1)
            out_pair = jnp.stack(so[1:5])[:, :L].reshape(4, K, W)
            dropk = so[5][:L].reshape(K, W) > 0
            # cursor only advances to the first dropped portal
            adv = jnp.full((W,), K, i32)
            for j in range(K - 1, -1, -1):
                adv = jnp.where(dropk[j], j, adv)
        else:
            so = jax.lax.sort(
                (fout[4], fout[0], fout[1], fout[2], fout[3]),
                num_keys=1)
            out_pair = jnp.stack(so[1:])[:, :L].reshape(4, K, W)
            adv = K
        iters_per_block = fout[5].reshape(NBL, blk)[:, 0]
        blk_iters = jnp.sum(iters_per_block)
        lane_steps = jnp.sum(fout[7])
        # valid-lane iterations: lanes inside each block's treelet run
        # x that block's lockstep iterations. Splits the idle budget:
        #   run padding   = 1 - vli / (blk_iters * blk)
        #   drain waste   = (vli - lane_steps) / (blk_iters * blk)
        vli = jnp.sum(jnp.minimum(erel_b, blk).astype(f32)
                      * iters_per_block)
        any_ovf = jnp.max(fout[6])
        return out_pair, adv, blk_iters, lane_steps, vli, any_ovf

    def merge_results(S6sel, validk, out_pair, adv, K):
        """Fold fresh kernel hits into each ray's prior best.  First-j
        strict-min keeps the near-to-far tie rule (bvh.h:137-149)."""
        n_tmax = S6sel[0]
        n_bt, n_bu, n_bv, n_pos = S6sel[1], S6sel[2], S6sel[3], S6sel[4]
        if any_hit:
            # first-j hit wins; tmax never shrinks on any-hit
            for j in range(K):
                hitj = validk[j] & (out_pair[3, j] >= 0) & (n_pos < 0)
                n_bt = jnp.where(hitj, out_pair[0, j], n_bt)
                n_bu = jnp.where(hitj, out_pair[1, j], n_bu)
                n_bv = jnp.where(hitj, out_pair[2, j], n_bv)
                n_pos = jnp.where(hitj, out_pair[3, j], n_pos)
        else:
            for j in range(K):
                better = validk[j] & (out_pair[0, j] < n_bt)
                n_bt = jnp.where(better, out_pair[0, j], n_bt)
                n_bu = jnp.where(better, out_pair[1, j], n_bu)
                n_bv = jnp.where(better, out_pair[2, j], n_bv)
                n_pos = jnp.where(better, out_pair[3, j], n_pos)
            n_tmax = jnp.minimum(n_tmax, n_bt)
        return jnp.stack([n_tmax, n_bt, n_bu, n_bv, n_pos,
                          S6sel[5] + adv])

    def window_of(S6, ptid_, ptent_, K):
        """Portal rows cur..cur+K-1 per ray, with liveness mask."""
        cur = S6[5].astype(i32)[None, :]
        wtid, wtt = [], []
        for j in range(K):
            rm = iota_mp == cur + j
            wtid.append(jnp.max(jnp.where(rm, ptid_, -1), axis=0))
            wtt.append(jnp.max(jnp.where(rm, ptent_, -jnp.inf), axis=0))
        wtid = jnp.stack(wtid)
        wtt = jnp.stack(wtt)
        live = (S6[4] < 0) if any_hit else jnp.ones((S6.shape[1],), bool)
        validk = (wtid >= 0) & (wtt <= S6[0][None, :]) & live[None, :]
        return wtid, wtt, validk

    def expand_supers(pt0, pe0, rayc, octc):
        """Phase A2 at chunk width: expand super-portals (tid >= T) by
        streaming each super's mid-region pair table per kernel block,
        merging the recorded treelet portals into the per-ray sorted
        list.  Returns (pc_e, pc_t, povf_bits)."""
        S = sup_table.shape[0]
        Rc2 = min(a2_cap if a2_cap is not None else Rc, Rc)
        ray_rows_c = rayc[0:7]
        tmaxc = rayc[7]
        is_sup = pt0 >= T
        sup_key0 = jnp.where(is_sup, pe0, jnp.inf)
        sup_id0 = jnp.where(is_sup, pt0 - T, -1)
        sup_key, sup_id = jax.lax.sort((sup_key0, sup_id0), num_keys=1,
                                       dimension=0)
        # povf is a bitmask: 1 = super list > mps, 2 = a (ray, super)
        # recorded > max_new treelet portals, 4 = merged portal list
        # exceeded max_portals
        povf = jnp.max(jnp.sum(is_sup.astype(i32), axis=0)
                       > mps).astype(f32)
        sup_id = sup_id[:mps]
        main_key = jnp.where(is_sup, jnp.inf, pe0)
        main_id = jnp.where(is_sup, -1, pt0)
        pc_e, pc_t = jax.lax.sort((main_key, main_id), num_keys=1,
                                  dimension=0)

        iota_mps = jax.lax.broadcasted_iota(i32, (mps, 1), 0)
        L2 = k2 * Rc2
        NBL2 = -(-L2 // block) + S + 2
        LL2 = NBL2 * block
        iota_L2 = jax.lax.broadcasted_iota(i32, (L2, 1), 0)[:, 0]
        iota_LL2 = jax.lax.broadcasted_iota(i32, (LL2, 1), 0)[:, 0]
        blocks2 = jnp.arange(NBL2, dtype=i32)
        mn = max_new

        def sready_of(scur):
            cur = scur[None, :]
            rowmask = iota_mps == cur
            sid = jnp.max(jnp.where(rowmask, sup_id, -1), axis=0)
            return sid >= 0

        def a2_round(carry):
            pc_t_, pc_e_, scur, rec_ovf, mrg_ovf, k = carry
            key = 1 - sready_of(scur).astype(i32)
            _, ids_ = jax.lax.sort((key, iota_c), num_keys=1)
            sel = ids_[:Rc2]
            raysel = jnp.take(ray_rows_c, sel, axis=1)
            tmaxsel = jnp.take(tmaxc, sel)
            supid_sel = jnp.take(sup_id, sel, axis=1)      # [mps, Rc2]
            cursel = jnp.take(scur, sel)[None, :]

            wsid = []
            for j in range(k2):
                rm = iota_mps == cursel + j
                wsid.append(jnp.max(jnp.where(rm, supid_sel, -1), axis=0))
            wsid = jnp.stack(wsid)                          # [k2, Rc2]
            validk = wsid >= 0

            keyL = jnp.where(validk, wsid, S).reshape(L2)
            pidf = iota_L2.astype(f32)
            validf = validk.reshape(L2).astype(f32)
            ops = (keyL,) + tuple(
                jnp.tile(raysel[i_], (k2,)) for i_ in range(7)) + (
                jnp.tile(tmaxsel, (k2,)), pidf, validf)
            sorted_ = jax.lax.sort(ops, num_keys=1)
            keyS = sorted_[0]
            dataS = jnp.stack(sorted_[1:11])
            pad = jnp.zeros((10, block + 128), f32).at[8].set(float(L2))
            dataS = jnp.concatenate([dataS, pad], axis=1)
            dataS = jnp.concatenate(
                [dataS, jnp.zeros((6, L2 + block + 128), f32)], axis=0)

            prev = jnp.concatenate([jnp.full((1,), -1, i32), keyS[:-1]])
            flag = keyS != prev
            run_start = jax.lax.cummax(jnp.where(flag, iota_L2, 0))
            prev_start = jnp.concatenate(
                [jnp.zeros((1,), i32), run_start[:-1]])
            prev_len = jnp.where(flag, iota_L2 - prev_start, 0)
            pad_delta = jnp.where(flag, (-prev_len) % block, 0)
            lane_slot = iota_L2 + jnp.cumsum(pad_delta)
            p0_b = jnp.searchsorted(
                lane_slot, blocks2 * block, side="left").astype(i32)
            p0c = jnp.clip(p0_b, 0, L2 - 1)
            t_b = jnp.take(keyS, p0c)
            sid_of_block = jnp.clip(t_b, 0, S - 1)
            l0_b = jnp.take(lane_slot, p0c)
            e_b = jnp.searchsorted(keyS, t_b, side="right").astype(i32)
            start_un = p0_b - l0_b + blocks2 * block
            start_b = jnp.clip(start_un, 0, L2)
            erel_b = jnp.where(start_un == start_b,
                               jnp.maximum(e_b - start_un, 0), 0)

            fout = _phase_a2(
                sid_of_block, start_b, erel_b, sup_table, dataS,
                block=block, robust=robust, stack_depth=sup_stack,
                max_new=mn, interpret=interpret)

            # gather-unsort (34 rows: inverse-permutation gather beats a
            # 34-operand payload sort at these widths)
            _, invpos = jax.lax.sort(
                (fout[2 * mn], iota_LL2.astype(f32)), num_keys=1)
            inv = invpos.astype(i32)[:L2]
            outP = jnp.take(fout, inv, axis=1)              # [2mn+2, L2]
            ntid = outP[0:mn].reshape(mn, k2, Rc2)
            nt = outP[mn:2 * mn].reshape(mn, k2, Rc2)
            ncnt = outP[2 * mn + 1].reshape(k2, Rc2)
            rec_ovf = jnp.maximum(
                rec_ovf, (jnp.max(jnp.where(validk, ncnt, 0.0))
                          > float(mn)).astype(f32))
            vmask = validk[None, :, :] & (ntid >= 0)
            ntid_m = jnp.where(vmask, ntid, -1.0).reshape(mn * k2, Rc2)
            nt_m = jnp.where(vmask, nt, jnp.inf).reshape(mn * k2, Rc2)

            mainid_sel = jnp.take(pc_t_, sel, axis=1).astype(f32)
            maint_sel = jnp.take(pc_e_, sel, axis=1)
            cat_t = jnp.concatenate([maint_sel, nt_m], axis=0)
            cat_id = jnp.concatenate([mainid_sel, ntid_m], axis=0)
            cat_t, cat_id = jax.lax.sort((cat_t, cat_id), num_keys=1,
                                         dimension=0)
            live = jnp.sum(jnp.isfinite(cat_t).astype(i32), axis=0)
            mrg_ovf = jnp.maximum(mrg_ovf,
                                  (jnp.max(live) > MP).astype(f32))
            pc_e_ = pc_e_.at[:, sel].set(cat_t[:MP])
            pc_t_ = pc_t_.at[:, sel].set(cat_id[:MP].astype(i32))
            scur = scur.at[sel].set(cursel[0] + k2)
            return (pc_t_, pc_e_, scur, rec_ovf, mrg_ovf, k + 1)

        def a2_cond(carry):
            return jnp.any(sready_of(carry[2])) & (carry[5] < 64)

        scur0 = jnp.zeros((Rc,), i32)
        pc_t, pc_e, _, rec_ovf, mrg_ovf, _ = jax.lax.while_loop(
            a2_cond, a2_round, (pc_t, pc_e, scur0, jnp.zeros((), f32),
                                jnp.zeros((), f32), jnp.asarray(0, i32)))
        return pc_e, pc_t, povf + 2.0 * rec_ovf + 4.0 * mrg_ovf

    # ---- per-chunk pipeline (almost always exactly one chunk) --------
    def run_chunk(sel):
        rayc = jnp.take(packed, sel, axis=1)             # [8, Rc]
        pt0 = jnp.take(ptid, sel, axis=1)                # [MP, Rc]
        pe0 = jnp.take(ptent, sel, axis=1)
        ray_rows_c = rayc[0:7]
        tmaxc = rayc[7]
        neg = jnp.signbit(rayc[3:6]).astype(i32)
        octc = neg[0] + 2 * neg[1] + 4 * neg[2]          # [Rc]

        if two_level:
            pc_e, pc_t, povf_c = expand_supers(pt0, pe0, rayc, octc)
        else:
            # sort each ray's portals ascending by entry distance
            # (exactness: closest-hit termination needs ascending
            # processing, bvh.h:137-149; unused slots are (tid -1,
            # t +inf) and sort to the end)
            pc_e, pc_t = jax.lax.sort((pe0, pt0), num_keys=1, dimension=0)
            povf_c = jnp.zeros((), f32)

        S6c = jnp.stack([
            tmaxc,
            jnp.full((Rc,), jnp.inf, f32),    # best t
            jnp.zeros((Rc,), f32),            # u
            jnp.zeros((Rc,), f32),            # v
            jnp.full((Rc,), -1.0, f32),       # best pos
            jnp.zeros((Rc,), f32),            # cursor
        ])

        # -- round 1: every chunk ray at cursor 0 ------------------------
        wtid1 = pc_t[:K1]
        wtt1 = pc_e[:K1]
        validk1 = (wtid1 >= 0) & (wtt1 <= tmaxc[None, :])
        out_pair, adv, it1, ls1, vl1, ov1 = pair_pass(
            wtid1, wtt1, validk1, ray_rows_c, tmaxc, octc, K1, block,
            None)
        S6c = merge_results(S6c, validk1, out_pair, adv, K1)

        # -- compacted tail rounds ---------------------------------------
        # After round 1 only stragglers remain ready, and readiness is
        # monotone (see ready_of), so survivors are gathered into a
        # [*, AC] active set; every tail round runs at width AC.  If
        # more than AC rays are ready, the outer loop compacts again
        # once the first set drains.
        def ocond(c):
            k, S6c_, alive, it, ls, vl, ov = c
            return jnp.logical_and(k < max_rounds, alive)

        def obody(c):
            k, S6c_, _, it, ls, vl, ov = c
            key = 1 - ready_of(S6c_, pc_t, pc_e).astype(i32)
            _, idsc = jax.lax.sort((key, iota_c), num_keys=1)
            selc = idsc[:AC]
            S6a = jnp.take(S6c_, selc, axis=1)
            pa_t = jnp.take(pc_t, selc, axis=1)
            pa_e = jnp.take(pc_e, selc, axis=1)
            rays_a = jnp.take(ray_rows_c, selc, axis=1)
            oct_a = jnp.take(octc, selc)

            def icond(ic):
                kk, S6a_, alive, _, _, _, _ = ic
                return jnp.logical_and(kk < max_rounds, alive)

            def ibody(ic):
                kk, S6a_, _, iti, lsi, vli_, ovi = ic
                rot = jax.lax.rem(kk * jnp.asarray(997, i32),
                                  jnp.asarray(T, i32))
                wtid, wtt, validk = window_of(S6a_, pa_t, pa_e, K2)
                outp, advk, itn, lsn, vln, ovn = pair_pass(
                    wtid, wtt, validk, rays_a, S6a_[0], oct_a, K2,
                    tail_block, rot)
                S6n = merge_results(S6a_, validk, outp, advk, K2)
                return (kk + 1, S6n, jnp.any(ready_of(S6n, pa_t, pa_e)),
                        iti + itn, lsi + lsn, vli_ + vln,
                        jnp.maximum(ovi, ovn))

            k, S6a, _, it, ls, vl, ov = jax.lax.while_loop(
                icond, ibody,
                (k, S6a, jnp.any(ready_of(S6a, pa_t, pa_e)), it, ls, vl,
                 ov))
            S6c_ = S6c_.at[:, selc].set(S6a)
            return (k, S6c_, jnp.any(ready_of(S6c_, pc_t, pc_e)), it, ls,
                    vl, ov)

        init = (jnp.asarray(1, i32), S6c,
                jnp.any(ready_of(S6c, pc_t, pc_e)), it1.astype(f32),
                ls1, vl1, ov1)
        k, S6c, _, iters_c, lanes_c, vli_c, ovf_c = jax.lax.while_loop(
            ocond, obody, init)
        # unfinished work (max_rounds cut a capped/replaying schedule
        # short) would mean silently missing hits: flag it (povf bit 8)
        povf_c = povf_c + 8.0 * jnp.any(
            ready_of(S6c, pc_t, pc_e)).astype(f32)
        # total lane slots = round-1 iters x block + tail iters x
        # tail_block (the only two kernel widths); with lane_steps and
        # valid_lane_iters this splits idle into run-padding vs drain
        it1f = it1.astype(f32)
        slots_c = it1f * block + (iters_c - it1f) * tail_block
        return S6c, k, iters_c, lanes_c, vli_c, slots_c, ovf_c, povf_c

    # ---- chunk loop + single scatter write-back ------------------------
    out0 = (
        jnp.full((Rp,), jnp.inf, f32),        # best t
        jnp.zeros((Rp,), f32),                # u
        jnp.zeros((Rp,), f32),                # v
        jnp.full((Rp,), -1.0, f32),           # best pos
    )

    def ccond(c):
        j = c[0]
        return jnp.logical_and(j < n_chunks, j * Rc < nready)

    def cbody(c):
        j, out4, rounds, iters, lanes, vli, slots, ovf, povf_i = c
        sel = jax.lax.dynamic_slice(ids, (j * Rc,), (Rc,))
        (S6c, k, iters_c, lanes_c, vli_c, slots_c, ovf_c,
         povf_c) = run_chunk(sel)
        out4 = (
            out4[0].at[sel].set(S6c[1]),
            out4[1].at[sel].set(S6c[2]),
            out4[2].at[sel].set(S6c[3]),
            out4[3].at[sel].set(S6c[4]),
        )
        return (j + 1, out4, rounds + k, iters + iters_c,
                lanes + lanes_c, vli + vli_c, slots + slots_c,
                jnp.maximum(ovf, ovf_c), povf_i | povf_c.astype(i32))

    init = (jnp.asarray(0, i32), out0, jnp.asarray(0, i32),
            jnp.zeros((), f32), jnp.zeros((), f32), jnp.zeros((), f32),
            jnp.zeros((), f32), jnp.zeros((), f32), jnp.asarray(0, i32))
    (_, out4, rounds, iters, lanes, vli, slots, ovf,
     povf_i) = jax.lax.while_loop(ccond, cbody, init)
    return (out4[0], out4[1], out4[2], out4[3], cnt[0], rounds, iters,
            lanes, vli, slots, ovf, povf_i.astype(f32),
            jnp.max(cnt[1]))


def _up_pow2(x: int) -> int:
    return 1 << max(0, int(x) - 1).bit_length()


def wide_treelet_caps(tl: WideTreelets, portals_per_round: int = 4) -> dict:
    """Scene-derived starting values for the portal/round capacity
    knobs, so any-size scenes run unattended with zero knobs (the
    reference's scaling contract, mini_tree_builder.h:47-58).

    Model: a ray crossing a 3D scene cut into T similar-size treelets
    enters O(T^(1/3)) of them (a line through a k x k x k grid crosses
    ~3k cells); measured anchors: sponza-class T~500 fits in 32
    portals, San-Miguel 10M T=13363 needs 128 = ~5.4 * T^(1/3).  The
    super-level caps scale the same way against S supers and T/S
    treelets per super.  `max_rounds` is a pure while-loop bound (no
    memory cost), so it gets generous headroom for chunked/capped
    schedules that replay rounds.  These are STARTING values — the
    driver verifies the exact sticky overflow flags after the first
    run and auto-raises the named cap (see
    wide_treelet_intersect_tris)."""
    T = int(tl.table.shape[0])
    S = int(tl.sup_table.shape[0])
    max_portals = max(32, min(512, _up_pow2(5 * round(T ** (1.0 / 3.0)))))
    if S > 0:
        mps = max(16, min(256, _up_pow2(max(S // 4,
                                            6 * round(S ** (1.0 / 3.0))))))
        per_super = max(1, T // S)
        max_new = max(16, min(256, _up_pow2(per_super // 4)))
    else:
        mps, max_new = 16, 16
    max_rounds = max(64, 32 * max_portals // max(1, portals_per_round))
    return dict(max_portals=max_portals, max_rounds=max_rounds,
                mps=mps, max_new=max_new)


def wide_treelet_perf(tl: WideTreelets) -> dict:
    """Scale-aware PERFORMANCE defaults, re-measured HONESTLY in round
    5 (fixed chains + two-point steady, BENCHMARKS_r5.txt): at
    San-Miguel scale (T in the thousands) round-1 treelet runs are
    ~hundreds of lanes, so small kernel blocks win — block 1024 ->
    512 -> 256 measured 1777 -> 1221 -> 1012 ms/render (run-padding
    0.66 -> 0.49 -> 0.29); k=16 still beats many narrow rounds there.
    At sponza scale (T~500, runs mean ~840) block 512 / tail 128 /
    k=4 measured best (118.9 ms; 256/1024/2048 and k=8/16 all worse).
    Unlike wide_treelet_caps these are throughput knobs, not
    capacities — a wrong pick is slow, never incorrect (the reference
    has no analogue: its recursive traversal has no round structure,
    bvh.h:124-182)."""
    T = int(tl.table.shape[0])
    if T >= 2048:
        return dict(portals_per_round=16, tail_div=4,
                    block=256, tail_block=128)
    return dict(portals_per_round=4, tail_div=8,
                block=512, tail_block=128)


def wide_treelet_intersect_tris(
    tl: WideTreelets,
    rays: Ray,
    prim_ids=None,
    *,
    any_hit: bool = False,
    robust: bool = False,
    block: int | None = None,
    tail_block: int | None = None,
    top_block: int = 8192,
    top_stack: int | None = None,
    stack_depth: int | None = None,
    max_portals: int | None = None,
    max_rounds: int | None = None,
    sel_cap: int | None = None,
    portals_per_round: int | None = None,
    max_new: int | None = None,
    k2: int = 2,
    mps: int | None = None,
    a2_cap: int | None = None,
    max_runs: int = 4096,
    tail_cap: int | None = None,
    tail_k: int | None = None,
    packed_table: bool | None = None,
    check_overflow: bool = True,
    auto_caps: bool = True,
    return_diag: bool = False,
    interpret: bool = False,
) -> Hit:
    """Closest/any-hit over a wide-treelet scene (see module docstring).

    `prim_ids`: the BVH's permutation array, used to translate hit
    positions to primitive ids (pass None when primitives were
    pre-permuted, c_api/bvh.h:233-274 contract).

    `sel_cap`: rays scheduled per round (default Rp/4, clamped to a
    block multiple); rays beyond the cap simply wait a round.
    `portals_per_round`: portals expanded per selected ray per round.

    Capacity knobs {max_portals, max_rounds, mps, max_new} default to
    scene-derived values (wide_treelet_caps) and, when `auto_caps` and
    `check_overflow` are on, self-correct: every capacity has an exact
    sticky overflow flag, and on overflow the named cap is doubled (or
    jumped straight to the reported need) and the render re-runs —
    results from an overflowed run are never returned.  Each retry is
    a recompile, so the scene-derived starting values matter; retries
    print a warning to stderr.  The resolved caps are returned in the
    diag dict (`return_diag`) so steady-state benchmark chains can
    reuse them without re-probing."""
    R = rays.tmin.shape[0]
    # Exact stack sizing by default (no silent overflow possible; an
    # explicit smaller value is guarded by the sticky overflow flag).
    if top_stack is None:
        top_stack = tl.top_depth + 1
    if stack_depth is None:
        stack_depth = 7 * tl.wide_depth + 8
    perf = wide_treelet_perf(tl)
    if portals_per_round is None:
        portals_per_round = perf["portals_per_round"]
    if block is None:
        block = perf["block"]
    if tail_block is None:
        tail_block = perf["tail_block"]
    auto = wide_treelet_caps(tl, portals_per_round)
    caps = dict(
        max_portals=max_portals if max_portals is not None
        else auto["max_portals"],
        max_rounds=max_rounds if max_rounds is not None
        else auto["max_rounds"],
        mps=mps if mps is not None else auto["mps"],
        max_new=max_new if max_new is not None else auto["max_new"],
        stack_depth=stack_depth,
    )

    import sys as _sys

    # fused bf16 kernel table, packed once (auto-cap retries recompile
    # the render but reuse the packed table); narrow tables keep the
    # raw layout + 3x-split fetch (see _traverse_core's dual-path note)
    use_packed = (tl.table.shape[2] >= PACK_MIN_P
                  if packed_table is None else bool(packed_table))
    if use_packed:
        ktab = jax.jit(pack_kernel_table)(
            tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
    else:
        ktab = tl.table

    tail_cap_arg = tail_cap  # user-supplied (None = derive per attempt)
    for attempt in range(8):
        tb_a, fetch_chunk = phase_a_plan(
            tl.top_node_t.shape[1], top_block, top_stack=top_stack,
            max_portals=caps["max_portals"])
        Rp = _round_up(R, _lcm(block, tb_a))
        sel = sel_cap
        if sel is None:
            sel = max(block, _round_up(Rp // 4, block))
        sel = min(_round_up(sel, block), Rp)
        if tail_cap_arg is None:
            # _render's own default is sel//8; at scale the measured
            # winner is sel//4 (wide_treelet_perf) — derive it here
            # where T is known.  Recomputed per attempt: an auto-cap
            # retry that raises max_portals can change tb_a and hence
            # Rp/sel, and the derived tail tier must track them.
            tail_cap = max(tail_block, sel // perf["tail_div"])
        else:
            tail_cap = tail_cap_arg
        packed = jnp.zeros((8, Rp), jnp.float32)
        packed = packed.at[0:3, :R].set(rays.org.T)
        packed = packed.at[3:6, :R].set(rays.dir.T)
        packed = packed.at[6, :R].set(rays.tmin)
        packed = packed.at[7, :R].set(rays.tmax)
        if Rp > R:
            packed = packed.at[6, R:].set(1.0)  # tmin > tmax: inactive
            packed = packed.at[3, R:].set(1.0)

        (bt, bu, bv, pos_f, pcnt, rounds, iters, lanes, vli, slots, ovf,
         povf, top_hwm) = _render_jit(
            tl.top_node_t, ktab, packed, tl.sup_table,
            top_root=tl.top_root, any_hit=any_hit, robust=robust,
            block=block, tail_block=tail_block, top_block=tb_a,
            top_stack=top_stack, stack_depth=caps["stack_depth"],
            max_portals=caps["max_portals"],
            max_rounds=caps["max_rounds"], sel_cap=sel,
            portals_per_round=portals_per_round, interpret=interpret,
            sup_stack=tl.sup_depth + 1, max_new=caps["max_new"], k2=k2,
            mps=caps["mps"], a2_cap=a2_cap, max_runs=max_runs,
            tail_cap=tail_cap, fetch_chunk=fetch_chunk, tail_k=tail_k,
        )
        if not (R and check_overflow):
            break
        # the overflow checks read back scalars, which synchronizes the
        # whole render (~35 ms tunnel roundtrip); benchmarks that
        # pipeline calls can defer them and inspect the diag afterwards
        bumps: dict[str, int] = {}
        msgs: list[str] = []
        max_cnt = int(jnp.max(pcnt[:R]))
        if max_cnt > caps["max_portals"]:
            bumps["max_portals"] = _up_pow2(max_cnt)
            msgs.append(f"a ray entered {max_cnt} treelet boxes "
                        f"(max_portals={caps['max_portals']})")
        ovf_enc = int(ovf)  # hwm + 1000*overflow (see _traverse_core)
        stack_hwm = ovf_enc % 1000
        if ovf_enc >= 1000:
            bumps["stack_depth"] = 2 * caps["stack_depth"]
            msgs.append(f"traversal stack overflow "
                        f"(stack_depth={caps['stack_depth']})")
        bits = int(povf)
        if bits & 1:
            bumps["mps"] = 2 * caps["mps"]
            msgs.append(f"a ray entered more than mps={caps['mps']} supers")
        if bits & 2:
            bumps["max_new"] = 2 * caps["max_new"]
            msgs.append(f"a (ray, super) pair recorded more than "
                        f"max_new={caps['max_new']} treelet portals")
        if bits & 4:
            bumps["max_portals"] = max(
                bumps.get("max_portals", 0), 2 * caps["max_portals"])
            msgs.append(f"a merged portal list exceeded "
                        f"max_portals={caps['max_portals']}")
        if bits & 8:
            bumps["max_rounds"] = 2 * caps["max_rounds"]
            msgs.append(f"max_rounds={caps['max_rounds']} ended the "
                        f"render with portals still pending")
        if not bumps:
            break
        if not auto_caps or attempt == 7:
            raise ValueError(
                "wide-treelet capacity overflow: " + "; ".join(msgs)
                + " — raise the named cap, enable auto_caps, or rebuild "
                  "with different max_prims/super_prims")
        caps.update(bumps)
        print(f"# wide_treelet: capacity overflow ({'; '.join(msgs)}); "
              f"auto-raising to {bumps} and re-running (recompile)",
              file=_sys.stderr, flush=True)

    bt, bu, bv, pos_f = bt[:R], bu[:R], bv[:R], pos_f[:R]
    pos = pos_f.astype(jnp.int32)
    invalid = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    missed = pos < 0
    pos_u = jnp.where(missed, invalid, pos.astype(jnp.uint32))
    if prim_ids is not None:
        ids = jnp.asarray(prim_ids)
        prim_id = jnp.where(
            missed, invalid,
            ids[jnp.clip(pos, 0, ids.shape[0] - 1)].astype(jnp.uint32),
        )
    else:
        prim_id = pos_u
    hit = Hit(
        t=jnp.where(missed, jnp.inf, bt),
        u=bu, v=bv, prim_pos=pos_u, prim_id=prim_id,
        stats=TraversalStats(pcnt[:R],
                             jnp.full((R,), 1, jnp.int32) * rounds),
    )
    if return_diag:
        enc = int(ovf)
        stack_hwm = enc % 1000
        # Observed tight capacities: a clean verified run measured the
        # exact stack high-water marks and portal counts, so a
        # steady-state chain can re-run this scene with minimal
        # capacities WITHOUT hand-tuned knobs (the zero-knob contract,
        # mini_tree_builder.h:47-58). max_portals is only tightened on
        # single-level scenes — with supers, phase-A counts are super
        # portals while the cap also bounds the A2-merged treelet
        # lists, so the resolved cap stands.
        two_level_scene = tl.sup_table.shape[0] > 0
        observed = dict(caps)
        observed["stack_depth"] = max(8, stack_hwm)
        observed["top_stack"] = max(8, int(top_hwm))
        if R and not two_level_scene:
            observed["max_portals"] = max(
                8, _up_pow2(int(jnp.max(pcnt[:R]))))
        return hit, {"rounds": rounds, "block_iters": iters,
                     "lane_steps": lanes, "valid_lane_iters": vli,
                     "lane_slots": slots,
                     "stack_overflow": float(enc >= 1000),
                     "stack_hwm": stack_hwm,
                     "top_stack_hwm": int(top_hwm),
                     "portal_overflow": povf,
                     "caps": dict(caps), "caps_observed": observed}
    return hit


def wide_treelet_render_chain(tl: WideTreelets, rays, k: int, **kw):
    """Steady-state throughput probe: returns a zero-arg callable that
    runs the full render `k` times sequentially inside ONE jitted
    program (compiled once, reusable) and returns the final t row.

    The per-call host dispatch on a tunneled device costs ~100 ms,
    which a per-call benchmark conflates with the ~40 ms on-device
    render; chaining k renders in one program measures the sustained
    device rate (the analogue of the reference benchmark's median-of-N
    `profile()`, benchmark.cpp:60-71). Each iteration feeds a
    numerically-identical but data-dependent ray buffer forward so XLA
    cannot collapse the chain.

    Capacity knobs default to the same scene-derived values as
    wide_treelet_intersect_tris; pass that call's resolved `caps`
    (diag["caps"]) so the chain runs with verified capacities — the
    chain itself never checks overflow (it is a pure throughput
    probe over a configuration the verified call already validated).
    """
    from functools import partial

    def _kw(name, default):
        """None-aware kw lookup (an explicit 0 is a value, matching
        wide_treelet_intersect_tris's `is not None` convention)."""
        v = kw.get(name)
        return default if v is None else v

    perf = wide_treelet_perf(tl)
    ppr = _kw("portals_per_round", perf["portals_per_round"])
    auto = wide_treelet_caps(tl, ppr)
    block = _kw("block", perf["block"])
    tail_block = _kw("tail_block", perf["tail_block"])
    top_block = kw.get("top_block", 8192)
    max_portals = _kw("max_portals", auto["max_portals"])
    top_block, fetch_chunk = phase_a_plan(
        tl.top_node_t.shape[1], top_block,
        top_stack=_kw("top_stack", tl.top_depth + 1),
        max_portals=max_portals)
    R = rays.tmin.shape[0]
    Rp = _round_up(R, _lcm(block, top_block))
    # same normalization as the verified driver: block-rounded and
    # Rp-clamped, so a chain measures exactly the tier the verified
    # call validated (including the tail_cap derived from it)
    sel_cap = _kw("sel_cap", max(block, _round_up(Rp // 4, block)))
    sel_cap = min(_round_up(sel_cap, block), Rp)
    packed = jnp.zeros((8, Rp), jnp.float32)
    packed = packed.at[0:3, :R].set(rays.org.T)
    packed = packed.at[3:6, :R].set(rays.dir.T)
    packed = packed.at[6, :R].set(rays.tmin)
    packed = packed.at[7, :R].set(rays.tmax)
    if Rp > R:
        packed = packed.at[6, R:].set(1.0)
        packed = packed.at[3, R:].set(1.0)

    inner = partial(
        _render_jit, top_root=tl.top_root,
        any_hit=kw.get("any_hit", False), robust=kw.get("robust", False),
        block=block, tail_block=tail_block,
        top_block=top_block,
        top_stack=_kw("top_stack", tl.top_depth + 1),
        stack_depth=_kw("stack_depth", 7 * tl.wide_depth + 8),
        max_portals=max_portals,
        max_rounds=_kw("max_rounds", auto["max_rounds"]),
        sel_cap=sel_cap,
        portals_per_round=ppr, interpret=kw.get("interpret", False),
        sup_stack=tl.sup_depth + 1,
        max_new=_kw("max_new", auto["max_new"]),
        k2=kw.get("k2", 2), mps=_kw("mps", auto["mps"]),
        a2_cap=kw.get("a2_cap"), max_runs=kw.get("max_runs", 4096),
        tail_cap=_kw("tail_cap", max(tail_block,
                                     sel_cap // perf["tail_div"])),
        fetch_chunk=fetch_chunk, tail_k=kw.get("tail_k"))

    # pack the fused bf16 kernel table once, outside the chain jit
    # (narrow tables keep the raw layout, as in the non-chain driver)
    pk = kw.get("packed_table")
    use_packed = (tl.table.shape[2] >= PACK_MIN_P
                  if pk is None else bool(pk))
    if use_packed:
        ktab = jax.jit(pack_kernel_table)(
            tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
    else:
        ktab = tl.table

    @jax.jit
    def run(top_node_t, table, sup_table, packed):
        def body(i, c):
            bt = inner(top_node_t, table, c, sup_table)[0]
            # NaN-safe feed-forward. The previous `c + bt[0] * 0`
            # looks equivalent, but bt[0] is +inf whenever ray 0
            # MISSES, and inf * 0 is NaN — which silently poisoned
            # every ray of renders 2..k (NaN tmin/tmax deactivates
            # all lanes), so chains measured one real render plus
            # k-1 near-empty ones. This inflated every chained
            # throughput record from round 2 until round 5 exposed it
            # (a San-Miguel "marginal render" of 4.7 ms, beyond MXU
            # physics for its 600K fetch iterations). The min-reduce
            # is a finite hit distance on any scene with >= 1 hit;
            # nan_to_num guards even the all-miss case. XLA does not
            # fold the zero-mul (measured: full marginal cost on CPU
            # and TPU probes). SUBTRACTING +0.0 (not adding) keeps the
            # ray buffer bit-identical: x + (+0.0) flips -0.0 ray-dir
            # components to +0.0, which would flip those rays' octant
            # masks; x - (+0.0) == x for every x including -0.0.
            feed = jnp.nan_to_num(jnp.min(bt) * 0.0)
            return c - feed

        out = jax.lax.fori_loop(0, k - 1, body, packed)
        bt = inner(top_node_t, table, out, sup_table)[0]
        return bt

    return lambda: run(tl.top_node_t, ktab, tl.sup_table, packed)
