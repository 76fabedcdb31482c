"""Sharded mini-tree build: per-device tile forests over the morton
groups, bit-identical to the single-device `build_minitree`.

This is the real multi-chip decomposition of the reference's
mini-tree pipeline (reference: src/bvh/v2/mini_tree_builder.h;
thread-pool tasks -> devices, shared memory -> ICI collectives,
SURVEY.md section 5.8):

1. Replicated pre-pass (host/numpy): morton grouping + the global
   (group, id) sort — identical to the single-device steps 2-3
   (`build/minitree.py::_grid_groups`), then contiguous group ranges
   are assigned to devices by balanced prim count.
2. `shard_map` phase A: every device runs the level-synchronous
   binned forest over its local groups only (the reference's per-task
   `BuildTask::run`, mini_tree_builder.h:122-139, with one device per
   task batch). No collectives inside the build loop.
3. `shard_map` phase B: pruning thresholds via `psum` (the global
   average root area, mini_tree_builder.h:216-219), strict-below
   marking, and tid-major compaction of the device's splice roots and
   node pairs; pair offsets via an all-gathered prefix sum.
4. Replicated glue: global splice-root table (concatenation of the
   per-device tid-major lists), sweep top tree + phantom erasure +
   refit (same code path as single-device), and final assembly by
   gathering every node slot from (top tree | owning device's pair
   block).

Bit-identity holds because the per-tree allocation order inside a
level-synchronous forest is a subsequence invariant under interleaving
(see the canonical-ordering note in build/minitree.py), all orderings
here are (tid, slot)-major, and every floating-point decision runs the
same jitted code on the same per-group operands.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bvh_tpu.build import frontier
from bvh_tpu.build.binned import _round as binned_round
from bvh_tpu.build.canonicalize import canonicalize
from bvh_tpu.build.minitree import MiniTreeConfig, _grid_groups
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Bvh, Index, index_dtype_for
from bvh_tpu.traverse.refit import refit


def _device_ranges(begins_np, counts_np, n, n_dev):
    """Assign contiguous group ranges to devices by balanced prim
    count: device of group g = floor(begin[g] * D / n) (monotone in g,
    so ranges are contiguous). Returns (dev_of_group, dstart, dlen)."""
    if n == 0:
        raise ValueError("cannot build over zero primitives")
    dev_of_group = np.minimum((begins_np.astype(np.int64) * n_dev) // n,
                              n_dev - 1).astype(np.int32)
    dstart = np.zeros(n_dev, np.int64)
    dlen = np.zeros(n_dev, np.int64)
    for d in range(n_dev):
        sel = dev_of_group == d
        if sel.any():
            dstart[d] = begins_np[sel][0]
            dlen[d] = counts_np[sel].sum()
    # empty devices: start where the previous ended
    for d in range(1, n_dev):
        if dlen[d] == 0:
            dstart[d] = dstart[d - 1] + dlen[d - 1]
    return dev_of_group, dstart, dlen


def build_minitree_sharded(
    bb_min,
    bb_max,
    centers,
    mesh: Mesh,
    config: MiniTreeConfig | None = None,
    prim_cap: int | None = None,
) -> Bvh:
    """Mini-tree build decomposed over `mesh` (1-D). Output equals
    `build_minitree(bb_min, bb_max, centers, config)` array-for-array
    on the valid prefix. `prim_cap` bounds one device's prim share
    (default: 2x the balanced share); a skewed scene that exceeds it
    raises."""
    if config is None:
        config = MiniTreeConfig()
    n, dim = centers.shape
    dtype = centers.dtype
    idx_dtype = index_dtype_for(dtype)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    g_cap = min(1 << (config.log2_grid_dim * dim), n)
    g2_cap = max(g_cap, min(4 * g_cap, n))

    # ---- replicated pre-pass (identical to single-device steps 2-3) --
    group, _ = _grid_groups(jnp.asarray(centers), config)
    group = np.asarray(jnp.minimum(group, g_cap - 1))
    prim_ids = np.arange(n, dtype=np.int32)
    order_np = np.lexsort((prim_ids, group)).astype(np.int32)
    group_s = group[order_np]
    counts_np = np.bincount(group, minlength=g_cap).astype(np.int64)
    begins_np = np.concatenate([[0], np.cumsum(counts_np)[:-1]])

    dev_of_group, dstart, dlen = _device_ranges(begins_np, counts_np, n, n_dev)
    if prim_cap is None:
        prim_cap = max(2 * math.ceil(n / n_dev), 512)
    if dlen.max() > prim_cap:
        raise ValueError(
            f"sharded mini-tree: device share {int(dlen.max())} exceeds "
            f"prim_cap {prim_cap}; raise prim_cap or rebalance"
        )
    Pcap = int(prim_cap)
    gloc = g_cap + 1  # +1: padding pseudo-group, always closed
    cap_local = 2 * Pcap + gloc + 1
    pair_cap = (cap_local - gloc) // 2

    # Per-device local inputs (host gather; sorted-order indexed).
    bb_min_np = np.asarray(bb_min)
    bb_max_np = np.asarray(bb_max)
    centers_np = np.asarray(centers)
    lorder = np.zeros((n_dev, Pcap), np.int32)
    lbegin = np.zeros((n_dev, gloc), np.int32)
    lend = np.zeros((n_dev, gloc), np.int32)
    closed = np.zeros((n_dev, gloc), bool)
    for d in range(n_dev):
        s, ln = int(dstart[d]), int(dlen[d])
        lorder[d, :ln] = order_np[s : s + ln]
        own = dev_of_group == d
        lbegin[d, :g_cap] = np.where(own, begins_np - s, ln).astype(np.int32)
        lend[d, :g_cap] = np.where(own, begins_np + counts_np - s, ln).astype(
            np.int32
        )
        closed[d, :g_cap] = ~own
        lbegin[d, g_cap] = ln  # padding group [ln, Pcap)
        lend[d, g_cap] = Pcap
        closed[d, g_cap] = True
    lbb_min = bb_min_np[lorder]  # [D, Pcap, dim] sorted-order indexed
    lbb_max = bb_max_np[lorder]
    lcenters = centers_np[lorder]

    tdc = TopDownConfig(
        sah=config.sah,
        min_leaf_size=config.min_leaf_size,
        max_leaf_size=config.max_leaf_size,
    )
    enable_pruning = config.enable_pruning
    area_ratio = config.pruning_area_ratio

    # ------------------------------------------------------------------
    def device_phase(lbb_min, lbb_max, lcenters, lorder, lbegin, lend,
                     closed, dstart_d):
        """Runs on one device (shard_map body; leading [1] axes)."""
        lbb_min = lbb_min[0]
        lbb_max = lbb_max[0]
        lcenters = lcenters[0]
        lorder = lorder[0]
        lbegin = lbegin[0]
        lend = lend[0]
        closed = closed[0]
        dstart_d = dstart_d[0]

        def vary(t):
            """Mark constant-derived loop carries as device-varying so
            while_loop carry types match their (data-dependent) outputs
            under shard_map's varying-axes tracking. Leaves that are
            already varying are left alone (pcast rejects them)."""

            def one(x):
                try:
                    return jax.lax.pcast(x, (axis,), to="varying")
                except ValueError:
                    return x

            return jax.tree.map(one, t)

        local_pos = jnp.arange(Pcap, dtype=jnp.int32)
        forest = frontier.init_forest(
            lbb_min, lbb_max, local_pos, lbegin, lend,
            config.min_leaf_size, cap_local, force_closed=closed,
        )
        forest = vary(forest)
        forest = jax.lax.while_loop(
            lambda s: jnp.any(s.open_),
            lambda s: binned_round(s, lbb_min, lbb_max, lcenters, tdc),
            forest,
        )

        ids_f = jnp.arange(cap_local, dtype=jnp.int32)
        valid_f = ids_f < forest.node_count
        is_root_slot = ids_f < gloc
        sizes_root = lend - lbegin
        real = (~closed) & (sizes_root > 0)
        real_root = is_root_slot & jnp.pad(real, (0, cap_local - gloc))
        area_f = bbox_ops.get_half_area(
            forest.bounds[:, 0::2], forest.bounds[:, 1::2]
        )
        leaf_f = Index.is_leaf(forest.index) & valid_f
        inner_f = ~leaf_f & valid_f
        first_f = Index.first_id(forest.index).astype(jnp.int32)

        parents_f = jnp.zeros((cap_local,), jnp.int32)
        lch = jnp.where(inner_f, first_f, cap_local)
        rch = jnp.where(inner_f, first_f + 1, cap_local)
        parents_f = parents_f.at[lch].set(ids_f, mode="drop")
        parents_f = parents_f.at[rch].set(ids_f, mode="drop")

        # tid propagation: GLOBAL group id per node (local slot < g_cap
        # maps to the same global group id because groups keep their
        # global slot in the local table).
        def tid_cond(st):
            done, _ = st
            return jnp.any(valid_f & ~done)

        def tid_body(st):
            done, tid = st
            can = valid_f & ~done & done[parents_f]
            tid = jnp.where(can, tid[parents_f], tid)
            return done | can, tid

        tid0 = jnp.where(is_root_slot, ids_f, 0)
        done0 = ~valid_f | is_root_slot
        _, tid_f = jax.lax.while_loop(
            tid_cond, tid_body, vary((done0, tid0))
        )

        # ---- pruning (global threshold via psum) ---------------------
        if enable_pruning:
            loc_sum = jnp.sum(jnp.where(real_root, area_f, 0))
            loc_cnt = jnp.sum(real.astype(jnp.int32))
            g_sum = jax.lax.psum(loc_sum, axis)
            g_cnt = jnp.maximum(jax.lax.psum(loc_cnt, axis), 1)
            thr = (g_sum / g_cnt.astype(dtype)) * jnp.asarray(
                area_ratio, dtype
            )
            ok = area_f >= thr

            def td_body(st):
                done, anc_ok = st
                can = valid_f & ~done & done[parents_f]
                anc_ok = jnp.where(can, anc_ok[parents_f] & ok[parents_f],
                                   anc_ok)
                return done | can, anc_ok

            _, anc_ok = jax.lax.while_loop(
                tid_cond, td_body, vary((done0, real_root))
            )
            pruned_root = anc_ok & (~ok | leaf_f) & valid_f
            pruned_root = jnp.where(
                is_root_slot, real_root & (~ok | leaf_f), pruned_root
            )
            overflow = (
                jax.lax.psum(jnp.sum(pruned_root.astype(jnp.int32)), axis)
                > g2_cap
            )
            pruned_root = jnp.where(overflow, real_root, pruned_root)
        else:
            pruned_root = real_root

        # ---- strict-below marking ------------------------------------
        def sb_body(st):
            done, below = st
            can = valid_f & ~done & done[parents_f]
            below = jnp.where(can, pruned_root[parents_f] | below[parents_f],
                              below)
            return done | can, below

        _, strict_below = jax.lax.while_loop(
            tid_cond, sb_body, vary((done0, jnp.zeros((cap_local,), bool)))
        )

        # ---- tid-major pair compaction -------------------------------
        n_pairs = pair_cap
        pair_ids = jnp.arange(n_pairs, dtype=jnp.int32)
        pair_base = gloc + 2 * pair_ids
        pair_live = strict_below[jnp.clip(pair_base, 0, cap_local - 1)] & (
            pair_base < forest.node_count
        )
        live_pairs = jnp.sum(pair_live.astype(jnp.int32))
        pair_tid = tid_f[jnp.clip(pair_base, 0, cap_local - 1)]
        pair_key = jnp.where(pair_live, pair_tid, jnp.int32(g_cap + 1))
        _, _, pair_sorted = jax.lax.sort(
            (pair_key, pair_base, pair_ids), num_keys=2
        )
        pair_rank = jnp.zeros((n_pairs,), jnp.int32).at[pair_sorted].set(
            jnp.arange(n_pairs, dtype=jnp.int32)
        )

        # Pair offsets across devices (exclusive prefix over the mesh).
        d_idx = jax.lax.axis_index(axis)
        all_live = jax.lax.all_gather(live_pairs, axis)  # [D]
        my_offset = jnp.sum(
            jnp.where(jnp.arange(n_dev) < d_idx, all_live, 0)
        )

        # Remap forest index words to the final numbering, except the
        # (dynamic) top-tree node count which the glue adds afterwards:
        # inner first -> 2 * (global pair rank) [+ tc later], leaf
        # first -> global prim position.
        def remap(words):
            first = Index.first_id(words).astype(jnp.int32)
            is_lf = Index.is_leaf(words)
            k = jnp.clip((first - gloc) >> 1, 0, n_pairs - 1)
            new_inner = 2 * (my_offset + pair_rank[k])
            new_leaf_first = first + dstart_d
            w_inner = Index.make_inner(jnp.maximum(new_inner, 0), idx_dtype)
            w_leaf = Index.make_leaf(
                jnp.maximum(new_leaf_first, 0), Index.prim_count(words),
                idx_dtype,
            )
            return jnp.where(is_lf, w_leaf, w_inner)

        remapped = remap(forest.index)

        # Pair block: rows in tid-major order.
        src_pair = pair_sorted  # rank -> pair id
        src_base = gloc + 2 * src_pair
        blk_rows0 = forest.bounds[jnp.clip(src_base, 0, cap_local - 1)]
        blk_rows1 = forest.bounds[jnp.clip(src_base + 1, 0, cap_local - 1)]
        blk_idx0 = remapped[jnp.clip(src_base, 0, cap_local - 1)]
        blk_idx1 = remapped[jnp.clip(src_base + 1, 0, cap_local - 1)]
        blk_bounds = jnp.stack([blk_rows0, blk_rows1], axis=1).reshape(
            2 * n_pairs, 2 * dim
        )
        blk_index = jnp.stack([blk_idx0, blk_idx1], axis=1).reshape(
            2 * n_pairs
        )

        # Splice-root list (tid-major).
        pr_key = jnp.where(pruned_root, tid_f, jnp.int32(g_cap + 1))
        pr_key_sorted, pr_slot_sorted = jax.lax.sort(
            (pr_key, ids_f), num_keys=2
        )
        num_pr = jnp.sum(pruned_root.astype(jnp.int32))
        g2l = min(g2_cap, cap_local)
        pr_slots = pr_slot_sorted[:g2l]
        pr_valid = jnp.arange(g2l, dtype=jnp.int32) < num_pr
        pr_tid = jnp.where(pr_valid, pr_key_sorted[:g2l], jnp.int32(g_cap + 1))
        pr_bounds = forest.bounds[jnp.clip(pr_slots, 0, cap_local - 1)]
        pr_words = remapped[jnp.clip(pr_slots, 0, cap_local - 1)]
        pr_bounds = jnp.where(pr_valid[:, None], pr_bounds, 0)
        pr_words = jnp.where(pr_valid, pr_words, jnp.zeros((), idx_dtype))

        # Final local primitive order (global prim ids).
        out_order = lorder[jnp.clip(forest.order, 0, Pcap - 1)]

        def lead(x):
            return x[None]

        return (
            lead(blk_bounds), lead(blk_index), lead(live_pairs),
            lead(pr_tid), lead(pr_bounds), lead(pr_words), lead(num_pr),
            lead(out_order),
        )

    spec = P(axis)
    dstart_arr = jnp.asarray(dstart, jnp.int32)
    phase = jax.shard_map(
        device_phase,
        mesh=mesh,
        in_specs=(spec,) * 8,
        out_specs=(spec,) * 8,
    )
    (blk_bounds, blk_index, live_pairs, pr_tid, pr_bounds, pr_words,
     num_pr, out_order) = phase(
        jnp.asarray(lbb_min), jnp.asarray(lbb_max), jnp.asarray(lcenters),
        jnp.asarray(lorder), jnp.asarray(lbegin), jnp.asarray(lend),
        jnp.asarray(closed), dstart_arr,
    )

    # ---- replicated glue ---------------------------------------------
    return _glue(
        blk_bounds, blk_index, live_pairs, pr_tid, pr_bounds, pr_words,
        num_pr, out_order, jnp.asarray(dstart, jnp.int32),
        n, dim, dtype, idx_dtype, g_cap, g2_cap, config,
    )


def _glue(blk_bounds, blk_index, live_pairs, pr_tid, pr_bounds, pr_words,
          num_pr, out_order, dstart, n, dim, dtype, idx_dtype, g_cap, g2_cap,
          config):
    """Global splice-root table -> sweep top tree -> final assembly.
    Mirrors build/minitree.py step 6 on the gathered tables."""
    n_dev, g2l = pr_tid.shape

    # Global tid-major splice-root table. Device tid ranges are
    # contiguous and ascending, and each per-device list is already
    # tid-major, so a stable sort by (tid-valid key) yields the global
    # canonical order.
    flat_tid = pr_tid.reshape(-1)
    flat_key = jnp.where(flat_tid <= g_cap, flat_tid, jnp.int32(1 << 30))
    order_pr = jnp.argsort(flat_key, stable=True)
    take = order_pr[:g2_cap]
    num_pr_total = jnp.sum(num_pr)
    real2 = jnp.arange(g2_cap, dtype=jnp.int32) < num_pr_total
    tbl_bounds = pr_bounds.reshape(-1, 2 * dim)[take]
    tbl_words = pr_words.reshape(-1)[take]

    pr_mn, pr_mx = tbl_bounds[:, 0::2], tbl_bounds[:, 1::2]
    scene_mx = jnp.max(jnp.where(real2[:, None], pr_mx, -jnp.inf), axis=0)
    top_mn = jnp.where(real2[:, None], pr_mn, scene_mx)
    top_mx = jnp.where(real2[:, None], pr_mx, scene_mx)
    top_centers = bbox_ops.get_center(top_mn, top_mx)
    top_cfg = TopDownConfig(sah=config.sah, min_leaf_size=1, max_leaf_size=1)
    top_raw = build_sweep(top_mn, top_mx, top_centers, top_cfg)

    top_cap = top_raw.index.shape[0]
    leaf_first = Index.first_id(top_raw.index).astype(jnp.int32)
    leaf_slot = top_raw.prim_ids[jnp.clip(leaf_first, 0, g2_cap - 1)].astype(
        jnp.int32
    )
    keep = real2[jnp.clip(leaf_slot, 0, g2_cap - 1)]
    top = canonicalize(top_raw, keep)
    top = refit(top)
    tc = top.node_count

    # Shift the deferred top-tree node count into every inner word
    # (packed format: first lives at bits >= 4; the device phase stored
    # first = 2*global_pair_rank, the final value is tc + that).
    def add_tc_first(words):
        is_inner = Index.is_inner(words)
        add = tc.astype(idx_dtype) << jnp.asarray(4, idx_dtype)
        return jnp.where(is_inner, words + add, words)

    blk_index = add_tc_first(blk_index.reshape(n_dev, -1))
    tbl_words = add_tc_first(tbl_words)

    # Top-tree nodes: inner stay; leaves take their splice root content.
    ids_top = jnp.arange(top_cap, dtype=jnp.int32)
    top_is_leaf = Index.is_leaf(top.index) & (ids_top < tc)
    tl_first = Index.first_id(top.index).astype(jnp.int32)
    tl_slot = top.prim_ids[jnp.clip(tl_first, 0, g2_cap - 1)].astype(jnp.int32)
    tl_slot = jnp.clip(tl_slot, 0, g2_cap - 1)
    top_bounds = jnp.where(
        top_is_leaf[:, None], tbl_bounds[tl_slot], top.bounds
    )
    top_index = jnp.where(top_is_leaf, tbl_words[tl_slot], top.index)
    valid_top = ids_top < tc
    top_bounds = jnp.where(valid_top[:, None], top_bounds, 0)
    top_index = jnp.where(valid_top, top_index, jnp.zeros((), idx_dtype))

    # Final node arrays: slot j >= tc comes from the owning device's
    # tid-major pair block.
    pair_cap2 = blk_bounds.shape[1]  # rows per device block (2*pair_cap)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(2 * live_pairs.reshape(-1))]
    )  # [D+1] rows before device d
    final_cap = top_cap + n_dev * pair_cap2
    slots = jnp.arange(final_cap, dtype=jnp.int32)
    rel = slots - tc
    dev = jnp.clip(
        jnp.searchsorted(offsets, rel, side="right").astype(jnp.int32) - 1,
        0, n_dev - 1,
    )
    local = jnp.clip(rel - offsets[dev], 0, pair_cap2 - 1)
    from_blk_bounds = blk_bounds.reshape(n_dev, pair_cap2, 2 * dim)[dev, local]
    from_blk_index = blk_index.reshape(n_dev, -1)[dev, local]
    total_rows = offsets[-1]
    in_pairs = (rel >= 0) & (rel < total_rows)
    in_top = slots < tc
    top_b_pad = jnp.zeros((final_cap, 2 * dim), dtype).at[:top_cap].set(
        top_bounds
    )
    top_i_pad = jnp.zeros((final_cap,), idx_dtype).at[:top_cap].set(top_index)
    bounds = jnp.where(
        in_top[:, None], top_b_pad, jnp.where(in_pairs[:, None],
                                              from_blk_bounds, 0)
    )
    index = jnp.where(
        in_top, top_i_pad, jnp.where(in_pairs, from_blk_index,
                                     jnp.zeros((), idx_dtype))
    )

    # prim_ids: concatenation of the devices' live prefixes.
    Pcap = out_order.shape[1]
    pos = jnp.arange(n, dtype=jnp.int32)
    dstart_ext = jnp.concatenate([dstart, jnp.asarray([n], jnp.int32)])
    pdev = jnp.clip(
        jnp.searchsorted(dstart_ext, pos, side="right").astype(jnp.int32) - 1,
        0, out_order.shape[0] - 1,
    )
    plocal = jnp.clip(pos - dstart[pdev], 0, Pcap - 1)
    prim_ids = out_order[pdev, plocal].astype(idx_dtype)

    return Bvh(
        bounds=bounds,
        index=index,
        prim_ids=prim_ids,
        node_count=(tc + total_rows).astype(jnp.int32),
        prim_count=jnp.asarray(n, jnp.int32),
    )
