"""Fast mini-tree build: per-group Pallas kernel + array splice.

Same pipeline as `build_minitree` (reference:
src/bvh/v2/mini_tree_builder.h:47-310) — morton-grid grouping, per-group
binned-SAH mini-trees, area pruning, sweep top tree, splice — but step 4
(the per-group builds) runs as ONE Pallas kernel launch
(`build/group_kernel.py`) instead of the level-synchronous forest loop,
and the splice works directly on the kernel's [G, NCAP] block layout
with gathers (no scatters).

Output is bit-identical to `build_minitree` for the same inputs when
both run the same arithmetic (tests/test_group_kernel.py, interpret
mode): group ids, split decisions, SATO order, pruning cut and splice
order all reproduce the reference semantics, and the per-tree BFS slot
order of the kernel equals the level-synchronous forest's per-tree
allocation order. Under the Mosaic-compiled kernel on a real TPU,
SAH costs can differ from XLA's by 1 ULP (different FMA contraction),
occasionally flipping a near-tie split: the result is a different but
equally valid SAH tree (verified: prim coverage, bounds containment,
and hit parity hold). Rebuilds on a fixed backend stay deterministic,
which is the reference's actual contract (mini_tree_builder.h:122-124).

Host staging: the group capacity P (max merged-group size, rounded to
the 128-lane grid) is data-dependent, so grouping and packing run
host-side in numpy — same pattern as the wide-treelet table builder.
The kernel and the assembly are jitted device code.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu.build.canonicalize import canonicalize
from bvh_tpu.build.group_kernel import group_forest_build
from bvh_tpu.build.minitree import MiniTreeConfig, _grid_groups
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Bvh, Index, index_dtype_for
from bvh_tpu.traverse.refit import refit


@functools.lru_cache(maxsize=8)
def _staging_fn(config: MiniTreeConfig, g_cap: int):
    """Jitted grouping + deterministic order on the default device (same
    backend as the build kernel, so binning is bit-identical to
    `build_minitree` run there). Returns (counts_all [g_cap], order [n]):
    only the small counts array crosses to the host for (G, P) sizing;
    the [n]-sized order stays device-resident."""

    def fn(c):
        n = c.shape[0]
        group = jnp.minimum(_grid_groups(c, config)[0], g_cap - 1)
        prim_ids = jnp.arange(n, dtype=jnp.int32)
        # (group, prim id) sort == build_minitree's forest order (122).
        _, order = jax.lax.sort((group, prim_ids), num_keys=2)
        counts_all = jnp.zeros((g_cap,), jnp.int32).at[group].add(1)
        return counts_all, order

    return jax.jit(fn)


def _host_groups(centers, config: MiniTreeConfig):
    """Steps 2-3: group id per prim, pulled to host for sizing (kept for
    profiling tools; the build itself uses `_staging_fn`)."""
    n, dim = centers.shape
    g_cap = min(1 << (config.log2_grid_dim * dim), n)
    group = np.asarray(jax.jit(
        lambda c: jnp.minimum(_grid_groups(c, config)[0], g_cap - 1)
    )(centers))
    return group, g_cap


def build_minitree_fast(
    bb_min, bb_max, centers, config: MiniTreeConfig | None = None,
    *, interpret=False,
) -> Bvh:
    """Mini-tree build via the per-group kernel; bit-identical to
    `build_minitree` output for the same inputs on the same backend.

    Host staging is sizing only: group ids come back to the host to
    derive (G, P) and the (group, id) sort; the primitive data itself
    never leaves the device (the packed [16, G*P] block is gathered
    on-device), so device-resident inputs transfer just the [n] i32
    order vector plus per-group counts.
    """
    if config is None:
        config = MiniTreeConfig()
    bb_min = jnp.asarray(bb_min, jnp.float32)
    bb_max = jnp.asarray(bb_max, jnp.float32)
    centers = jnp.asarray(centers, jnp.float32)

    # One small readback ([g_cap] i32) sizes (G, P); order stays on
    # device (reading the [n] group vector back cost ~170 ms at 262K
    # over the tunnel).
    order, counts, statics, config = staging_plan(centers, config)
    dev_fn = _device_build(*statics, config, interpret)
    return dev_fn(bb_min, bb_max, centers, order, counts)


@functools.lru_cache(maxsize=32)
def _device_build_raw(n, dim, G, P, NCAP, g_cap, config: MiniTreeConfig,
                      interpret):
    """The traceable (unjitted) device program: on-device packing,
    kernel launch, and pruning/top-tree/splice. Exposed so callers can
    compose it into larger jitted programs (e.g. a steady-state build
    chain, or build + reinsertion fused into one dispatch)."""

    def fn(bb_min, bb_max, centers, order, counts):
        i32 = jnp.int32
        base_e = jnp.cumsum(counts, dtype=i32)   # [G] inclusive ends
        base = base_e - counts                   # [G] begins
        # pack [16, G*P] on device: slot (g, l) <- prim order[base[g]+l]
        s = jnp.arange(G * P, dtype=i32)
        g_s = s // P
        l_s = s % P
        ok = l_s < counts[g_s]
        q_s = jnp.clip(base[g_s] + l_s, 0, n - 1)
        src_prim = order[q_s]
        cc_g = jnp.where(ok, centers[src_prim].T, 0.0)
        mn_g = jnp.where(ok, bb_min[src_prim].T, 0.0)
        mx_g = jnp.where(ok, bb_max[src_prim].T, 0.0)
        pf = jnp.concatenate(
            [cc_g, mn_g, mx_g,
             jnp.zeros((16 - 3 * dim, G * P), jnp.float32)], axis=0)

        nbf, nbi, src, cnt = group_forest_build(
            pf, counts, dim=dim, P=P, NCAP=NCAP,
            min_leaf=config.min_leaf_size, max_leaf=config.max_leaf_size,
            log_cluster=config.sah.log_cluster_size,
            cost_ratio=config.sah.cost_ratio, interpret=interpret,
        )

        # final position q = base[gq] + lq  ->  kernel slot gq*P + lq
        q = jnp.arange(n, dtype=i32)
        gq = jnp.searchsorted(base_e, q, side="right").astype(i32)
        gq = jnp.clip(gq, 0, G - 1)
        off_q = base[gq]
        flat_q = gq * P + (q - off_q)
        return _assemble(nbf, nbi, src, cnt, order, base, flat_q, off_q,
                         n, dim, G, P, NCAP, g_cap, config)

    return fn


@functools.lru_cache(maxsize=32)
def _device_build(n, dim, G, P, NCAP, g_cap, config: MiniTreeConfig,
                  interpret):
    """Jitted `_device_build_raw`, cached per static shape so repeated
    builds pay one dispatch."""
    return jax.jit(
        _device_build_raw(n, dim, G, P, NCAP, g_cap, config, interpret))


def auto_grid_config(config: MiniTreeConfig, n: int,
                     dim: int) -> MiniTreeConfig:
    """Raise log2_grid_dim so MEAN bin occupancy stays <= 512.

    The group kernel's per-block working set scales with the fullest
    bin (P); the reference's fixed 16^dim grid hands any-size bins to
    CPU tasks (mini_tree_builder.h:169-187), but a Pallas block
    register-spills past P ~ a few thousand (measured: 1.12 GB of
    spill slots at P=5632, 10M prims). Same semantics, finer tiles —
    below ~2M prims the reference default is returned unchanged.
    Every consumer of a staging plan must use the SAME adjusted config
    for the device program (binning must match the plan)."""
    ld = config.log2_grid_dim
    while n > (1 << (ld * dim)) * 512 and ld * dim < 30:
        ld += 1
    if ld != config.log2_grid_dim:
        import dataclasses

        config = dataclasses.replace(config, log2_grid_dim=ld)
    return config


def staging_plan(centers, config: MiniTreeConfig | None = None):
    """Host staging alone: returns (order, counts_dev, statics, config)
    where statics = (n, dim, G, P, NCAP, g_cap) and config is the
    (possibly grid-adjusted, see auto_grid_config) config the device
    program MUST be traced with. Callers composing the device program
    into larger jitted chains (tools/bench_build.py) run this once,
    then trace `_device_build_raw(*statics, config, interpret)` inside
    their own jit."""
    if config is None:
        config = MiniTreeConfig()
    centers = jnp.asarray(centers, jnp.float32)
    n, dim = centers.shape
    config = auto_grid_config(config, n, dim)
    g_cap = min(1 << (config.log2_grid_dim * dim), n)
    counts_all_dev, order = _staging_fn(config, g_cap)(centers)
    counts_all = np.asarray(counts_all_dev)
    counts = counts_all[counts_all > 0]
    G = len(counts)
    P = int(max(128, ((counts.max() + 127) // 128) * 128))
    return (order, jnp.asarray(counts), (n, dim, G, P, 2 * P, g_cap),
            config)


def _assemble(nbf, nbi, src, cnt, order, base, flat_q, off_q, n, dim,
              G, P, NCAP, g_cap, config: MiniTreeConfig) -> Bvh:
    """Pruning + sweep top tree + gather splice over the kernel layout.

    Mirrors build_minitree steps 5-6 (reference: mini_tree_builder.h:
    207-310) on [G, NCAP]-flat arrays; every stage is jit-friendly.
    """
    dtype = jnp.float32
    idx_dtype = index_dtype_for(dtype)
    F = G * NCAP
    ids = jnp.arange(F, dtype=jnp.int32)
    g_of = ids // NCAP
    l_of = ids % NCAP
    cnt_of = cnt[g_of]
    valid = l_of < cnt_of
    is_root = (l_of == 0) & valid

    area = nbf[6]
    anc_min = nbf[7]
    begin_l = nbi[0]
    end_l = nbi[1]
    child_l = nbi[2]
    leaf = (child_l < 0) & valid

    # ---- step 5: pruning (reference: 207-247) ------------------------
    g2_cap = max(g_cap, min(4 * g_cap, n))
    if config.enable_pruning:
        num_real = jnp.maximum(G, 1)
        root_rows = jnp.arange(G, dtype=jnp.int32) * NCAP
        avg_area = jnp.sum(area[root_rows]) / jnp.asarray(num_real, dtype)
        thr = avg_area * jnp.asarray(config.pruning_area_ratio, dtype)
        ok = area >= thr
        anc_ok = anc_min >= thr  # root carries +BIG: always true there
        pruned_root = valid & anc_ok & (~ok | leaf)
        overflow = jnp.sum(pruned_root.astype(jnp.int32)) > g2_cap
        pruned_root = jnp.where(overflow, is_root, pruned_root)
        strict_below = jnp.where(overflow, valid & (l_of > 0),
                                 valid & (anc_min < thr))
    else:
        pruned_root = is_root
        strict_below = valid & (l_of > 0)

    # ---- step 6: sweep top tree over splice roots --------------------
    # (g, local slot) order == build_minitree's (tid, forest slot) order
    pr_key = jnp.where(pruned_root, ids, F)
    pr_sorted, _ = jax.lax.sort((pr_key, ids), num_keys=1)
    num_pr = jnp.sum(pruned_root.astype(jnp.int32))
    proot_of = jnp.where(
        jnp.arange(g2_cap, dtype=jnp.int32) < num_pr,
        pr_sorted[:g2_cap], -1,
    )
    real2 = proot_of >= 0
    proot_c = jnp.clip(proot_of, 0, F - 1)
    pr_mn = jnp.stack([nbf[2 * d][proot_c] for d in range(dim)], axis=1)
    pr_mx = jnp.stack([nbf[2 * d + 1][proot_c] for d in range(dim)],
                      axis=1)
    scene_mx = jnp.max(jnp.where(real2[:, None], pr_mx, -jnp.inf), axis=0)
    top_mn = jnp.where(real2[:, None], pr_mn, scene_mx)
    top_mx = jnp.where(real2[:, None], pr_mx, scene_mx)
    top_centers = bbox_ops.get_center(top_mn, top_mx)
    top_cfg = TopDownConfig(sah=config.sah, min_leaf_size=1,
                            max_leaf_size=1)
    top_raw = build_sweep(top_mn, top_mx, top_centers, top_cfg)
    top_cap = top_raw.index.shape[0]
    leaf_first = Index.first_id(top_raw.index).astype(jnp.int32)
    leaf_slot = top_raw.prim_ids[
        jnp.clip(leaf_first, 0, g2_cap - 1)].astype(jnp.int32)
    keep = real2[jnp.clip(leaf_slot, 0, g2_cap - 1)]
    top = canonicalize(top_raw, keep)
    top = refit(top)
    tc = top.node_count

    # ---- splice (reference: 262-308) ---------------------------------
    # Forest nodes strictly below a splice root are copied in sibling
    # pairs after the top tree, ordered by (g, local pair).
    NP = (NCAP - 1) // 2
    n_pairs = G * NP
    pair_ids = jnp.arange(n_pairs, dtype=jnp.int32)
    pg = pair_ids // NP
    pk = pair_ids % NP
    pflat = pg * NCAP + 1 + 2 * pk  # first member's flat id
    pair_live = strict_below[pflat]
    live_pairs = jnp.sum(pair_live.astype(jnp.int32))
    pair_rank = jnp.cumsum(pair_live.astype(jnp.int32)) - 1  # exclusive
    # live pairs in (g, k) order, compacted
    lp_key = jnp.where(pair_live, pair_ids, n_pairs)
    lp_sorted, _ = jax.lax.sort((lp_key, pair_ids), num_keys=1)

    def remap_index(flat_ids):
        """Kernel node (flat id) -> final packed index word."""
        f = jnp.clip(flat_ids, 0, F - 1)
        gg = f // NCAP
        ch = nbi[2][f]
        is_lf = ch < 0
        # leaf: global prim position = base[g] + local begin
        first_prim = base[gg] + nbi[0][f]
        count = nbi[1][f] - nbi[0][f]
        lw = Index.make_leaf(first_prim.astype(idx_dtype),
                             count.astype(idx_dtype), idx_dtype)
        # inner: child pair (g, (ch-1)/2) -> tc + 2*pair_rank
        kp = jnp.clip(gg * NP + (ch - 1) // 2, 0, n_pairs - 1)
        iw = Index.make_inner(
            (tc + 2 * pair_rank[kp]).astype(idx_dtype), idx_dtype)
        return jnp.where(is_lf, lw, iw)

    def bounds_of(flat_ids):
        f = jnp.clip(flat_ids, 0, F - 1)
        cols = []
        for d in range(dim):
            cols.append(nbf[2 * d][f])
            cols.append(nbf[2 * d + 1][f])
        return jnp.stack(cols, axis=1)

    # top-tree rows: leaves take their splice root's content
    ids_top = jnp.arange(top_cap, dtype=jnp.int32)
    valid_top = ids_top < tc
    top_is_leaf = Index.is_leaf(top.index) & valid_top
    tl_first = Index.first_id(top.index).astype(jnp.int32)
    tl_slot = top.prim_ids[jnp.clip(tl_first, 0, g2_cap - 1)].astype(
        jnp.int32)
    tl_root = proot_c[jnp.clip(tl_slot, 0, g2_cap - 1)]
    top_bounds = jnp.where(top_is_leaf[:, None], bounds_of(tl_root),
                           top.bounds)
    top_index = jnp.where(top_is_leaf, remap_index(tl_root), top.index)
    top_bounds = jnp.where(valid_top[:, None], top_bounds, 0)
    top_index = jnp.where(valid_top, top_index, 0)

    # spliced rows j (0-based after the top tree): source node =
    # lp_sorted[j//2]'s pair, member j&1
    n_spl = 2 * n_pairs
    j = jnp.arange(n_spl, dtype=jnp.int32)
    src_pair = lp_sorted[jnp.clip(j // 2, 0, n_pairs - 1)]
    sp_c = jnp.clip(src_pair, 0, n_pairs - 1)
    src_flat = (sp_c // NP) * NCAP + 1 + 2 * (sp_c % NP) + (j & 1)
    spl_valid = j < 2 * live_pairs
    spl_bounds = jnp.where(spl_valid[:, None], bounds_of(src_flat), 0)
    spl_index = jnp.where(spl_valid, remap_index(src_flat), 0)

    # assemble via one shift: final row i = top row i if i < tc else
    # spliced row (i - tc). tc is dynamic: roll the spliced block.
    final_cap = top_cap + n_spl
    fb = jnp.zeros((final_cap, 2 * dim), dtype)
    fi = jnp.zeros((final_cap,), idx_dtype)
    zero = jnp.zeros((), tc.dtype)
    fb = jax.lax.dynamic_update_slice(fb, spl_bounds, (tc, zero))
    fi = jax.lax.dynamic_update_slice(fi, spl_index, (tc,))
    ii = jnp.arange(final_cap, dtype=jnp.int32)
    in_top = ii < tc
    fb = jnp.where(in_top[:, None],
                   jnp.pad(top_bounds, ((0, n_spl), (0, 0))), fb)
    fi = jnp.where(in_top, jnp.pad(top_index, (0, n_spl)), fi)

    # prim permutation: final position q = base[g] + l holds
    # order[base[g] + src[g*P + l]] (src = kernel's source lanes);
    # the (g, l) decomposition is host-precomputed (flat_q, off_q).
    prim_final = order[jnp.clip(off_q + src[flat_q], 0, n - 1)]

    return Bvh(
        bounds=fb,
        index=fi,
        prim_ids=prim_final.astype(idx_dtype),
        node_count=tc + 2 * live_pairs,
        prim_count=jnp.asarray(n, jnp.int32),
    )
