"""LBVH builder: Karras-style linear BVH, fully parallel, zero
sequential rounds. The TPU-native *fast* builder.

The reference's v2 library has no LBVH, but its lineage does (the
README performance chart compares against "bvh v1 (LBVH)",
reference: README.md:15-22); this module is the TPU-native fast-build
path complementing the exact reference-parity builders
(build/binned.py, build/sweep.py, build/minitree.py), whose
level-synchronous rounds are latency-bound on TPU (each round pays a
fixed multi-ms XLA dispatch/fusion floor; see PERFORMANCE.md).

Design (all O(1) sequential depth — no data-dependent loops):
1. Morton-encode primitive centers on a 2^k grid per axis, sort once
   (`jax.lax.sort`), ties broken by primitive index (Karras 2012,
   "Maximally Parallel Construction of ...", sec. 3).
2. Determine every internal node's range/split with vectorized
   exponential + binary searches over common-prefix lengths — fixed
   log2(n) iterations, fully unrolled by XLA, each a gather + compare.
3. Node bounds are NOT refit level-by-level: every Karras subtree
   covers a contiguous range of morton-sorted positions, so each
   node's bbox is a range min/max answered in O(1) from a doubling
   sparse table (2 gathers per node), built in log2(n) vector steps.
4. SATO child ordering (larger-area child left, reference:
   top_down_sah_builder.h:100-108) via a post-pass pair-content swap.

Output layout matches the reference exactly: sibling pairs with the
left child at an odd index (reference: bvh.h:33-51), packed Index
words (reference: index.h), interleaved bounds rows (reference:
node.h) — so traversal, refit, serialization, reinsertion, and the C
interop all work unchanged on LBVH-built trees.
"""

from __future__ import annotations

import dataclasses

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
from bvh_tpu.core.utils import morton_encode, safe_inverse


@dataclasses.dataclass(frozen=True)
class LbvhConfig:
    """Grid resolution per axis defaults to the largest that fits dim
    axes in a uint32 morton code (10 bits for 3D, like GPU LBVHs)."""

    log2_grid_dim: int | None = None


def _grid_bits(dim: int, config: LbvhConfig) -> int:
    if config.log2_grid_dim is not None:
        return config.log2_grid_dim
    return max(1, 30 // dim if dim != 2 else 15)


def _morton_codes(centers, bits: int):
    n, dim = centers.shape
    dtype = centers.dtype
    grid_dim = 1 << bits
    cmin = jnp.min(centers, axis=0)
    cmax = jnp.max(centers, axis=0)
    scale = jnp.asarray(grid_dim, dtype) * safe_inverse(cmax - cmin)
    p = centers * scale + (-cmin * scale)
    p = jnp.where(p > 0, p, 0)
    coord = jnp.minimum(p, grid_dim - 1).astype(jnp.uint32)
    return morton_encode(coord, dim).astype(jnp.uint32)


def _sparse_table_union(pmn, pmx, lo, hi):
    """Range union of [lo, hi] (inclusive, positions) over per-position
    boxes via a doubling sparse table: log2(n) build steps, 2 gathers
    per query. pmn/pmx: [n, d]; lo/hi: [q]. Returns ([q, d], [q, d])."""
    n, d = pmn.shape
    levels = max(1, n.bit_length())  # k = floor(log2(len)) <= levels-1
    big = jnp.asarray(jnp.finfo(pmn.dtype).max, pmn.dtype)
    tmn = [pmn]
    tmx = [pmx]
    for k in range(levels - 1):
        off = 1 << k
        prev_mn, prev_mx = tmn[-1], tmx[-1]
        sh_mn = jnp.concatenate([prev_mn[off:], jnp.full((off, d), big, pmn.dtype)])
        sh_mx = jnp.concatenate([prev_mx[off:], jnp.full((off, d), -big, pmx.dtype)])
        tmn.append(jnp.minimum(prev_mn, sh_mn))
        tmx.append(jnp.maximum(prev_mx, sh_mx))
    Tmn = jnp.stack(tmn)  # [levels, n, d]
    Tmx = jnp.stack(tmx)

    length = hi - lo + 1
    k = jnp.maximum(31 - jax.lax.clz(jnp.maximum(length, 1)), 0)  # floor log2
    right = jnp.clip(hi - (1 << k) + 1, 0, n - 1)
    lo_c = jnp.clip(lo, 0, n - 1)
    mn = jnp.minimum(Tmn[k, lo_c], Tmn[k, right])
    mx = jnp.maximum(Tmx[k, lo_c], Tmx[k, right])
    return mn, mx


def build_lbvh(bb_min, bb_max, centers, config: LbvhConfig | None = None) -> Bvh:
    """Build a BVH with the Karras LBVH algorithm. Fully jittable,
    static shapes, no sequential rounds; leaves hold one primitive."""
    if config is None:
        config = LbvhConfig()
    n, dim = centers.shape
    dtype = centers.dtype
    idx_dtype = index_dtype_for(dtype)
    cap = node_capacity_for(n)

    if n == 1:
        bounds = jnp.zeros((cap, 2 * dim), dtype)
        bounds = bounds.at[0].set(make_node_bounds_row(bb_min[0], bb_max[0]))
        index = jnp.zeros((cap,), idx_dtype).at[0].set(
            Index.make_leaf(0, 1, idx_dtype)
        )
        return Bvh(
            bounds=bounds,
            index=index,
            prim_ids=jnp.zeros((1,), idx_dtype),
            node_count=jnp.asarray(1, jnp.int32),
            prim_count=jnp.asarray(1, jnp.int32),
        )

    bits = _grid_bits(dim, config)
    codes = _morton_codes(centers, bits)
    mc, order = jax.lax.sort(
        (codes, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    mc_i = mc.astype(jnp.int32)

    # delta(i, j): common-prefix length of keys i and j; equal codes
    # fall back to index bits (Karras sec. 4); -1 outside [0, n).
    def delta(i, j):
        ok = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = jnp.bitwise_xor(mc_i[i], mc_i[jc])
        same = x == 0
        x2 = jnp.bitwise_xor(i, jc)
        d = jnp.where(same, 32 + jax.lax.clz(x2), jax.lax.clz(x))
        return jnp.where(ok, d, -1)

    ii = jnp.arange(n - 1, dtype=jnp.int32)  # internal nodes 0..n-2
    d_dir = jnp.sign(delta(ii, ii + 1) - delta(ii, ii - 1)).astype(jnp.int32)
    d_dir = jnp.where(d_dir == 0, 1, d_dir)
    delta_min = delta(ii, ii - d_dir)

    kmax = max(1, (n - 1).bit_length()) + 1

    # Binary search for the exact range length. Karras uses a per-node
    # exponential search first to bound per-thread work on a GPU; on
    # TPU every lane pays every step anyway, and over sorted morton
    # keys delta(i, i + L*d) is non-increasing in L (the common prefix
    # of a sorted range is the min over adjacent prefixes), so one
    # monotone binary search over the full [0, 2^ceil(log2 n)] range
    # replaces both searches at half the step count.
    def len_body(k, l):
        t = jnp.int32(1 << (kmax - 1 - k))
        probe = ii + (l + t) * d_dir
        take = delta(ii, probe) > delta_min
        return jnp.where(take, l + t, l)

    l = jax.lax.fori_loop(0, kmax, len_body, jnp.zeros((n - 1,), jnp.int32))
    jj = ii + l * d_dir  # other end of the range

    # Binary search for the split position: largest s with
    # delta(i, i + (s+t)*d) > delta(i, j). The predicate is monotone in
    # the probe position (common-prefix length drops past the split),
    # so the shrinking-step scan below converges; t_k = ceil(l/2^(k+1))
    # reproduces the reference's halving sequence, and repeated t=1
    # steps are harmless under monotonicity.
    delta_node = delta(ii, jj)

    def split_body(k, s):
        t_k = jnp.maximum(-((-l) >> (k + 1)), 1)  # ceil(l / 2^(k+1))
        probe = ii + (s + t_k) * d_dir
        take = (delta(ii, probe) > delta_node) & (s + t_k < l)
        return jnp.where(take, s + t_k, s)

    s = jax.lax.fori_loop(0, kmax, split_body, jnp.zeros((n - 1,), jnp.int32))
    gamma = ii + s * d_dir + jnp.minimum(d_dir, 0)

    lo = jnp.minimum(ii, jj)
    hi = jnp.maximum(ii, jj)
    left_is_leaf = lo == gamma
    right_is_leaf = hi == gamma + 1

    # ---- map to the reference pair layout --------------------------
    # Internal k's child pair sits at slots (2k+1, 2k+2): left child at
    # an odd index (reference: bvh.h:33-39). Karras left child covers
    # [lo, gamma] (id gamma if leaf else internal gamma), right covers
    # [gamma+1, hi] (id gamma+1).
    slot_of_internal = jnp.zeros((n - 1,), jnp.int32)  # root -> 0
    li = jnp.where(left_is_leaf, n - 1, gamma)  # internal id or sentinel
    ri = jnp.where(right_is_leaf, n - 1, gamma + 1)
    slot_of_internal = slot_of_internal.at[li].set(2 * ii + 1, mode="drop")
    slot_of_internal = slot_of_internal.at[ri].set(2 * ii + 2, mode="drop")
    slot_of_leaf = jnp.zeros((n,), jnp.int32)
    lleaf = jnp.where(left_is_leaf, gamma, n)
    rleaf = jnp.where(right_is_leaf, gamma + 1, n)
    slot_of_leaf = slot_of_leaf.at[lleaf].set(2 * ii + 1, mode="drop")
    slot_of_leaf = slot_of_leaf.at[rleaf].set(2 * ii + 2, mode="drop")

    # ---- bounds via the sparse-table range union -------------------
    pmn = bb_min[order]
    pmx = bb_max[order]
    int_mn, int_mx = _sparse_table_union(pmn, pmx, lo, hi)

    # ---- assemble node arrays (2n-1 slots, all written by where) ----
    slots = jnp.arange(cap, dtype=jnp.int32)
    int_slot_src = jnp.zeros((cap,), jnp.int32).at[slot_of_internal].set(
        ii, mode="drop"
    )
    leaf_slot_src = jnp.full((cap,), n, jnp.int32).at[slot_of_leaf].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    is_leaf_slot = leaf_slot_src < n
    leaf_src_c = jnp.clip(leaf_slot_src, 0, n - 1)
    int_src_c = jnp.clip(int_slot_src, 0, n - 2)

    leaf_rows = make_node_bounds_row(pmn, pmx)
    int_rows = make_node_bounds_row(int_mn, int_mx)
    bounds = jnp.where(
        is_leaf_slot[:, None], leaf_rows[leaf_src_c], int_rows[int_src_c]
    )
    leaf_words = Index.make_leaf(
        jnp.arange(n, dtype=jnp.int32), jnp.ones((n,), jnp.int32), idx_dtype
    )
    int_words = Index.make_inner(2 * ii + 1, idx_dtype)
    index = jnp.where(
        is_leaf_slot, leaf_words[leaf_src_c], int_words[int_src_c]
    )
    valid = slots < 2 * n - 1
    bounds = jnp.where(valid[:, None], bounds, 0)
    index = jnp.where(valid, index, jnp.zeros((), idx_dtype))

    # ---- SATO: larger-area child left (pair-content swap) ----------
    pair_l = 2 * jnp.arange((cap - 1) // 2, dtype=jnp.int32) + 1
    pair_l = jnp.minimum(pair_l, cap - 2)
    row_l = bounds[pair_l]
    row_r = bounds[pair_l + 1]
    area_l = bbox_ops.get_half_area(row_l[:, 0::2], row_l[:, 1::2])
    area_r = bbox_ops.get_half_area(row_r[:, 0::2], row_r[:, 1::2])
    live_pair = (pair_l + 1) < 2 * n - 1
    swap = (area_l < area_r) & live_pair
    pair_of_slot = jnp.clip((slots - 1) >> 1, 0, pair_l.shape[0] - 1)
    swap_of_slot = swap[pair_of_slot] & (slots >= 1)
    partner = jnp.where(
        (slots & 1) == 1, jnp.minimum(slots + 1, cap - 1), jnp.maximum(slots - 1, 0)
    )
    bounds = jnp.where(swap_of_slot[:, None], bounds[partner], bounds)
    index = jnp.where(swap_of_slot, index[partner], index)

    return Bvh(
        bounds=bounds,
        index=index,
        prim_ids=order.astype(idx_dtype),
        node_count=jnp.asarray(2 * n - 1, jnp.int32),
        prim_count=jnp.asarray(n, jnp.int32),
    )
