"""Parallel reinsertion optimizer (Meister & Bittner).

TPU-native counterpart of `ReinsertionOptimizer`
(reference: src/bvh/v2/reinsertion_optimizer.h). Per iteration
(max_iter_count, default 3):

1. candidates = top `batch_size_ratio * node_count` nodes by half-area
   (reference: find_candidates, 88-105) — here a `jax.lax.top_k`;
2. for every candidate in parallel, search the best reinsertion target
   with a branch-and-bound walk up from the node and down into the
   siblings' subtrees (reference: find_reinsertion, 107-188) — here a
   batched `while_loop` with fixed-size per-candidate stacks laid out
   [depth, batch] and driven by lane masks (dense VPU selects; the
   [batch, depth] scatter layout cost ~2x more per step on this
   backend);
3. sort by area gain descending and apply greedily, skipping any
   reinsertion whose 5-node conflict set {to, from, sibling(from),
   parent(to), parent(from)} touches an already-applied one
   (reference: get_conflicts + the serial loop, 227-234, 254-265).

Step 3's greedy pass is sequential in the reference; a literal
`lax.scan` translation costs ~8 us/step x batch (~200 ms at 262K
prims). Here it is computed as the *lexicographically-first greedy
set* via an iterative fixpoint (`_greedy_accept`) that decides, each
round, every candidate whose conflict nodes carry no lower-priority
live claimant — the fixpoint's unique solution IS the serial greedy's
accepted set (tests/test_reinsertion.py asserts equality against a
literal serial replay), and it converges in conflict-chain-depth
rounds (typically < 10) instead of batch-size steps.

The post-apply refit walks only the dirty paths: every conflict node
climbs to the root recomputing inner bounds from children
(reference: refit_from, 215-225), synchronized level-by-level. A node
visited by several climbs is recomputed several times; the deepest
climb through it arrives last, after both children are final, so the
last write is exact (same induction as the reference's serial climbs).
This costs (max dirty depth) rounds over [5*batch] rows instead of
(tree height) rounds over the full node array.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Bvh, Index, make_node_bounds_row


@dataclasses.dataclass(frozen=True)
class ReinsertionConfig:
    """Names/defaults match reference: reinsertion_optimizer.h:19-25."""

    batch_size_ratio: float = 0.05
    max_iter_count: int = 3
    # Static bound on the branch-and-bound descent stack; the reference
    # grows a std::vector (find_reinsertion, 148). 64 covers SAH trees.
    search_stack_depth: int = 64
    # Static batch capacity as a fraction of node capacity (the dynamic
    # batch size is min(ratio * node_count, this cap)).
    max_batch: int | None = None


def _half_area_rows(rows):
    return bbox_ops.get_half_area(rows[..., 0::2], rows[..., 1::2])


def compute_parents(index, node_count, cap):
    ids = jnp.arange(cap, dtype=jnp.int32)
    inner = Index.is_inner(index) & (ids < node_count)
    first = Index.first_id(index).astype(jnp.int32)
    parents = jnp.zeros((cap,), jnp.int32)
    parents = parents.at[jnp.where(inner, first, cap)].set(ids, mode="drop")
    parents = parents.at[jnp.where(inner, first + 1, cap)].set(ids, mode="drop")
    return parents


def _find_reinsertion_batch(bounds, index, parents, node_ids, valid,
                            stack_depth, tail_div=8):
    """Vectorized branch-and-bound search (reference: 107-188).

    For each candidate `from`-node, walks pivots up to the root; at each
    pivot explores the sibling subtree with a bounded stack, tracking
    the best area decrease. Returns (to, area_diff) per candidate.

    Round-4 rework (two changes, measured on hardware with
    tools/profile_reinsertion.py):

    - PAIRED stack entries: children are always allocated in pairs
      (bvh.h:33-51), and the reference pushes both with the SAME bound
      (166-170). One stack entry `(val, first << 1 | 1)` covers both,
      and each pop evaluates two nodes — half the lockstep steps and
      half the [stack_depth, B] mask traffic. The pivot-seed pushes a
      single `(val, sib << 1)`. Branch-and-bound returns the global
      argmax under any exploration order, so results are unchanged
      (ties between equal diffs may pick a different, equally-optimal
      target).

    - TWO-PHASE tail compaction: the lockstep while_loop runs until the
      survivor count drops below B/tail_div, then compacts the full
      per-lane state into a B/tail_div-wide second loop — stragglers
      (candidates near the root exploring large subtrees) stop paying
      for the finished 90%.

    The per-candidate stacks live as [stack_depth, B] carries written
    through lane-iota masks (dense selects) rather than scatters: a
    [B, depth] scatter per push/pop measured ~2x the per-step cost of
    the mask form on this backend.
    """
    cap = index.shape[0]
    B = node_ids.shape[0]
    dtype = bounds.dtype
    i32 = jnp.int32

    node_area_all = _half_area_rows(bounds[node_ids])
    node_mn_all = bounds[node_ids][:, 0::2]
    node_mx_all = bounds[node_ids][:, 1::2]
    parent0_all = parents[node_ids]
    parent_area = _half_area_rows(bounds[parent0_all])
    sib0 = Bvh.get_sibling_id(node_ids)

    def make_step(width):
        lanes = jax.lax.broadcasted_iota(i32, (stack_depth, width), 0)

        def step(s):
            alive = s["alive"]
            sp = s["sp"]
            node_area = s["node_area"]
            # Seed the stack with (area_diff, sibling-as-single) when
            # starting a pivot level (reference: 151).
            need_seed = alive & ~s["seeded"]
            m = (lanes == sp[None, :]) & need_seed[None, :]
            stack_val = jnp.where(m, s["area_diff"][None, :],
                                  s["stack_val"])
            stack_id = jnp.where(m, (s["sibling"] << 1)[None, :],
                                 s["stack_id"])
            sp = jnp.where(need_seed, sp + 1, sp)
            seeded = s["seeded"] | need_seed

            # Pop one entry (a node pair, or the single seed) and
            # evaluate both nodes (reference: 152-170).
            has_work = alive & (sp > 0)
            spm1 = jnp.clip(sp - 1, 0, stack_depth - 1)
            mpop = lanes == spm1[None, :]
            top_val = jnp.sum(jnp.where(mpop, stack_val, 0), axis=0,
                              dtype=stack_val.dtype)
            top_enc = jnp.sum(jnp.where(mpop, stack_id, 0), axis=0,
                              dtype=i32)
            sp = jnp.where(has_work, sp - 1, sp)
            is_pair = (top_enc & 1) == 1
            base = top_enc >> 1

            prune = top_val - node_area <= s["best_diff"]  # bound (155)
            eval0 = has_work & ~prune
            eval1 = eval0 & is_pair

            best_to = s["best_to"]
            best_diff = s["best_diff"]
            for k, (cid, ev) in enumerate(
                    ((base, eval0), (base + 1, eval1))):
                cidc = jnp.clip(cid, 0, cap - 1)
                dst_row = bounds[cidc]
                merged_mn = jnp.minimum(dst_row[:, 0::2], s["node_mn"])
                merged_mx = jnp.maximum(dst_row[:, 1::2], s["node_mx"])
                merged_area = bbox_ops.get_half_area(merged_mn, merged_mx)
                reinsert_area = top_val - merged_area
                better = ev & (reinsert_area > best_diff)
                best_to = jnp.where(better, cid, best_to)
                best_diff = jnp.where(better, reinsert_area, best_diff)
                # Push this child's own pair (reference: 166-170).
                dst_idx = index[cidc]
                push = ev & Index.is_inner(dst_idx)
                child_area = reinsert_area + _half_area_rows(dst_row)
                first = Index.first_id(dst_idx).astype(i32)
                mp = (lanes == sp[None, :]) & push[None, :]
                stack_val = jnp.where(mp, child_area[None, :], stack_val)
                stack_id = jnp.where(mp, ((first << 1) | 1)[None, :],
                                     stack_id)
                sp = jnp.where(push, sp + 1, sp)

            # When this pivot's subtree is exhausted, climb one level;
            # stop when the climb would reach the root (reference:
            # 173-182).
            exhausted = alive & seeded & (sp == 0)
            next_pivot = parents[jnp.clip(s["pivot"], 0, cap - 1)]
            finish = exhausted & (next_pivot == 0)
            climb = exhausted & (next_pivot != 0)

            new_sibling = Bvh.get_sibling_id(s["pivot"])
            sib_row = bounds[jnp.clip(s["sibling"], 0, cap - 1)]
            ext_mn = jnp.minimum(s["pivot_mn"], sib_row[:, 0::2])
            ext_mx = jnp.maximum(s["pivot_mx"], sib_row[:, 1::2])
            pivot_row = bounds[jnp.clip(s["pivot"], 0, cap - 1)]
            new_area_diff = (s["area_diff"] + _half_area_rows(pivot_row)
                             - bbox_ops.get_half_area(ext_mn, ext_mx))

            # The reference extends pivot_bbox with the *current*
            # sibling before computing the decrease, only when pivot !=
            # parent (from the second climb on).
            is_first_climb = s["pivot"] == s["parent0"]
            area_diff = jnp.where(
                climb,
                jnp.where(is_first_climb, s["area_diff"], new_area_diff),
                s["area_diff"],
            )
            cnf = climb[:, None] & ~is_first_climb[:, None]
            pivot_mn = jnp.where(cnf, ext_mn, s["pivot_mn"])
            pivot_mx = jnp.where(cnf, ext_mx, s["pivot_mx"])

            return dict(
                s,
                best_to=best_to,
                best_diff=best_diff,
                area_diff=area_diff,
                pivot=jnp.where(climb, next_pivot, s["pivot"]),
                sibling=jnp.where(climb, new_sibling, s["sibling"]),
                pivot_mn=pivot_mn,
                pivot_mx=pivot_mx,
                stack_val=stack_val,
                stack_id=stack_id,
                sp=sp,
                seeded=seeded & ~climb,
                alive=alive & ~finish,
            )

        return step

    state = dict(
        best_to=jnp.zeros((B,), i32),
        best_diff=jnp.zeros((B,), dtype),  # must be > 0 to accept
        area_diff=parent_area,
        pivot=parent0_all,
        sibling=sib0,
        pivot_mn=bounds[sib0][:, 0::2],
        pivot_mx=bounds[sib0][:, 1::2],
        stack_val=jnp.zeros((stack_depth, B), dtype),
        stack_id=jnp.zeros((stack_depth, B), i32),
        sp=jnp.zeros((B,), i32),
        seeded=jnp.zeros((B,), bool),  # sibling pushed for this pivot?
        alive=valid & (node_ids != 0),
        # per-lane constants (ride the compaction gather)
        node_area=node_area_all,
        node_mn=node_mn_all,
        node_mx=node_mx_all,
        parent0=parent0_all,
    )

    Bt = max(128, B // tail_div)
    if Bt >= B:
        state = jax.lax.while_loop(
            lambda s: jnp.any(s["alive"]), make_step(B), state)
        best_to, best_diff = state["best_to"], state["best_diff"]
    else:
        # phase 1: full width until few survivors remain
        state = jax.lax.while_loop(
            lambda s: jnp.sum(s["alive"]) > Bt, make_step(B), state)
        # compact the survivors (alive lanes first, stable)
        iota_b = jnp.arange(B, dtype=i32)
        _, order = jax.lax.sort(
            (1 - state["alive"].astype(i32), iota_b), num_keys=1)
        sel = order[:Bt]

        def take(x):
            return jnp.take(x, sel, axis=-1)

        tail = {k: (take(v) if v.ndim == 1 or k in ("stack_val", "stack_id")
                    else jnp.take(v, sel, axis=0))
                for k, v in state.items()}
        tail = jax.lax.while_loop(
            lambda s: jnp.any(s["alive"]), make_step(Bt), tail)
        best_to = state["best_to"].at[sel].set(tail["best_to"])
        best_diff = state["best_diff"].at[sel].set(tail["best_diff"])

    # Reject degenerate targets (reference: 184-187).
    degenerate = (best_to == sib0) | (best_to == parent0_all)
    ok = valid & (node_ids != 0) & ~degenerate & (best_diff > 0)
    return jnp.where(ok, best_to, 0), jnp.where(ok, best_diff, 0)


def _greedy_accept(conflicts, ok, cap):
    """Exact parallel form of the reference's serial conflict loop
    (reinsertion_optimizer.h:254-265): candidates arrive gain-sorted
    (row position = priority, 0 first); candidate i is accepted iff no
    accepted j < i shares a conflict node with it.

    The serial loop's accepted set equals the lexicographically-first
    greedy set, computed here by fixpoint: each round, scatter-min the
    priorities of live (accepted|undecided) and of accepted candidates
    onto their conflict nodes, then
      accept  i  iff  undecided and no live claimant beats it anywhere,
      reject  i  iff  undecided and an ACCEPTED claimant beats it.
    Every round decides at least the minimum undecided priority (its
    earlier claimants are all decided), so the loop terminates; in
    practice it runs conflict-chain-depth rounds (<10).

    conflicts: [5, B] int32 node ids (the 5-node conflict sets).
    ok:        [B] bool — candidates with positive gain.
    Returns accepted [B] bool.
    """
    B = ok.shape[0]
    i32 = jnp.int32
    pri = jnp.arange(B, dtype=i32)
    confc = jnp.clip(conflicts, 0, cap - 1)
    sentinel = jnp.asarray(B, i32)

    def cond(s):
        und, acc, it = s
        return jnp.any(und) & (it < B)

    def one_round(und, acc):
        live_pri = jnp.where(und | acc, pri, sentinel)
        acc_pri = jnp.where(acc, pri, sentinel)
        m_live = jnp.full((cap,), B, i32).at[confc].min(
            jnp.broadcast_to(live_pri[None, :], (5, B)), mode="drop")
        m_acc = jnp.full((cap,), B, i32).at[confc].min(
            jnp.broadcast_to(acc_pri[None, :], (5, B)), mode="drop")
        g_live = jnp.min(m_live[confc], axis=0)
        g_acc = jnp.min(m_acc[confc], axis=0)
        newly_acc = und & (g_live >= pri)
        newly_rej = und & (g_acc < pri)
        return und & ~newly_acc & ~newly_rej, acc | newly_acc

    def body(s):
        # 2 fixpoint rounds per while iteration (same fusion-floor
        # amortization as _refit_dirty; an extra round after
        # convergence is a no-op).
        und, acc, it = s
        und, acc = one_round(und, acc)
        und, acc = one_round(und, acc)
        return (und, acc, it + 2)

    _, accepted, _ = jax.lax.while_loop(
        cond, body, (ok, jnp.zeros((B,), bool), jnp.zeros((), i32)))
    return accepted


def _refit_dirty(bounds, index, parents, seeds, stack_depth_unused=None):
    """Climb every dirty path to the root, recomputing inner bounds
    from children level-by-level (reference: refit_from, 215-225).

    seeds: [S] node ids (-1 = inactive; duplicates fine). Each round
    recomputes the frontier nodes (leaves skip — their bounds come from
    primitives) and steps to the parent; entries stop after the root.
    A node crossed by several climbs is recomputed once per crossing;
    the deepest climb arrives last, when both children are final, so
    the last write is exact.
    """
    cap = index.shape[0]
    inner = Index.is_inner(index)
    first = Index.first_id(index).astype(jnp.int32)

    def cond(s):
        _, cur = s
        return jnp.any(cur >= 0)

    def one_step(b, cur):
        c = jnp.clip(cur, 0, cap - 1)
        do = (cur >= 0) & inner[c]
        l = jnp.clip(jnp.where(do, first[c], 0), 0, cap - 1)
        lrow = b[l]
        rrow = b[jnp.clip(l + 1, 0, cap - 1)]
        mn = jnp.minimum(lrow[:, 0::2], rrow[:, 0::2])
        mx = jnp.maximum(lrow[:, 1::2], rrow[:, 1::2])
        merged = make_node_bounds_row(mn, mx)
        b = b.at[jnp.where(do, c, cap)].set(merged, mode="drop")
        nxt = jnp.where(cur > 0, parents[c], -1)
        return b, nxt

    def body(s):
        # 4 climb levels per while iteration: each while-loop boundary
        # costs a fixed multi-ms fusion/stage floor on this backend
        # (PERFORMANCE.md cost model) that dwarfs the level's actual
        # gather work, so amortizing 4 levels per boundary cuts the
        # refit wall time ~proportionally. Exactness is unchanged: the
        # levels inside the unroll run in the same order, and extra
        # steps past the root are inert (cur = -1).
        b, cur = s
        for _ in range(4):
            b, cur = one_step(b, cur)
        return b, cur

    bounds, _ = jax.lax.while_loop(cond, body, (bounds, seeds))
    return bounds


def optimize_reinsertion(bvh: Bvh, config: ReinsertionConfig | None = None) -> Bvh:
    """Optimize `bvh` in place (functionally) by parallel reinsertion
    (reference: optimize, 236-267)."""
    if config is None:
        config = ReinsertionConfig()
    cap = bvh.index.shape[0]
    batch_cap = config.max_batch or max(1, int(cap * config.batch_size_ratio) + 1)
    batch_cap = min(-(-batch_cap // 128) * 128, cap)

    bounds, index = bvh.bounds, bvh.index
    node_count = bvh.node_count

    for _ in range(config.max_iter_count):
        bounds, index = _one_iteration(
            bounds,
            index,
            node_count,
            batch_cap,
            config.search_stack_depth,
            config.batch_size_ratio,
        )
    return bvh._replace(bounds=bounds, index=index)


@partial(jax.jit, static_argnames=("batch_cap", "stack_depth", "ratio"))
def _one_iteration(
    bounds, index, node_count, batch_cap: int, stack_depth: int, ratio: float
):
    cap = index.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    parents = compute_parents(index, node_count, cap)

    # --- candidates: top-k by half-area, excluding the root
    # (reference: find_candidates, 88-105). batch_size =
    # ratio * node_count dynamically, masked within the static top-k.
    area = _half_area_rows(bounds)
    valid_node = (ids > 0) & (ids < node_count)
    scores = jnp.where(valid_node, area, -jnp.inf)
    # full descending sort + slice instead of lax.top_k: a payload sort
    # at this width costs ~1-3 ms on this backend where top_k measured
    # ~35 ms (tools/profile_reinsertion.py). Ties at the batch boundary
    # may admit a different-but-equal-area candidate, which the
    # reference's heap leaves unspecified too (find_candidates, 88-105).
    neg_sorted, ids_sorted = jax.lax.sort((-scores, ids), num_keys=1)
    top_scores = -neg_sorted[:batch_cap]
    top_ids = ids_sorted[:batch_cap]
    batch_size = jnp.maximum(
        1, (node_count.astype(jnp.float32) * ratio).astype(jnp.int32)
    )
    valid = (jnp.arange(batch_cap) < batch_size) & jnp.isfinite(top_scores)
    cand = top_ids.astype(jnp.int32)

    to, diff = _find_reinsertion_batch(bounds, index, parents, cand, valid, stack_depth)

    # --- sort by decreasing gain (reference: 256) and greedily accept
    # conflict-free moves (258-265) via the exact parallel fixpoint.
    order = jnp.argsort(-diff)
    to_s = to[order]
    from_s = cand[order]
    diff_s = diff[order]
    sib_s = Bvh.get_sibling_id(from_s)
    pto_s = parents[jnp.clip(to_s, 0, cap - 1)]
    pfrom_s = parents[jnp.clip(from_s, 0, cap - 1)]

    conflicts = jnp.stack([to_s, from_s, sib_s, pto_s, pfrom_s])
    accepted = _greedy_accept(conflicts, diff_s > 0, cap)

    # --- apply all accepted moves at once (reference: reinsert_node,
    # 190-213). Their conflict sets are disjoint, so the scatters below
    # touch disjoint node slots.
    t_ = jnp.where(accepted, to_s, cap)
    s_ = jnp.where(accepted, sib_s, cap)
    p_ = jnp.where(accepted, pfrom_s, cap)
    sib_rows = bounds[jnp.clip(sib_s, 0, cap - 1)]
    sib_idx = index[jnp.clip(sib_s, 0, cap - 1)]
    dst_rows = bounds[jnp.clip(to_s, 0, cap - 1)]
    dst_idx = index[jnp.clip(to_s, 0, cap - 1)]

    # nodes[to].index = inner(left_sibling(from)); nodes[sibling] = dst;
    # nodes[parent] = sibling.
    index = index.at[t_].set(
        Index.make_inner(Bvh.get_left_sibling_id(from_s), index.dtype), mode="drop"
    )
    bounds = bounds.at[s_].set(dst_rows, mode="drop")
    index = index.at[s_].set(dst_idx, mode="drop")
    bounds = bounds.at[p_].set(sib_rows, mode="drop")
    index = index.at[p_].set(sib_idx, mode="drop")

    # --- refit the dirty ancestor paths (reference: refit_from,
    # 215-225). The reference reinsert_node refits from exactly
    # {to, parent(from)} per applied move (190-213): `to` is the only
    # node whose box GREW (it now unions dst with the moved subtree)
    # and parent(from) the only one that SHRANK (it became the old
    # sibling); every other conflict node keeps its exact bounds
    # (from/dst moved unchanged; sibling(from)'s slot holds dst's old
    # box). Seeding only those two rows per move keeps the climb width
    # at 2*batch instead of 5*batch. Non-accepted rows are inert (-1).
    parents = compute_parents(index, node_count, cap)
    seeds2 = jnp.stack([to_s, pfrom_s])
    seeds = jnp.where(accepted[None, :], seeds2, -1).reshape(-1)
    # Deduplicate and COMPACT the seeds before climbing: accepted moves
    # are typically a small fraction of the batch, and every inert lane
    # still pays the full climb-to-root loop. Descending sort puts the
    # real seeds first; duplicates (shared ancestors) turn inert.
    s_sorted = -jnp.sort(-seeds)
    dup = jnp.concatenate([jnp.zeros((1,), bool),
                           s_sorted[1:] == s_sorted[:-1]])
    seeds = jnp.where(dup, -1, s_sorted)
    bounds = _refit_dirty(bounds, index, parents, seeds)
    return bounds, index
