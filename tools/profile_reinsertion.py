"""Stage-level timing of the reinsertion optimizer on TPU.

Splits one `_one_iteration` into its stages (top-k candidates, the
branch-and-bound search while_loop, the greedy-accept scan, the apply
scatters, the refit while_loop), jits each separately with forced
readbacks, and prints per-stage times. Run ALONE (single TPU process).

usage: python tools/profile_reinsertion.py [--n 262144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.build.lbvh import build_lbvh
    from bvh_tpu.build.reinsertion import (
        _find_reinsertion_batch, compute_parents, _half_area_rows)
    from bvh_tpu.core.types import Bvh, Index
    from bvh_tpu.io.scenes import sponza_class

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    tris = sponza_class(args.n, seed=0)
    bvh = jax.jit(build_lbvh)(
        jnp.asarray(tris.min(axis=1)), jnp.asarray(tris.max(axis=1)),
        jnp.asarray(tris.mean(axis=1)))

    cap = bvh.index.shape[0]
    node_count = bvh.node_count
    batch_cap = min(int(cap * 0.05) + 1, cap)
    stack_depth = 64
    bounds, index = bvh.bounds, bvh.index
    print(f"cap={cap} node_count={int(node_count)} batch={batch_cap}",
          flush=True)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return x

    def timeit(name, fn, *a):
        out = sync(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name:22s}: {ts[len(ts)//2]*1e3:9.1f} ms", flush=True)
        return out

    # --- stage 1: parents + candidates --------------------------------
    @jax.jit
    def stage_cand(bounds, index, node_count):
        ids = jnp.arange(cap, dtype=jnp.int32)
        parents = compute_parents(index, node_count, cap)
        area = _half_area_rows(bounds)
        valid_node = (ids > 0) & (ids < node_count)
        scores = jnp.where(valid_node, area, -jnp.inf)
        top_scores, top_ids = jax.lax.top_k(scores, batch_cap)
        batch_size = jnp.maximum(
            1, (node_count.astype(jnp.float32) * 0.05).astype(jnp.int32))
        valid = (jnp.arange(batch_cap) < batch_size) & jnp.isfinite(
            top_scores)
        return parents, top_ids.astype(jnp.int32), valid

    parents, cand, valid = timeit("candidates(top_k)", stage_cand,
                                  bounds, index, node_count)

    # sort-based candidate selection (cheaper than top_k?)
    @jax.jit
    def stage_cand_sort(bounds, index, node_count):
        ids = jnp.arange(cap, dtype=jnp.int32)
        area = _half_area_rows(bounds)
        valid_node = (ids > 0) & (ids < node_count)
        scores = jnp.where(valid_node, -area, jnp.inf)
        _, top_ids = jax.lax.sort((scores, ids), num_keys=1)
        return top_ids[:batch_cap]

    timeit("candidates(sort)", stage_cand_sort, bounds, index, node_count)

    # --- stage 2: search ----------------------------------------------
    search = jax.jit(lambda b, i, p, c, v: _find_reinsertion_batch(
        b, i, p, c, v, stack_depth))
    to, diff = timeit("search(B&B)", search, bounds, index, parents,
                      cand, valid)

    # --- stage 3: greedy accept scan ----------------------------------
    @jax.jit
    def stage_scan(to, diff, cand, parents):
        order = jnp.argsort(-diff)
        to_s = to[order]
        from_s = cand[order]
        diff_s = diff[order]
        sib_s = Bvh.get_sibling_id(from_s)
        pto_s = parents[jnp.clip(to_s, 0, cap - 1)]
        pfrom_s = parents[jnp.clip(from_s, 0, cap - 1)]

        def accept_step(touched, a):
            to_i, from_i, sib_i, pto_i, pfrom_i, ok_i = a
            conflicts = jnp.stack([to_i, from_i, sib_i, pto_i, pfrom_i])
            clash = jnp.any(touched[conflicts])
            take = ok_i & ~clash
            touched = touched.at[conflicts].set(touched[conflicts] | take)
            return touched, take

        touched0 = jnp.zeros((cap,), bool)
        _, accepted = jax.lax.scan(
            accept_step, touched0,
            (to_s, from_s, sib_s, pto_s, pfrom_s, diff_s > 0))
        return accepted

    timeit("accept(scan)", stage_scan, to, diff, cand, parents)

    # --- stage 5: refit while loop -------------------------------------
    from bvh_tpu.core.types import make_node_bounds_row

    @jax.jit
    def stage_refit(bounds, index, node_count):
        ids = jnp.arange(cap, dtype=jnp.int32)
        inner = Index.is_inner(index) & (ids < node_count)
        first = Index.first_id(index).astype(jnp.int32)
        is_leaf = ~inner & (ids < node_count)

        def cond(st):
            _, done = st
            return jnp.any((ids < node_count) & ~done)

        def body(st):
            b, done = st
            l = jnp.clip(first, 0, cap - 1)
            r = jnp.clip(first + 1, 0, cap - 1)
            can = inner & ~done & done[l] & done[r]
            lrow, rrow = b[l], b[r]
            mn = jnp.minimum(lrow[:, 0::2], rrow[:, 0::2])
            mx = jnp.maximum(lrow[:, 1::2], rrow[:, 1::2])
            merged = make_node_bounds_row(mn, mx)
            return jnp.where(can[:, None], merged, b), done | can

        out, _ = jax.lax.while_loop(
            cond, body, (bounds, is_leaf | (ids >= node_count)))
        return out

    timeit("refit(while,FULL)", stage_refit, bounds, index, node_count)

    # --- the ACTUAL production stages (what _one_iteration runs) ------
    from bvh_tpu.build.reinsertion import (
        _greedy_accept, _refit_dirty, _one_iteration)

    @jax.jit
    def stage_fixpoint(to, diff, cand, parents):
        order = jnp.argsort(-diff)
        to_s = to[order]
        from_s = cand[order]
        sib_s = Bvh.get_sibling_id(from_s)
        pto_s = parents[jnp.clip(to_s, 0, cap - 1)]
        pfrom_s = parents[jnp.clip(from_s, 0, cap - 1)]
        conflicts = jnp.stack([to_s, from_s, sib_s, pto_s, pfrom_s])
        return _greedy_accept(conflicts, diff[order] > 0, cap)

    accepted = timeit("accept(fixpoint)", stage_fixpoint, to, diff,
                      cand, parents)

    @jax.jit
    def stage_dirty(bounds, index, parents, to, diff, cand, accepted):
        order = jnp.argsort(-diff)
        to_s = to[order]
        from_s = cand[order]
        sib_s = Bvh.get_sibling_id(from_s)
        pto_s = parents[jnp.clip(to_s, 0, cap - 1)]
        pfrom_s = parents[jnp.clip(from_s, 0, cap - 1)]
        conflicts = jnp.stack([to_s, from_s, sib_s, pto_s, pfrom_s])
        seeds = jnp.where(accepted[None, :], conflicts, -1).reshape(-1)
        return _refit_dirty(bounds, index, parents, seeds)

    timeit("refit(dirty-path)", stage_dirty, bounds, index, parents,
           to, diff, cand, accepted)

    one = jax.jit(lambda b, i, n: _one_iteration(
        b, i, n, batch_cap + (-batch_cap) % 128, stack_depth, 0.05))
    timeit("ONE FULL ITERATION", one, bounds, index, node_count)


if __name__ == "__main__":
    main()
