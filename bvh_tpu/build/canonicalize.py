"""Tree surgery: drop leaves, contract single-child chains, re-emit.

This is the TPU-native generalization of `Bvh::extract_bvh`
(reference: bvh.h:91-122): given a keep-mask over leaves (and
optionally a new root), it removes dropped leaves, contracts inner
nodes left with a single child, and re-emits a compact BVH whose
children are again allocated in adjacent pairs with the left child at
an odd index (the invariant of bvh.h:33-39). The reference emits in DFS
stack order; this implementation emits in BFS rounds (each round
allocates every next-level pair with one prefix-sum), which is the
parallel-friendly order — node numbering differs, topology and
semantics do not.

Used by: `extract_bvh`, the mini-tree builder (to erase phantom
top-tree leaves arising from static group capacities), and mini-tree
pruning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bvh_tpu.core.types import Bvh, Index


def canonicalize(bvh: Bvh, keep_leaf, new_root=0) -> Bvh:
    """Rebuild `bvh` keeping only leaves with `keep_leaf[node_id]`.

    `new_root`: old node id to re-root at (`extract_bvh` semantics when
    != 0). Requires at least one kept leaf under `new_root`. Returns a
    BVH with the same array capacities; prim positions are renumbered
    compactly in BFS leaf order.
    """
    cap = bvh.index.shape[0]
    n = bvh.prim_ids.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    valid = ids < bvh.node_count
    is_leaf = Index.is_leaf(bvh.index) & valid
    is_inner = ~is_leaf & valid
    first = Index.first_id(bvh.index).astype(jnp.int32)
    count = Index.prim_count(bvh.index).astype(jnp.int32)
    l = jnp.clip(first, 0, cap - 1)
    r = jnp.clip(first + 1, 0, cap - 1)

    # --- alive propagation (bottom-up wavefront) ---------------------
    alive0 = is_leaf & keep_leaf

    def a_cond(st):
        done, _ = st
        return jnp.any(valid & ~done)

    def a_body(st):
        done, alive = st
        can = is_inner & ~done & done[l] & done[r]
        alive = jnp.where(can, alive[l] | alive[r], alive)
        return done | can, alive

    _, alive = jax.lax.while_loop(
        a_cond, a_body, (is_leaf | ~valid, alive0)
    )

    # --- forwarding: single-alive-child inner nodes contract ---------
    both = is_inner & alive[l] & alive[r]
    one_l = is_inner & alive[l] & ~alive[r]
    one_r = is_inner & ~alive[l] & alive[r]
    fwd = jnp.where(one_l, l, jnp.where(one_r, r, ids))

    def f_cond(rep):
        return jnp.any(fwd[rep] != rep)

    rep = jax.lax.while_loop(f_cond, lambda rep: fwd[rep], fwd)

    kept = alive & (both | (is_leaf & keep_leaf))
    eff_l = rep[l]
    eff_r = rep[r]

    # --- BFS re-emission: allocate child pairs level by level --------
    root_old = rep[jnp.asarray(new_root, jnp.int32)]
    new_of_old = jnp.full((cap,), -1, jnp.int32).at[root_old].set(0)
    frontier = jnp.zeros((cap,), bool).at[root_old].set(True)

    def e_cond(st):
        _, frontier, _ = st
        return jnp.any(frontier)

    def e_body(st):
        new_of_old, frontier, counter = st
        par = frontier & both & kept
        par_i = par.astype(jnp.int32)
        rank = jnp.cumsum(par_i, dtype=jnp.int32) - par_i
        base = counter + 2 * rank
        tl = jnp.where(par, eff_l, cap)
        tr = jnp.where(par, eff_r, cap)
        new_of_old = new_of_old.at[tl].set(base, mode="drop")
        new_of_old = new_of_old.at[tr].set(base + 1, mode="drop")
        next_frontier = jnp.zeros((cap,), bool)
        next_frontier = next_frontier.at[tl].set(True, mode="drop")
        next_frontier = next_frontier.at[tr].set(True, mode="drop")
        counter = counter + 2 * jnp.sum(par_i, dtype=jnp.int32)
        return new_of_old, next_frontier, counter

    new_of_old, _, new_count = jax.lax.while_loop(
        e_cond, e_body, (new_of_old, frontier, jnp.asarray(1, jnp.int32))
    )

    # --- gather node payloads into the new order ---------------------
    assigned = new_of_old >= 0
    old_of_new = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(assigned, new_of_old, cap)
    ].set(ids, mode="drop")
    src = jnp.clip(old_of_new, 0, cap - 1)
    new_valid = jnp.arange(cap) < new_count
    new_bounds = jnp.where(new_valid[:, None], bvh.bounds[src], 0)

    # --- renumber prim positions compactly in new leaf order ---------
    new_is_leaf = is_leaf[src] & new_valid
    counts_new = jnp.where(new_is_leaf, count[src], 0)
    new_first_prim = jnp.cumsum(counts_new, dtype=jnp.int32) - counts_new
    new_prim_count = jnp.sum(counts_new, dtype=jnp.int32)

    idx_dtype = bvh.index.dtype
    inner_word = Index.make_inner(
        jnp.clip(new_of_old[jnp.clip(eff_l[src], 0, cap - 1)], 0, None), idx_dtype
    )
    leaf_word = Index.make_leaf(
        jnp.maximum(new_first_prim, 0), jnp.maximum(counts_new, 1), idx_dtype
    )
    new_index = jnp.where(
        new_valid, jnp.where(new_is_leaf, leaf_word, inner_word), jnp.zeros((), idx_dtype)
    )

    # scatter prims: for each old position owned by a kept leaf, place at
    # the leaf's new offset + local offset.
    from bvh_tpu.traverse.refit import leaf_of_position

    owner = leaf_of_position(bvh)  # [n] old leaf id per position
    owner_c = jnp.clip(owner, 0, cap - 1)
    owner_kept = kept[owner_c] & (owner >= 0)
    pos = jnp.arange(n, dtype=jnp.int32)
    local = pos - first[owner_c]
    new_leaf_id = new_of_old[owner_c]
    dest = jnp.where(
        owner_kept & (new_leaf_id >= 0),
        new_first_prim[jnp.clip(new_leaf_id, 0, cap - 1)] + local,
        n,
    )
    new_prims = jnp.zeros_like(bvh.prim_ids).at[dest].set(bvh.prim_ids, mode="drop")

    return Bvh(
        bounds=new_bounds,
        index=new_index,
        prim_ids=new_prims,
        node_count=new_count,
        prim_count=new_prim_count,
    )


def extract_bvh(bvh: Bvh, root_id) -> Bvh:
    """Extract the subtree rooted at `root_id` as a standalone BVH
    (reference: bvh.h:91-122). Node order is BFS rather than the
    reference's DFS; contents and semantics are identical."""
    cap = bvh.index.shape[0]
    keep_all = jnp.ones((cap,), bool)
    return canonicalize(bvh, keep_all, new_root=root_id)
