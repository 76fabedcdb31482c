"""Bottom-up traversal, refitting, and parent computation.

TPU-native counterpart of `traverse_bottom_up` / `refit`
(reference: bvh.h:184-218). The reference walks leaves-to-root with a
`seen` bitmap, one node at a time; here each `lax.while_loop` pass
refits every node whose children are both done (a level-synchronous
wavefront up the tree), which converges in tree-height passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bvh_tpu.core.types import Bvh, Index, make_node_bounds_row


def compute_parents(bvh: Bvh):
    """parents[child] = parent for every node; parents[0] = 0
    (reference: reinsertion_optimizer.h:71-86)."""
    cap = bvh.index.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    valid_inner = (ids < bvh.node_count) & Index.is_inner(bvh.index) & (
        ids < bvh.node_count
    )
    first = Index.first_id(bvh.index).astype(jnp.int32)
    left = jnp.where(valid_inner, first, cap)
    right = jnp.where(valid_inner, first + 1, cap)
    parents = jnp.zeros((cap,), jnp.int32)
    parents = parents.at[left].set(ids, mode="drop")
    parents = parents.at[right].set(ids, mode="drop")
    return parents


def leaf_of_position(bvh: Bvh):
    """For each position in `prim_ids`, the id of the leaf that owns it.

    Leaves tile the position range exactly, so scattering each leaf's id
    at its `first_id` and forward-filling with a "last valid value" scan
    (associative: f(a, b) = b if b >= 0 else a) recovers ownership.
    Note leaf ids are NOT monotone in position order, so a running max
    would be wrong.
    """
    cap = bvh.index.shape[0]
    n = bvh.prim_ids.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    is_leaf = Index.is_leaf(bvh.index) & (ids < bvh.node_count)
    first = Index.first_id(bvh.index).astype(jnp.int32)
    starts = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(is_leaf, first, n)
    ].max(ids, mode="drop")
    return jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a), starts
    )


def refit(bvh: Bvh, prim_bb_min=None, prim_bb_max=None) -> Bvh:
    """Recompute all node bounds bottom-up (reference: bvh.h:210-218).

    With `prim_bb_min/max` (indexed by original prim id), leaf bounds
    are recomputed from primitive boxes first (the `LeafFn` analogue);
    otherwise leaf bounds are kept as-is and only inner bounds update.
    """
    cap = bvh.index.shape[0]
    ids = jnp.arange(cap, dtype=jnp.int32)
    valid = ids < bvh.node_count
    is_leaf = Index.is_leaf(bvh.index) & valid
    first = Index.first_id(bvh.index).astype(jnp.int32)

    bounds = bvh.bounds
    if prim_bb_min is not None:
        dim = prim_bb_min.shape[1]
        n = bvh.prim_ids.shape[0]
        owner = leaf_of_position(bvh)
        prim = bvh.prim_ids.astype(jnp.int32)
        big = jnp.asarray(jnp.finfo(prim_bb_min.dtype).max, prim_bb_min.dtype)
        leaf_mn = jnp.full((cap, dim), big, prim_bb_min.dtype).at[owner].min(
            prim_bb_min[prim], mode="drop"
        )
        leaf_mx = jnp.full((cap, dim), -big, prim_bb_max.dtype).at[owner].max(
            prim_bb_max[prim], mode="drop"
        )
        leaf_rows = make_node_bounds_row(leaf_mn, leaf_mx)
        bounds = jnp.where(is_leaf[:, None], leaf_rows, bounds)

    def cond(state):
        _, done = state
        return jnp.any(valid & ~done)

    def body(state):
        bounds, done = state
        left = jnp.clip(first, 0, cap - 1)
        right = jnp.clip(first + 1, 0, cap - 1)
        can = valid & ~done & ~is_leaf & done[left] & done[right]
        lrow = bounds[left]
        rrow = bounds[right]
        merged_mn = jnp.minimum(lrow[:, 0::2], rrow[:, 0::2])
        merged_mx = jnp.maximum(lrow[:, 1::2], rrow[:, 1::2])
        merged = make_node_bounds_row(merged_mn, merged_mx)
        bounds = jnp.where(can[:, None], merged, bounds)
        return bounds, done | can

    bounds, _ = jax.lax.while_loop(cond, body, (bounds, is_leaf | ~valid))
    return bvh._replace(bounds=bounds)


def node_depths(bvh: Bvh):
    """Depth of each node from the root (root = 0), via pointer-jumping
    over the parents array in O(log depth) passes."""
    cap = bvh.index.shape[0]
    parents = compute_parents(bvh)
    depth = jnp.where(jnp.arange(cap) == 0, 0, 1).astype(jnp.int32)
    hop = parents

    def body(state):
        depth, hop = state
        return depth + jnp.where(hop != 0, 1, 0), parents_at(hop)

    def parents_at(h):
        return parents[h]

    def cond(state):
        _, hop = state
        return jnp.any(hop != 0)

    depth, _ = jax.lax.while_loop(cond, body, (depth, hop))
    return depth
