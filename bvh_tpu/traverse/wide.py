"""Wide (8-ary) BVH traversal layout.

A traversal-time re-layout of the binary BVH: binary subtrees collapse
into nodes of up to WIDTH children, so a ray does ~log_8 steps instead
of ~log_2, and each step fetches ONE contiguous row holding all child
boxes + index words instead of two scattered rows. On TPU this is the
difference between many small random gathers and few wide sequential
ones, and the 8-child slab test is a dense [rays, 8] VPU operation.

This is a derived structure: serialization, building, and the public
API stay on the binary v2 layout (the interop contract); `widen()` is a
pure function of a built `Bvh`, and hits from `traverse_wide` must be
identical to the binary traversal's (same primitive ranges, same leaf
intersection order within a leaf).

Child entries reuse the packed binary index-word encoding
(reference: index.h): leaf words point at prim_id positions; inner
words here hold the WIDE node id of the child (not a binary node id).
Empty child slots carry an empty box (never hit) and word 0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import Bvh, Index
from bvh_tpu.core.utils import robust_max, robust_min

WIDTH = 8


class WideBvh(NamedTuple):
    """child_bounds: [m, WIDTH, 2*dim]; child_index: [m, WIDTH] packed
    words (inner words reference wide node ids); prim_ids as binary."""

    child_bounds: jnp.ndarray
    child_index: jnp.ndarray
    prim_ids: jnp.ndarray
    node_count: jnp.ndarray

    @property
    def dim(self):
        return self.child_bounds.shape[-1] // 2


def widen(bvh: Bvh) -> WideBvh:
    """Collapse a binary BVH into an 8-ary layout (host-side numpy;
    one-time preprocessing like the reference's PrecomputedTri step)."""
    nc = int(bvh.node_count)
    dim = bvh.dim
    bounds = np.asarray(bvh.bounds[:nc])
    index = np.asarray(bvh.index[:nc]).astype(np.uint64)
    first = (index >> 4).astype(np.int64)
    count = (index & 15).astype(np.int64)

    big = np.finfo(np.float32).max
    empty_row = np.empty((2 * dim,), np.float32)
    empty_row[0::2] = +big
    empty_row[1::2] = -big

    # Collect up to WIDTH children per wide node by greedily expanding
    # the child with the largest half-area (keeps tree quality).
    def half_area(row):
        d = row[1::2] - row[0::2]
        if dim == 3:
            return (d[0] + d[1]) * d[2] + d[0] * d[1]
        return float(np.sum([d[i] * d[j] for i in range(dim)
                             for j in range(i + 1, dim)]))

    wide_children: list[list[int | tuple]] = []  # per wide node: binary ids or leaf words
    wide_of_binary = {}  # binary inner node id -> wide node id
    order = [0]
    # BFS over wide nodes; children lists hold binary node ids.
    wide_slots: list[list[int]] = []
    queue = [0]
    wide_of_binary[0] = 0
    while queue:
        b = queue.pop(0)
        # expand binary subtree rooted at b into <= WIDTH leaves-of-expansion
        slots = [b]
        while len(slots) < WIDTH:
            # pick expandable slot (inner binary node) with largest area
            cand = [s for s in slots if count[s] == 0]
            if not cand:
                break
            areas = [half_area(bounds[s]) for s in cand]
            pick = cand[int(np.argmax(areas))]
            slots.remove(pick)
            slots.extend([int(first[pick]), int(first[pick]) + 1])
        wide_slots.append(slots)
        for s in slots:
            if count[s] == 0:
                wide_of_binary[s] = len(wide_slots) + len(queue)
                queue.append(s)

    m = len(wide_slots)
    child_bounds = np.tile(empty_row, (m, WIDTH, 1))
    child_index = np.zeros((m, WIDTH), index.dtype)
    for w, slots in enumerate(wide_slots):
        for j, s in enumerate(slots):
            child_bounds[w, j] = bounds[s]
            if count[s] != 0:
                child_index[w, j] = index[s]  # leaf word unchanged
            else:
                child_index[w, j] = np.uint64(wide_of_binary[s]) << 4

    idx_dtype = bvh.index.dtype
    return WideBvh(
        child_bounds=jnp.asarray(child_bounds, bvh.bounds.dtype),
        child_index=jnp.asarray(child_index.astype(np.asarray(bvh.index).dtype)),
        prim_ids=bvh.prim_ids,
        node_count=jnp.asarray(m, jnp.int32),
    )


def _slab8(rows, org, inv_dir, inv_org, inv_dir_pad, octant, tmin, tmax, robust):
    """Slab test of WIDTH children at once: rows [R, W, 2*dim]."""
    dim = org.shape[-1]
    pairs = rows.reshape(rows.shape[0], WIDTH, dim, 2)
    oct_e = octant[:, None, :, None]  # [R,1,dim,1]
    near_b = jnp.take_along_axis(pairs, jnp.broadcast_to(oct_e, (*pairs.shape[:3], 1)), axis=-1)[..., 0]
    far_b = jnp.take_along_axis(pairs, jnp.broadcast_to(1 - oct_e, (*pairs.shape[:3], 1)), axis=-1)[..., 0]
    if robust:
        t_near = (near_b - org[:, None, :]) * inv_dir[:, None, :]
        t_far = (far_b - org[:, None, :]) * inv_dir_pad[:, None, :]
    else:
        t_near = near_b * inv_dir[:, None, :] + inv_org[:, None, :]
        t_far = far_b * inv_dir[:, None, :] + inv_org[:, None, :]
    t0 = jnp.broadcast_to(tmin[:, None], t_near.shape[:2])
    t1 = jnp.broadcast_to(tmax[:, None], t_near.shape[:2])
    for i in range(dim):
        t0 = robust_max(t_near[..., i], t0)
        t1 = robust_min(t_far[..., i], t1)
    return t0, t1


def traverse_wide(
    wbvh: WideBvh,
    rays: Ray,
    leaf_fn,
    *,
    any_hit: bool = False,
    robust: bool = False,
    stack_depth: int = 48,
    block_size: int | None = None,
):
    """Wavefront traversal over the wide layout. Returns the same Hit
    structure as the binary `traverse`. Children are visited in
    near-to-far entry order for closest-hit (generalizing bvh.h:177-180
    to 8 children) and slot order for any-hit (SATO-descending areas)."""
    from bvh_tpu.traverse.wavefront import Hit, TraversalStats, DEFAULT_BLOCK

    R = rays.tmin.shape[0]
    if block_size is None:
        block_size = DEFAULT_BLOCK
    block_size = min(block_size, max(R, 1))

    core = partial(
        _traverse_wide_block,
        wbvh,
        leaf_fn=leaf_fn,
        any_hit=any_hit,
        robust=robust,
        stack_depth=stack_depth,
    )
    if R <= block_size:
        return core(rays)
    pad = (-R) % block_size
    if pad:
        def pad_ray(x, fill):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        rays = Ray(pad_ray(rays.org, 0.0), pad_ray(rays.dir, 1.0),
                   pad_ray(rays.tmin, 1.0), pad_ray(rays.tmax, 0.0))
    n_blocks = (R + pad) // block_size
    rays_b = jax.tree.map(lambda x: x.reshape(n_blocks, block_size, *x.shape[1:]), rays)
    hit_b = jax.lax.map(core, rays_b)
    return jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:])[:R], hit_b)


def _traverse_wide_block(wbvh: WideBvh, rays: Ray, leaf_fn, any_hit, robust,
                         stack_depth):
    from bvh_tpu.traverse.wavefront import Hit, TraversalStats

    R = rays.tmin.shape[0]
    m = wbvh.child_bounds.shape[0]
    idx_dtype = wbvh.child_index.dtype
    dtype = rays.org.dtype
    inf = jnp.asarray(jnp.inf, dtype)

    inv_dir = rays.get_inv_dir(safe=not robust)
    inv_org = -inv_dir * rays.org
    inv_dir_pad = Ray.pad_inv_dir(inv_dir)
    octant = rays.get_octant()

    invalid = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    state = dict(
        # Stack entries are packed index words: inner -> wide node id.
        stack=jnp.zeros((R, stack_depth), idx_dtype),
        sp=jnp.zeros((R,), jnp.int32),
        top=jnp.zeros((R,), idx_dtype),  # wide root id 0, inner word 0<<4
        leaf_cur=jnp.zeros((R,), jnp.int32),
        leaf_rem=jnp.zeros((R,), jnp.int32),
        active=jnp.ones((R,), bool),
        tmax=rays.tmax,
        best_t=jnp.full((R,), jnp.inf, dtype),
        best_u=jnp.zeros((R,), dtype),
        best_v=jnp.zeros((R,), dtype),
        best_pos=jnp.full((R,), invalid),
        nodes_visited=jnp.zeros((R,), jnp.int32),
        leaves_visited=jnp.zeros((R,), jnp.int32),
    )
    rows_i = jnp.arange(R, dtype=jnp.int32)

    def step(s):
        active = s["active"]
        in_leaf = active & (s["leaf_rem"] > 0)
        rays_now = Ray(rays.org, rays.dir, rays.tmin, s["tmax"])

        # --- leaf step (one prim per iteration, as in the binary path)
        hit, t, u, v = leaf_fn(s["leaf_cur"], rays_now)
        hit = hit & in_leaf
        if any_hit:
            best_t = jnp.where(hit, t, s["best_t"])
            tmax = s["tmax"]
        else:
            closer = hit & (t <= s["tmax"])
            best_t = jnp.where(closer, t, s["best_t"])
            tmax = jnp.where(closer, t, s["tmax"])
            hit = closer
        best_u = jnp.where(hit, u, s["best_u"])
        best_v = jnp.where(hit, v, s["best_v"])
        best_pos = jnp.where(hit, s["leaf_cur"].astype(jnp.uint32), s["best_pos"])
        leaf_cur = jnp.where(in_leaf, s["leaf_cur"] + 1, s["leaf_cur"])
        leaf_rem = jnp.where(in_leaf, s["leaf_rem"] - 1, s["leaf_rem"])
        done_by_hit = hit if any_hit else jnp.zeros_like(hit)
        leaf_exhausted = in_leaf & (leaf_rem == 0) & ~done_by_hit

        # --- inner step: test all WIDTH children at once --------------
        in_inner = active & ~in_leaf
        top = s["top"]
        top_is_leaf = Index.is_leaf(top)
        enter_leaf = in_inner & top_is_leaf
        do_node = in_inner & ~top_is_leaf

        wid = jnp.clip(Index.first_id(top).astype(jnp.int32), 0, m - 1)
        rows = wbvh.child_bounds[wid]          # [R, W, 2*dim] contiguous
        words = wbvh.child_index[wid]          # [R, W]
        t0, t1 = _slab8(rows, rays.org, inv_dir, inv_org, inv_dir_pad,
                        octant, rays.tmin, tmax, robust)
        hits8 = t0 <= t1

        if any_hit:
            # Slot order (areas descend by construction: SATO).
            keys = jnp.where(hits8, jnp.arange(WIDTH, dtype=dtype), inf)
        else:
            keys = jnp.where(hits8, t0, inf)
        # Sort children by key; masked-out children sort last.
        ord_keys, ord_words = jax.lax.sort((keys, words), num_keys=1)
        n_hits8 = jnp.sum(hits8.astype(jnp.int32), axis=1)

        # Descend into the nearest child; push the rest in far-to-near
        # order so the nearest pops first. Stack columns are addressed
        # with one-hot masks (fusible VPU selects, not scatters).
        descend = do_node & (n_hits8 > 0)
        new_top = ord_words[:, 0]
        sp = s["sp"]
        stack = s["stack"]
        lanes = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]
        for j in range(WIDTH - 1, 0, -1):
            push_j = do_node & (n_hits8 > j)
            col = (lanes == sp[:, None]) & push_j[:, None]
            stack = jnp.where(col, ord_words[:, j][:, None], stack)
            sp = jnp.where(push_j, sp + 1, sp)

        leaf_first = Index.first_id(top).astype(jnp.int32)
        leaf_count = Index.prim_count(top).astype(jnp.int32)
        leaf_cur = jnp.where(enter_leaf, leaf_first, leaf_cur)
        leaf_rem = jnp.where(enter_leaf, leaf_count, leaf_rem)

        need_pop = (do_node & (n_hits8 == 0)) | leaf_exhausted
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = jnp.max(jnp.where(lanes == sp[:, None], stack, 0), axis=1)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~done_by_hit & ~(need_pop & ~can_pop)

        return dict(
            stack=stack, sp=sp, top=top, leaf_cur=leaf_cur, leaf_rem=leaf_rem,
            active=active, tmax=tmax, best_t=best_t, best_u=best_u,
            best_v=best_v, best_pos=best_pos,
            nodes_visited=s["nodes_visited"] + do_node.astype(jnp.int32),
            leaves_visited=s["leaves_visited"] + enter_leaf.astype(jnp.int32),
        )

    state = jax.lax.while_loop(lambda s: jnp.any(s["active"]), step, state)
    missed = state["best_pos"] == invalid
    prim_id = jnp.where(
        missed, invalid,
        wbvh.prim_ids[
            jnp.clip(state["best_pos"].astype(jnp.int32), 0,
                     wbvh.prim_ids.shape[0] - 1)
        ].astype(jnp.uint32),
    )
    return Hit(
        t=jnp.where(missed, jnp.inf, state["best_t"]),
        u=state["best_u"], v=state["best_v"],
        prim_pos=state["best_pos"], prim_id=prim_id,
        stats=TraversalStats(state["nodes_visited"], state["leaves_visited"]),
    )


@partial(jax.jit, static_argnames=("any_hit", "robust", "stack_depth",
                                   "permuted", "block_size"))
def intersect_tris_wide(wbvh: WideBvh, tri_flat, rays: Ray, *,
                        any_hit=False, robust=False, stack_depth=48,
                        permuted=False, block_size=None):
    """Triangle closest/any-hit over the wide layout."""
    from bvh_tpu.geom.tri import PrecomputedTri

    m = tri_flat.shape[0]
    n_pos = wbvh.prim_ids.shape[0]

    def leaf_fn(prim_pos, rays_now):
        pos = jnp.clip(prim_pos, 0, n_pos - 1)
        idx = pos if permuted else jnp.clip(
            wbvh.prim_ids[pos].astype(jnp.int32), 0, m - 1
        )
        tri = PrecomputedTri.from_flat(tri_flat[idx])
        t, u, v, hit = tri.intersect(rays_now)
        return hit, t, u, v

    return traverse_wide(
        wbvh, rays, leaf_fn, any_hit=any_hit, robust=robust,
        stack_depth=stack_depth, block_size=block_size,
    )
