"""Wavefront BVH traversal: the whole ray batch steps in lockstep.

TPU-native counterpart of the reference's per-ray recursive stack
traversal (reference: bvh.h:124-182 `traverse_top_down` / `intersect`).
Instead of one ray recursing at a time, a `lax.while_loop` advances
every ray by one state-machine step per iteration:

  - inner step: slab-test both children of the current node, descend
    into the near child, push the far child (near/far ordering by entry
    distance for closest-hit, reference: bvh.h:177-180);
  - leaf step: intersect one primitive of the current leaf (the
    vectorized unrolling of the leaf callback loop, index.h:15-22);
  - pop step: fetch the next subtree from the per-ray short stack
    (the `SmallStack<Index, 64>` analogue, stack.h:10-29).

Both the fast FMA slab test (node.h:79-88) and T. Ize's robust variant
(node.h:68-77) are supported, as are closest-hit and any-hit queries
(first confirmed hit terminates the ray, bvh.h:153-155; the SATO child
ordering built into the tree makes the fixed left-first descent
effective for shadow rays).

TPU mapping:
  - Rays are processed in blocks (`lax.map`) so per-block state — the
    short stacks above all — stays small and on-chip instead of
    streaming hundreds of MB of carried state through HBM every step.
  - On-chip node fetches use *one-hot MXU gathers* when the node table
    is small enough: the two children of a node live at (2k+1, 2k+2)
    (bvh.h:33-39), so one `[block, pairs] @ [pairs, 4*dim+2]` matmul
    fetches both child boxes and both index words per step — random
    gather turned into systolic-array work, the idiomatic TPU move.
    Large scenes fall back to native XLA gathers.

Per-ray visited-node/leaf counters mirror the reference benchmark's
`TraversalStats` hooks (reference: test/benchmark.cpp:258-298) and are
always returned (they cost two masked adds).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import Bvh, Index
from bvh_tpu.core.utils import robust_max, robust_min

# One-hot gathers beat native gathers only while the one-hot operand
# stays cheap; 1024 nodes = 512 pairs = a [block, 512] f32 operand.
ONEHOT_MAX_NODES = 1024
ONEHOT_MAX_PRIMS = 2048
DEFAULT_BLOCK = 65536


class TraversalStats(NamedTuple):
    visited_nodes: jnp.ndarray  # [R] int32 — child-pair visits (one per inner_fn call, test/benchmark.cpp:294-296)
    visited_leaves: jnp.ndarray  # [R] int32


class Hit(NamedTuple):
    """Per-ray result. `prim_pos` indexes `bvh.prim_ids` (the position
    semantics of the reference's leaf callbacks, index.h:15-22);
    `prim_id` is the original primitive id. Both are INVALID (0xFFFFFFFF)
    on miss; `t` is +inf on miss."""

    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    prim_pos: jnp.ndarray
    prim_id: jnp.ndarray
    stats: TraversalStats

    @property
    def hit(self):
        return self.prim_pos != jnp.asarray(0xFFFFFFFF, self.prim_pos.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot_matmul(idx, table):
    """Gather rows of `table` by integer `idx` as a one-hot matmul on
    the MXU. Out-of-range indices produce zero rows.

    Precision MUST be HIGHEST: the TPU's default f32 matmul runs in
    bf16 passes, which would round the gathered bounds (and corrupt any
    integer payloads) — the one-hot gather is only a gather if the
    product is exact.
    """
    P = table.shape[0]
    oh = (idx[:, None] == jnp.arange(P, dtype=idx.dtype)[None, :]).astype(table.dtype)
    return jnp.dot(
        oh, table,
        preferred_element_type=table.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _make_pair_gather(bvh: Bvh, mode: str):
    """Returns fetch(fid) -> (row_l, row_r, idx_l, idx_r) for the child
    pair at (fid, fid+1); `fid` is always odd (bvh.h:33-39)."""
    cap = bvh.index.shape[0]
    dim = bvh.dim

    if mode == "onehot":
        dtype = bvh.bounds.dtype
        pairs = max(1, cap // 2)
        P = _round_up(pairs, 128)
        k = jnp.arange(pairs)
        lc = jnp.clip(2 * k + 1, 0, cap - 1)
        rc = jnp.clip(2 * k + 2, 0, cap - 1)
        rows = jnp.concatenate([bvh.bounds[lc], bvh.bounds[rc]], axis=1)
        table = jnp.zeros((P, 4 * dim), dtype).at[:pairs].set(rows)
        # Index words stay integers: a tiny paired take (2 words/ray)
        # rather than a float matmul that could not carry them exactly.
        word_table = jnp.stack([bvh.index[lc], bvh.index[rc]], axis=1)
        word_table = jnp.zeros((P, 2), bvh.index.dtype).at[:pairs].set(word_table)

        def fetch(fid):
            pid = fid >> 1
            out = _onehot_matmul(pid, table)
            words = word_table[jnp.clip(pid, 0, P - 1)]
            return (
                out[:, : 2 * dim],
                out[:, 2 * dim : 4 * dim],
                words[:, 0],
                words[:, 1],
            )

        return fetch

    def fetch(fid):
        f0 = jnp.clip(fid, 0, cap - 1)
        f1 = jnp.clip(fid + 1, 0, cap - 1)
        return bvh.bounds[f0], bvh.bounds[f1], bvh.index[f0], bvh.index[f1]

    return fetch


def _slab_test(row, org, inv_dir, inv_org, inv_dir_pad, octant, tmin, tmax, robust):
    """Octant-aware slab test over interleaved bounds rows [R, 2*dim].

    Fast: fma(bounds, inv_dir, -inv_dir*org) (reference: node.h:79-88);
    robust: (bounds - org) * inv_dir with the padded inverse for the
    exit planes (reference: node.h:68-77). Entry/exit folds use
    NaN-swallowing min/max (reference: node.h:105-117).
    """
    dim = org.shape[-1]
    pairs = row.reshape(*row.shape[:-1], dim, 2)
    neg = octant == 1
    # Select per-axis near/far planes with elementwise where (no dynamic
    # per-lane indexing: fuses on the VPU and works inside Pallas).
    near_b = jnp.where(neg, pairs[..., 1], pairs[..., 0])
    far_b = jnp.where(neg, pairs[..., 0], pairs[..., 1])
    if robust:
        t_near = (near_b - org) * inv_dir
        t_far = (far_b - org) * inv_dir_pad
    else:
        t_near = near_b * inv_dir + inv_org
        t_far = far_b * inv_dir + inv_org
    t0, t1 = tmin, tmax
    for i in range(dim):
        t0 = robust_max(t_near[..., i], t0)
        t1 = robust_min(t_far[..., i], t1)
    return t0, t1


def _traverse_block(
    bvh: Bvh,
    rays: Ray,
    leaf_fn: Callable,
    pair_fetch: Callable,
    any_hit: bool,
    robust: bool,
    stack_depth: int,
    start,
):
    R = rays.tmin.shape[0]
    idx_dtype = bvh.index.dtype
    dtype = rays.org.dtype

    # Fast mode uses safe_inverse, robust mode the plain inverse — the
    # ULP padding handles zero components (reference: bvh.h:162
    # `get_inv_dir<!IsRobust>()`).
    inv_dir = rays.get_inv_dir(safe=not robust)
    inv_org = -inv_dir * rays.org
    inv_dir_pad = Ray.pad_inv_dir(inv_dir)
    octant = rays.get_octant()

    top0 = jnp.broadcast_to(jnp.asarray(start, idx_dtype), (R,))
    invalid = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    state = dict(
        stack=jnp.zeros((R, stack_depth), idx_dtype),
        sp=jnp.zeros((R,), jnp.int32),
        top=top0,
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

    rows = jnp.arange(R, dtype=jnp.int32)

    def step(s):
        active = s["active"]
        in_leaf = active & (s["leaf_rem"] > 0)
        rays_now = Ray(rays.org, rays.dir, rays.tmin, s["tmax"])

        # ---------- leaf step: one primitive per iteration ----------
        hit, t, u, v = leaf_fn(s["leaf_cur"], rays_now)
        hit = hit & in_leaf
        if any_hit:
            # First confirmed hit ends the ray (reference: bvh.h:153-155).
            best_t = jnp.where(hit, t, s["best_t"])
            tmax = s["tmax"]
        else:
            closer = hit & (t <= s["tmax"])  # ray shortening culls farther nodes
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

        # ---------- inner step ---------------------------------------
        in_inner = active & ~in_leaf
        top = s["top"]
        top_is_leaf = Index.is_leaf(top)
        enter_leaf = in_inner & top_is_leaf
        do_node = in_inner & ~top_is_leaf

        fid = Index.first_id(top).astype(jnp.int32)
        row_l, row_r, idx_l, idx_r = pair_fetch(fid)

        tl0, tl1 = _slab_test(
            row_l, rays.org, inv_dir, inv_org, inv_dir_pad, octant,
            rays.tmin, tmax, robust,
        )
        tr0, tr1 = _slab_test(
            row_r, rays.org, inv_dir, inv_org, inv_dir_pad, octant,
            rays.tmin, tmax, robust,
        )
        hit_l = tl0 <= tl1
        hit_r = tr0 <= tr1
        # Closest-hit: descend the nearer child first (bvh.h:177-180);
        # any-hit: fixed left-first order exploits SATO.
        should_swap = (tl0 > tr0) if not any_hit else jnp.zeros_like(hit_l)

        near = jnp.where(should_swap, idx_r, idx_l)
        far = jnp.where(should_swap, idx_l, idx_r)
        both = hit_l & hit_r
        one_l = hit_l & ~hit_r
        one_r = hit_r & ~hit_l
        none = ~hit_l & ~hit_r

        new_top = jnp.where(both, near, jnp.where(one_l, idx_l, idx_r))
        descend = do_node & (both | one_l | one_r)

        # Push the far child when both children hit. The stack columns
        # are addressed with one-hot masks instead of scatters/gathers:
        # [R, depth] elementwise selects fuse into the iteration's VPU
        # bundle, where a scatter would be its own (slow) kernel.
        push = do_node & both
        lanes = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]
        push_col = (lanes == s["sp"][:, None]) & push[:, None]
        stack = jnp.where(push_col, far[:, None], s["stack"])
        sp = jnp.where(push, s["sp"] + 1, s["sp"])

        # ---------- enter leaf / pop ---------------------------------
        leaf_first = Index.first_id(top).astype(jnp.int32)
        leaf_count = Index.prim_count(top).astype(jnp.int32)
        leaf_cur = jnp.where(enter_leaf, leaf_first, leaf_cur)
        leaf_rem = jnp.where(enter_leaf, leaf_count, leaf_rem)

        need_pop = (do_node & none) | leaf_exhausted
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        pop_col = lanes == sp[:, None]
        popped = jnp.max(jnp.where(pop_col, stack, 0), axis=1)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))

        active = active & ~done_by_hit & ~(need_pop & ~can_pop)

        return dict(
            stack=stack,
            sp=sp,
            top=top,
            leaf_cur=leaf_cur,
            leaf_rem=leaf_rem,
            active=active,
            tmax=tmax,
            best_t=best_t,
            best_u=best_u,
            best_v=best_v,
            best_pos=best_pos,
            nodes_visited=s["nodes_visited"] + do_node.astype(jnp.int32),
            leaves_visited=s["leaves_visited"] + enter_leaf.astype(jnp.int32),
        )

    state = jax.lax.while_loop(lambda s: jnp.any(s["active"]), step, state)

    missed = state["best_pos"] == invalid
    prim_id = jnp.where(
        missed,
        invalid,
        bvh.prim_ids[
            jnp.clip(state["best_pos"].astype(jnp.int32), 0, bvh.prim_ids.shape[0] - 1)
        ].astype(jnp.uint32),
    )
    return Hit(
        t=jnp.where(missed, jnp.inf, state["best_t"]),
        u=state["best_u"],
        v=state["best_v"],
        prim_pos=state["best_pos"],
        prim_id=prim_id,
        stats=TraversalStats(state["nodes_visited"], state["leaves_visited"]),
    )


def traverse(
    bvh: Bvh,
    rays: Ray,
    leaf_fn: Callable,
    *,
    any_hit: bool = False,
    robust: bool = False,
    stack_depth: int = 64,
    start=None,
    block_size: int | None = None,
    node_gather: str = "auto",
):
    """Trace a batch of rays through `bvh`.

    `leaf_fn(prim_pos, rays_now) -> (hit, t, u, v)` intersects one
    primitive position per ray (arrays [R]); it is called once per leaf
    step with the current (shortened) ray intervals. Returns a `Hit`.

    `start`: packed index word(s) to start from; defaults to the root's
    index (the reference starts from `bvh.get_root().index`,
    test/simple_example.cpp:81-92, so the root bbox is never tested).

    `block_size`: rays per `lax.map` block (None = auto).
    `node_gather`: "take" | "onehot" | "auto" (one-hot MXU gathers for
    small node tables).
    """
    R = rays.tmin.shape[0]
    idx_dtype = bvh.index.dtype
    cap = bvh.index.shape[0]

    if node_gather == "auto":
        node_gather = (
            "onehot"
            if cap <= ONEHOT_MAX_NODES and bvh.bounds.dtype == jnp.float32
            else "take"
        )
    pair_fetch = _make_pair_gather(bvh, node_gather)

    if start is None:
        start = bvh.index[0]

    if block_size is None:
        block_size = DEFAULT_BLOCK
    block_size = min(block_size, max(R, 1))

    core = partial(
        _traverse_block,
        bvh,
        leaf_fn=leaf_fn,
        pair_fetch=pair_fetch,
        any_hit=any_hit,
        robust=robust,
        stack_depth=stack_depth,
        start=start,
    )

    if R <= block_size:
        return core(rays)

    pad = (-R) % block_size
    if pad:
        def pad_ray(x, fill):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        # Padding rays carry an empty interval (tmin > tmax): every slab
        # test fails, so they finish on the first step.
        rays = Ray(
            pad_ray(rays.org, 0.0),
            pad_ray(rays.dir, 1.0),
            pad_ray(rays.tmin, 1.0),
            pad_ray(rays.tmax, 0.0),
        )
    n_blocks = (R + pad) // block_size
    rays_b = jax.tree.map(
        lambda x: x.reshape(n_blocks, block_size, *x.shape[1:]), rays
    )
    hit_b = jax.lax.map(core, rays_b)
    hit = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:])[:R], hit_b)
    return hit


def make_tri_leaf_fn(bvh: Bvh, tri_flat, permuted: bool = False,
                     gather: str = "auto"):
    """Leaf intersector over precomputed triangles.

    `tri_flat`: [m, 12] (p0|e1|e2|n) rows, see PrecomputedTri.as_flat.
    With `permuted=True`, `tri_flat` is assumed pre-permuted by
    `bvh.prim_ids`, skipping the indirection (the reference documents
    the same optimization, index.h:23-25 and
    test/simple_example.cpp:54-64). With `gather="onehot"` (or "auto"
    for small meshes) the per-leaf fetch is an MXU one-hot matmul over a
    position-indexed table (the permutation folds into the table).
    """
    from bvh_tpu.geom.tri import PrecomputedTri

    m = tri_flat.shape[0]
    n_pos = bvh.prim_ids.shape[0]
    if gather == "auto":
        gather = (
            "onehot"
            if m <= ONEHOT_MAX_PRIMS and tri_flat.dtype == jnp.float32
            else "take"
        )

    if gather == "onehot":
        # Fold the prim_ids indirection into the table: index by position.
        if permuted:
            by_pos = tri_flat
        else:
            by_pos = tri_flat[jnp.clip(bvh.prim_ids.astype(jnp.int32), 0, m - 1)]
        P = _round_up(n_pos, 128)
        table = jnp.zeros((P, 12), tri_flat.dtype).at[:n_pos].set(by_pos)

        def leaf_fn(prim_pos, rays_now):
            tri = PrecomputedTri.from_flat(_onehot_matmul(prim_pos, table))
            t, u, v, hit = tri.intersect(rays_now)
            return hit, t, u, v

        return leaf_fn

    def leaf_fn(prim_pos, rays_now):
        pos = jnp.clip(prim_pos, 0, n_pos - 1)
        if permuted:
            tri_idx = pos
        else:
            tri_idx = jnp.clip(bvh.prim_ids[pos].astype(jnp.int32), 0, m - 1)
        tri = PrecomputedTri.from_flat(tri_flat[tri_idx])
        t, u, v, hit = tri.intersect(rays_now)
        return hit, t, u, v

    return leaf_fn


def make_sphere_leaf_fn(bvh: Bvh, centers, radii, permuted: bool = False):
    """Leaf intersector over spheres (reference: sphere.h:31-49 via the
    generic leaf-callback mechanism). Reports the entry distance t0 as
    the hit t; u carries t0 and v carries t1."""
    from bvh_tpu.geom.sphere import Sphere

    m = centers.shape[0]
    n_pos = bvh.prim_ids.shape[0]

    def leaf_fn(prim_pos, rays_now):
        pos = jnp.clip(prim_pos, 0, n_pos - 1)
        if permuted:
            idx = pos
        else:
            idx = jnp.clip(bvh.prim_ids[pos].astype(jnp.int32), 0, m - 1)
        sph = Sphere(centers[idx], radii[idx])
        t0, t1, hit = sph.intersect(rays_now)
        return hit, t0, t0, t1

    return leaf_fn


@partial(
    jax.jit,
    static_argnames=(
        "any_hit", "robust", "stack_depth", "permuted", "block_size", "node_gather",
    ),
)
def intersect_tris(
    bvh: Bvh,
    tri_flat,
    rays: Ray,
    *,
    any_hit: bool = False,
    robust: bool = False,
    stack_depth: int = 64,
    permuted: bool = False,
    block_size: int | None = None,
    node_gather: str = "auto",
) -> Hit:
    """Closest- or any-hit ray/triangle-mesh intersection
    (the vectorized equivalent of `bvh.intersect` + `PrecomputedTri`
    leaf loops in test/simple_example.cpp:66-92)."""
    leaf_fn = make_tri_leaf_fn(bvh, tri_flat, permuted=permuted)
    return traverse(
        bvh, rays, leaf_fn,
        any_hit=any_hit, robust=robust, stack_depth=stack_depth,
        block_size=block_size, node_gather=node_gather,
    )
