"""Pallas TPU mega-kernel traversal for VMEM-resident scenes.

The XLA wavefront (`wavefront.py`) emits several kernels per traversal
step; under a `lax.while_loop` that per-iteration overhead dominates.
This kernel runs the ENTIRE traversal loop on-chip in one launch:

- the node pair table and triangle table live in VMEM for the whole
  kernel (scenes up to ~2K nodes / ~2K tris; larger scenes use the XLA
  path or the wide layout);
- node/triangle fetches are one-hot MXU matmuls at
  `Precision.HIGHEST`, which Mosaic executes exactly on f32 (verified
  on hardware: zero-ULP gathers). bf16 multi-plane splits ARE exact
  when the FLT_MAX empty-slot sentinel is half-scaled first (the
  round-1 "not exact" reading was that sentinel overflowing bf16 —
  see traverse/onehot.py, round 4); they are just not FASTER here:
  this kernel runs 8192-wide blocks over tiny tables and is VPU-bound
  (~14 us/while-iteration), so cheaper dots don't move it, unlike the
  fetch-bound wide-treelet kernel where the split fetch won +8-50%.
  Packed index words ride along as f32 columns (exact below 2^24,
  enforced by PALLAS_MAX_NODES);
- the per-ray short stack keeps its top at row 0: pushes/pops are
  conditional one-row shifts and the pop read is free (no dynamic
  per-lane indexing, which Mosaic cannot vectorize; cheaper than the
  earlier sp-masked addressing);
- rays live in the LANE dimension: all per-ray state is [k, B]-shaped
  (B = ray block in lanes), fetches come out as [C, B] matmul results,
  so every elementwise op runs at full VPU width.

Semantics match `wavefront.traverse` exactly (same state machine,
reference: bvh.h:124-182); tests assert hit-for-hit agreement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import Bvh
from bvh_tpu.core.utils import robust_max, robust_min
from bvh_tpu.traverse.wavefront import Hit, TraversalStats

PALLAS_MAX_NODES = 2048  # pair table <= 1024 lanes
PALLAS_MAX_PRIMS = 2048


def _round_up(x, m):
    return -(-x // m) * m


def _make_tables(bvh: Bvh, tri_flat, permuted: bool):
    """Transposed f32 VMEM tables: node_t [16, P] and tri_t [16, M].

    node rows: bounds_l (2*dim), bounds_r (2*dim), word_l, word_r
    (index words as f32, exact below 2^24). tri rows: p0|e1|e2|n.
    """
    cap = bvh.index.shape[0]
    dim = bvh.dim
    pairs = max(1, cap // 2)
    P = _round_up(pairs, 128)
    k = jnp.arange(pairs)
    lc = jnp.clip(2 * k + 1, 0, cap - 1)
    rc = jnp.clip(2 * k + 2, 0, cap - 1)
    rows = jnp.concatenate(
        [
            bvh.bounds[lc],
            bvh.bounds[rc],
            bvh.index[lc].astype(jnp.float32)[:, None],
            bvh.index[rc].astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [p, 4*dim+2]
    C = rows.shape[1]
    node_t = jnp.zeros((16, P), jnp.float32).at[:C, :pairs].set(rows.T)

    m = tri_flat.shape[0]
    n_pos = bvh.prim_ids.shape[0]
    if permuted:
        by_pos = tri_flat
    else:
        by_pos = tri_flat[jnp.clip(bvh.prim_ids.astype(jnp.int32), 0, m - 1)]
    M = _round_up(n_pos, 128)
    tri_t = jnp.zeros((16, M), jnp.float32).at[:12, :n_pos].set(
        by_pos.astype(jnp.float32).T
    )
    return node_t, tri_t


def _kernel(node_ref, tri_ref, ray_ref, root_ref,
            fout_ref, iout_ref,
            *, dim, any_hit, robust, stack_depth, unroll):
    B = ray_ref.shape[1]
    P = node_ref.shape[1]
    M = tri_ref.shape[1]
    f32 = jnp.float32
    i32 = jnp.int32

    rays = ray_ref[:, :]
    org = rays[0:dim]                      # [dim, B]
    dir_ = rays[dim : 2 * dim]
    tmin = rays[2 * dim : 2 * dim + 1]     # [1, B]
    tmax0 = rays[2 * dim + 1 : 2 * dim + 2]

    eps = jnp.asarray(np.finfo(np.float32).eps, f32)
    big = jnp.asarray(np.finfo(np.float32).max, f32)
    if robust:
        inv_dir = 1.0 / dir_
    else:
        inv_dir = jnp.where(
            jnp.abs(dir_) <= eps,
            jnp.where(jnp.signbit(dir_), -big, big),
            1.0 / dir_,
        )
    inv_org = -inv_dir * org
    ui = jax.lax.bitcast_convert_type(inv_dir, jnp.uint32)
    padded = jax.lax.bitcast_convert_type(ui + jnp.uint32(2), f32)
    inv_pad = jnp.where(jnp.isfinite(inv_dir), padded, inv_dir)
    neg = jnp.signbit(dir_)

    # One combined table: node pair columns then triangle columns.
    # Each lane is in exactly one phase per iteration, so a single
    # fetched [16, B] row serves as EITHER a node pair or a triangle —
    # one one-hot + one dot per iteration instead of two of each.
    table = jnp.concatenate([node_ref[:, :], tri_ref[:, :]], axis=1)
    tri_base = node_ref.shape[1]

    def onehot_fetch(idx, table):
        """idx [1, B] int32 -> [C, B] exact gather.

        Precision.HIGHEST makes the f32 matmul exact on the MXU
        (verified zero-ULP on hardware); the matmul IS a gather.
        """
        iota = jax.lax.broadcasted_iota(i32, (table.shape[1], B), 0)
        oh = (iota == idx).astype(f32)
        return jax.lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def slab(bounds, tmax):
        """bounds [2*dim, B] interleaved; returns (t0, t1) [1, B]."""
        t0, t1 = tmin, tmax
        for i in range(dim):
            lo = bounds[2 * i : 2 * i + 1]
            hi = bounds[2 * i + 1 : 2 * i + 2]
            ng = neg[i : i + 1]
            near_b = jnp.where(ng, hi, lo)
            far_b = jnp.where(ng, lo, hi)
            if robust:
                tn = (near_b - org[i : i + 1]) * inv_dir[i : i + 1]
                tf = (far_b - org[i : i + 1]) * inv_pad[i : i + 1]
            else:
                tn = near_b * inv_dir[i : i + 1] + inv_org[i : i + 1]
                tf = far_b * inv_dir[i : i + 1] + inv_org[i : i + 1]
            t0 = robust_max(tn, t0)
            t1 = robust_min(tf, t1)
        return t0, t1

    root_word = root_ref[0, 0]
    state = (
        jnp.zeros((stack_depth, B), i32),          # stack
        jnp.zeros((1, B), i32),                    # sp
        jnp.full((1, B), 0, i32) + root_word,      # top
        jnp.zeros((1, B), i32),                    # leaf_cur
        jnp.zeros((1, B), i32),                    # leaf_rem
        (tmin <= tmax0).astype(i32),               # active [1, B] (i32: Mosaic rejects bool carries)
        tmax0,                                     # tmax
        jnp.full((1, B), jnp.inf, f32),            # best_t
        jnp.zeros((1, B), f32),                    # best_u
        jnp.zeros((1, B), f32),                    # best_v
        jnp.full((1, B), -1, i32),                 # best_pos
        jnp.zeros((1, B), i32),                    # nstat
        jnp.zeros((1, B), i32),                    # lstat
    )

    def cond(s):
        return jnp.any(s[5] > 0)

    def body(s):
        (stack, sp, top, leaf_cur, leaf_rem, active_i, tmax,
         best_t, best_u, best_v, best_pos, nstat, lstat) = s
        active = active_i > 0
        in_leaf = active & (leaf_rem > 0)

        # ---- combined fetch (node pair or triangle, per lane) --------
        fid = top >> 4
        fetch_idx = jnp.where(in_leaf, tri_base + leaf_cur, fid >> 1)
        row = onehot_fetch(fetch_idx, table)

        # ---- leaf step: Möller–Trumbore on one prim ------------------
        tri = row
        p0, e1, e2, nrm = tri[0:3], tri[3:6], tri[6:9], tri[9:12]
        cvec = p0 - org
        rvec = jnp.concatenate(
            [
                dir_[1:2] * cvec[2:3] - dir_[2:3] * cvec[1:2],
                dir_[2:3] * cvec[0:1] - dir_[0:1] * cvec[2:3],
                dir_[0:1] * cvec[1:2] - dir_[1:2] * cvec[0:1],
            ],
            axis=0,
        )
        inv_det = 1.0 / jnp.sum(nrm * dir_, axis=0, keepdims=True)
        uu = jnp.sum(rvec * e2, axis=0, keepdims=True) * inv_det
        vv = jnp.sum(rvec * e1, axis=0, keepdims=True) * inv_det
        ww = 1.0 - uu - vv
        tt = jnp.sum(nrm * cvec, axis=0, keepdims=True) * inv_det
        tol = -eps
        tri_hit = ((uu >= tol) & (vv >= tol) & (ww >= tol)
                   & (tt >= tmin) & (tt <= tmax) & in_leaf)
        best_t = jnp.where(tri_hit, tt, best_t)
        if not any_hit:
            tmax = jnp.where(tri_hit, tt, tmax)
        best_u = jnp.where(tri_hit, uu, best_u)
        best_v = jnp.where(tri_hit, vv, best_v)
        best_pos = jnp.where(tri_hit, leaf_cur, best_pos)
        leaf_cur = jnp.where(in_leaf, leaf_cur + 1, leaf_cur)
        leaf_rem = jnp.where(in_leaf, leaf_rem - 1, leaf_rem)
        done_by_hit = tri_hit if any_hit else jnp.zeros_like(tri_hit)
        leaf_exhausted = in_leaf & (leaf_rem == 0) & ~done_by_hit

        # ---- inner step ----------------------------------------------
        in_inner = active & ~in_leaf
        top_count = top & 15
        top_is_leaf = top_count != 0
        enter_leaf = in_inner & top_is_leaf
        do_node = in_inner & ~top_is_leaf

        nrow = row
        row_l = nrow[: 2 * dim]
        row_r = nrow[2 * dim : 4 * dim]
        base = 4 * dim
        idx_l = nrow[base : base + 1].astype(i32)
        idx_r = nrow[base + 1 : base + 2].astype(i32)

        tl0, tl1 = slab(row_l, tmax)
        tr0, tr1 = slab(row_r, tmax)
        hit_l = tl0 <= tl1
        hit_r = tr0 <= tr1
        swap = (tl0 > tr0) if not any_hit else jnp.zeros_like(hit_l)
        near = jnp.where(swap, idx_r, idx_l)
        far = jnp.where(swap, idx_l, idx_r)
        both = hit_l & hit_r
        one_l = hit_l & ~hit_r
        none = ~hit_l & ~hit_r
        new_top = jnp.where(both, near, jnp.where(one_l, idx_l, idx_r))
        descend = do_node & ~none

        # A push at sp == stack_depth drops the BOTTOM entry (top-at-0
        # shift stack, see wide_treelet._traverse_core); callers default
        # to the exact required_stack_depth so this cannot trigger in
        # practice. Shift-push/pop + the free row-0 pop read replace the
        # sp-masked [stack_depth, B] addressing whose mask traffic
        # dominated the iteration's VPU budget.
        push = do_node & both
        stack = jnp.where(
            push, jnp.concatenate([far, stack[:-1]], axis=0), stack)
        sp = jnp.where(push, jnp.minimum(sp + 1, stack_depth), sp)

        leaf_cur = jnp.where(enter_leaf, fid, leaf_cur)
        leaf_rem = jnp.where(enter_leaf, top_count, leaf_rem)

        need_pop = (do_node & none) | leaf_exhausted
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[0:1]
        stack = jnp.where(
            can_pop,
            jnp.concatenate([stack[1:], jnp.zeros((1, B), i32)], axis=0),
            stack)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~done_by_hit & ~(need_pop & ~can_pop)
        nstat = nstat + do_node.astype(i32)
        lstat = lstat + enter_leaf.astype(i32)
        return (stack, sp, top, leaf_cur, leaf_rem, active.astype(i32), tmax,
                best_t, best_u, best_v, best_pos, nstat, lstat)

    # Unroll the state machine inside the while body: a step is a no-op
    # for inactive lanes, so chaining steps is semantically free and
    # amortizes the loop's per-iteration overhead (cond evaluation,
    # carry handling).
    def body_unrolled(s):
        for _ in range(unroll):
            s = body(s)
        return s

    out = jax.lax.while_loop(cond, body_unrolled, state)
    (_, _, _, _, _, _, _, best_t, best_u, best_v, best_pos, nstat, lstat) = out
    zf = jnp.zeros((1, B), f32)
    fout_ref[:, :] = jnp.concatenate(
        [best_t, best_u, best_v, zf, zf, zf, zf, zf], axis=0
    )
    zi = jnp.zeros((1, B), i32)
    iout_ref[:, :] = jnp.concatenate(
        [best_pos, nstat, lstat, zi, zi, zi, zi, zi], axis=0
    )


def pallas_fits(bvh: Bvh, tri_flat) -> bool:
    """Whether the single-launch kernel can take this scene.

    Gates on the STATIC allocated capacities the kernel asserts on
    (bvh.index.shape[0] can exceed node_count for mini-tree builds), so
    a True here never turns into a kernel assert."""
    return (
        bvh.dim == 3
        and bvh.bounds.dtype == jnp.float32
        and bvh.index.shape[0] <= PALLAS_MAX_NODES
        and tri_flat.shape[0] <= PALLAS_MAX_PRIMS
        and bvh.prim_ids.shape[0] <= PALLAS_MAX_PRIMS
    )


def pallas_intersect_tris(
    bvh: Bvh,
    tri_flat,
    rays: Ray,
    *,
    any_hit: bool = False,
    robust: bool = False,
    stack_depth: int | None = None,
    permuted: bool = False,
    block: int = 8192,
    interpret: bool = False,
    unroll: int = 1,  # measured: unrolling does not help (loop overhead is negligible)
) -> Hit:
    """Triangle closest/any-hit via the single-launch Pallas kernel.

    Requires node count <= PALLAS_MAX_NODES and prim count <=
    PALLAS_MAX_PRIMS (VMEM residency); callers fall back to
    `intersect_tris` beyond that. `stack_depth=None` sizes the per-ray
    stack exactly for this tree (one host-side depth computation).
    """
    if stack_depth is None:
        from bvh_tpu.traverse.stack import required_stack_depth

        stack_depth = max(16, required_stack_depth(bvh))
    return _pallas_intersect_tris(
        bvh, tri_flat, rays,
        any_hit=any_hit, robust=robust, stack_depth=stack_depth,
        permuted=permuted, block=block, interpret=interpret, unroll=unroll,
    )


@partial(jax.jit, static_argnames=("any_hit", "robust", "stack_depth",
                                   "permuted", "block", "interpret", "unroll"))
def _pallas_intersect_tris(
    bvh: Bvh,
    tri_flat,
    rays: Ray,
    *,
    any_hit: bool,
    robust: bool,
    stack_depth: int,
    permuted: bool,
    block: int,
    interpret: bool,
    unroll: int,
) -> Hit:
    cap = bvh.index.shape[0]
    dim = bvh.dim
    assert dim == 3, "pallas kernel is specialized for 3D triangles"
    assert cap <= PALLAS_MAX_NODES and tri_flat.shape[0] <= PALLAS_MAX_PRIMS

    node_t, tri_t = _make_tables(bvh, tri_flat, permuted)
    root = jnp.full((8, 128), bvh.index[0].astype(jnp.int32), jnp.int32)

    R = rays.tmin.shape[0]
    pad = (-R) % block
    Rp = R + pad
    # Pack rays as [8, Rp]: org xyz, dir xyz, tmin, tmax (rays in lanes).
    packed = jnp.zeros((8, Rp), jnp.float32)
    packed = packed.at[0:dim, :R].set(rays.org.T)
    packed = packed.at[dim : 2 * dim, :R].set(rays.dir.T)
    packed = packed.at[2 * dim, :R].set(rays.tmin)
    packed = packed.at[2 * dim + 1, :R].set(rays.tmax)
    if pad:
        packed = packed.at[2 * dim, R:].set(1.0)   # tmin > tmax: inactive
        packed = packed.at[dim, R:].set(1.0)

    n_blocks = Rp // block
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(node_t.shape, lambda i: (0, 0)),
            pl.BlockSpec(tri_t.shape, lambda i: (0, 0)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i)) for _ in range(2)
        ],
    )
    kernel = partial(
        _kernel, dim=dim, any_hit=any_hit, robust=robust,
        stack_depth=stack_depth, unroll=unroll,
    )
    fout, iout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(node_t, tri_t, packed, root)

    t, u, v = fout[0, :R], fout[1, :R], fout[2, :R]
    pos, nstat, lstat = iout[0, :R], iout[1, :R], iout[2, :R]
    invalid = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    missed = pos < 0
    pos_u = jnp.where(missed, invalid, pos.astype(jnp.uint32))
    prim_id = jnp.where(
        missed, invalid,
        bvh.prim_ids[
            jnp.clip(pos, 0, bvh.prim_ids.shape[0] - 1)
        ].astype(jnp.uint32),
    )
    return Hit(
        t=jnp.where(missed, jnp.inf, t),
        u=u, v=v, prim_pos=pos_u, prim_id=prim_id,
        stats=TraversalStats(nstat, lstat),
    )
