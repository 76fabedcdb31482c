"""Dim-generic Pallas mega-kernel: sphere leaves, 2D/3D/4D, f32.

The triangle mega-kernel (pallas_kernel.py) is specialized for 3D —
exactly like the reference's `PrecomputedTri<T>`, which is 3-D only
(reference: src/bvh/v2/tri.h:29-45). The reference's OTHER dimensions
(2D/4D BVHs, node.h:18-22, vec.h:13) traverse with a user leaf
callback; the natural primitive at any dimension is the sphere
(reference: sphere.h:14-50, dimension-parametric). This kernel gives
those configurations a fast path:

- the state machine is the same as pallas_kernel.py (one fused table,
  one-hot MXU fetch, top-at-row-0 shift stack, rays in lanes), with
  the slab test looping over `dim` and the leaf step running the
  reference's quadratic sphere intersection (sphere.h:31-49);
- the node-pair row layout needs 4*dim+2 rows: 16-row tables cover
  dim <= 3, dim == 4 uses 24-row tables (Mosaic wants sublane
  multiples of 8);
- semantics match `wavefront.traverse` + `make_sphere_leaf_fn`
  hit-for-hit (t = entry distance t0 clamped to tmin, u = t0,
  v = t1); tests assert agreement.

f64 configurations stay on the XLA wavefront: TPUs have no f64
vector unit, so any Pallas "f64" would be software emulation with
different rounding than the reference's doubles — an honest speed
claim for doubles on this hardware is the emulated-XLA path.
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

PALLAS_MAX_NODES = 2048
PALLAS_MAX_PRIMS = 2048


def _round_up(x, m):
    return -(-x // m) * m


def _make_tables(bvh: Bvh, centers, radii, permuted: bool):
    """node_t [rows, P]: bounds_l (2*dim) | bounds_r (2*dim) | word_l |
    word_r; sph_t [rows, M]: center (dim) | radius. Same row count so
    they concatenate into one fetch table."""
    cap = bvh.index.shape[0]
    dim = bvh.dim
    rows = 16 if dim <= 3 else 24
    pairs = max(1, cap // 2)
    P = _round_up(pairs, 128)
    k = jnp.arange(pairs)
    lc = jnp.clip(2 * k + 1, 0, cap - 1)
    rc = jnp.clip(2 * k + 2, 0, cap - 1)
    node_rows = jnp.concatenate(
        [
            bvh.bounds[lc],
            bvh.bounds[rc],
            bvh.index[lc].astype(jnp.float32)[:, None],
            bvh.index[rc].astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    C = node_rows.shape[1]
    node_t = jnp.zeros((rows, P), jnp.float32).at[:C, :pairs].set(node_rows.T)

    m = centers.shape[0]
    n_pos = bvh.prim_ids.shape[0]
    if permuted:
        c_by_pos, r_by_pos = centers, radii
    else:
        idx = jnp.clip(bvh.prim_ids.astype(jnp.int32), 0, m - 1)
        c_by_pos, r_by_pos = centers[idx], radii[idx]
    M = _round_up(n_pos, 128)
    sph_t = jnp.zeros((rows, M), jnp.float32)
    sph_t = sph_t.at[:dim, :n_pos].set(c_by_pos.astype(jnp.float32).T)
    sph_t = sph_t.at[dim, :n_pos].set(r_by_pos.astype(jnp.float32))
    return node_t, sph_t


def _kernel(node_ref, sph_ref, ray_ref, root_ref, fout_ref, iout_ref,
            *, dim, any_hit, robust, stack_depth):
    B = ray_ref.shape[1]
    f32, i32 = jnp.float32, jnp.int32

    rays = ray_ref[:, :]
    org = rays[0:dim]
    dir_ = rays[dim : 2 * dim]
    tmin = rays[2 * dim : 2 * dim + 1]
    tmax0 = rays[2 * dim + 1 : 2 * dim + 2]

    eps = jnp.asarray(np.finfo(np.float32).eps, f32)
    big = jnp.asarray(np.finfo(np.float32).max, f32)
    if robust:
        inv_dir = 1.0 / dir_
    else:
        inv_dir = jnp.where(jnp.abs(dir_) <= eps,
                            jnp.where(jnp.signbit(dir_), -big, big),
                            1.0 / dir_)
    inv_org = -inv_dir * org
    ui = jax.lax.bitcast_convert_type(inv_dir, jnp.uint32)
    padded = jax.lax.bitcast_convert_type(ui + jnp.uint32(2), f32)
    inv_pad = jnp.where(jnp.isfinite(inv_dir), padded, inv_dir)
    neg = jnp.signbit(dir_)

    table = jnp.concatenate([node_ref[:, :], sph_ref[:, :]], axis=1)
    sph_base = node_ref.shape[1]

    def onehot_fetch(idx):
        iota = jax.lax.broadcasted_iota(i32, (table.shape[1], B), 0)
        oh = (iota == idx).astype(f32)
        return jax.lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def slab(bounds, tmax):
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
        jnp.zeros((stack_depth, B), i32),
        jnp.zeros((1, B), i32),                # sp
        jnp.full((1, B), 0, i32) + root_word,  # top
        jnp.zeros((1, B), i32),                # leaf_cur
        jnp.zeros((1, B), i32),                # leaf_rem
        (tmin <= tmax0).astype(i32),           # active
        tmax0,                                 # tmax
        jnp.full((1, B), jnp.inf, f32),        # best_t (= entry t0)
        jnp.zeros((1, B), f32),                # best_u (= t0)
        jnp.zeros((1, B), f32),                # best_v (= t1)
        jnp.full((1, B), -1, i32),             # best_pos
        jnp.zeros((1, B), i32),                # nstat
        jnp.zeros((1, B), i32),                # lstat
    )

    def cond(s):
        return jnp.any(s[5] > 0)

    def body(s):
        (stack, sp, top, leaf_cur, leaf_rem, active_i, tmax,
         best_t, best_u, best_v, best_pos, nstat, lstat) = s
        active = active_i > 0
        in_leaf = active & (leaf_rem > 0)

        fid = top >> 4
        fetch_idx = jnp.where(in_leaf, sph_base + leaf_cur, fid >> 1)
        row = onehot_fetch(fetch_idx)

        # ---- leaf step: sphere quadratic (reference: sphere.h:31-49;
        # same arithmetic as geom/sphere.py::Sphere.intersect) ---------
        center = row[0:dim]
        radius = row[dim : dim + 1]
        oc = org - center
        a = jnp.sum(dir_ * dir_, axis=0, keepdims=True)
        b = 2.0 * jnp.sum(dir_ * oc, axis=0, keepdims=True)
        c = jnp.sum(oc * oc, axis=0, keepdims=True) - radius * radius
        delta = b * b - 4.0 * a * c
        inv = -0.5 / a
        sqrt_delta = jnp.sqrt(jnp.maximum(delta, 0.0))
        t0 = robust_max((b + sqrt_delta) * inv, tmin)
        t1 = robust_min((b - sqrt_delta) * inv, tmax)
        sph_hit = (delta >= 0) & (t0 <= t1) & in_leaf
        best_t = jnp.where(sph_hit, t0, best_t)
        if not any_hit:
            tmax = jnp.where(sph_hit, t0, tmax)
        best_u = jnp.where(sph_hit, t0, best_u)
        best_v = jnp.where(sph_hit, t1, best_v)
        best_pos = jnp.where(sph_hit, leaf_cur, best_pos)
        leaf_cur = jnp.where(in_leaf, leaf_cur + 1, leaf_cur)
        leaf_rem = jnp.where(in_leaf, leaf_rem - 1, leaf_rem)
        done_by_hit = sph_hit if any_hit else jnp.zeros_like(sph_hit)
        leaf_exhausted = in_leaf & (leaf_rem == 0) & ~done_by_hit

        # ---- inner step (identical to pallas_kernel.py) --------------
        in_inner = active & ~in_leaf
        top_count = top & 15
        top_is_leaf = top_count != 0
        enter_leaf = in_inner & top_is_leaf
        do_node = in_inner & ~top_is_leaf

        row_l = row[: 2 * dim]
        row_r = row[2 * dim : 4 * dim]
        base = 4 * dim
        idx_l = row[base : base + 1].astype(i32)
        idx_r = row[base + 1 : base + 2].astype(i32)

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

        push = do_node & both
        # top-at-row-0 shift stack (see wide_treelet._traverse_core):
        # conditional one-row shifts + a free row-0 pop read replace
        # the sp-masked [stack_depth, B] addressing whose mask traffic
        # dominated the iteration's VPU budget
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
        return (stack, sp, top, leaf_cur, leaf_rem, active.astype(i32),
                tmax, best_t, best_u, best_v, best_pos, nstat, lstat)

    out = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, _, _, best_t, best_u, best_v, best_pos,
     nstat, lstat) = out
    zf = jnp.zeros((1, B), f32)
    fout_ref[:, :] = jnp.concatenate(
        [best_t, best_u, best_v, zf, zf, zf, zf, zf], axis=0)
    zi = jnp.zeros((1, B), i32)
    iout_ref[:, :] = jnp.concatenate(
        [best_pos, nstat, lstat, zi, zi, zi, zi, zi], axis=0)


def pallas_fits_spheres(bvh: Bvh, centers) -> bool:
    return (
        bvh.dim in (2, 3, 4)
        and bvh.bounds.dtype == jnp.float32
        and bvh.index.shape[0] <= PALLAS_MAX_NODES
        and centers.shape[0] <= PALLAS_MAX_PRIMS
        and bvh.prim_ids.shape[0] <= PALLAS_MAX_PRIMS
    )


def pallas_intersect_spheres(
    bvh: Bvh,
    centers,
    radii,
    rays: Ray,
    *,
    any_hit: bool = False,
    robust: bool = False,
    stack_depth: int | None = None,
    permuted: bool = False,
    block: int = 8192,
    sort_rays: bool = True,
    interpret: bool = False,
) -> Hit:
    """Sphere closest/any-hit via the dim-generic mega-kernel.

    Same contract as `traverse(bvh, rays, make_sphere_leaf_fn(...))`:
    hit t/u are the entry distance t0 (clamped to tmin), v the exit
    t1. Requires f32 and VMEM-resident scene (pallas_fits_spheres).

    `sort_rays`: group rays by (direction octant, origin Morton code)
    before launch — results are identical (scattered back); off only
    saves the sort when the caller's rays are already coherent."""
    if stack_depth is None:
        from bvh_tpu.traverse.stack import required_stack_depth

        stack_depth = max(16, required_stack_depth(bvh))
    return _pallas_intersect_spheres(
        bvh, centers, radii, rays,
        any_hit=any_hit, robust=robust, stack_depth=stack_depth,
        permuted=permuted, block=block, sort_rays=sort_rays,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("any_hit", "robust", "stack_depth",
                                   "permuted", "block", "sort_rays",
                                   "interpret"))
def _pallas_intersect_spheres(
    bvh: Bvh, centers, radii, rays: Ray, *,
    any_hit: bool, robust: bool, stack_depth: int, permuted: bool,
    block: int, sort_rays: bool, interpret: bool,
) -> Hit:
    cap = bvh.index.shape[0]
    dim = bvh.dim
    assert dim in (2, 3, 4), "sphere kernel supports 2D/3D/4D"
    assert cap <= PALLAS_MAX_NODES and centers.shape[0] <= PALLAS_MAX_PRIMS

    node_t, sph_t = _make_tables(bvh, centers, radii, permuted)
    root = jnp.full((8, 128), bvh.index[0].astype(jnp.int32), jnp.int32)

    R = rays.tmin.shape[0]

    # Coherence sort: a kernel block is lockstep over `block` lanes, so
    # an incoherent ray set must be grouped before launch — direction
    # octant major, then Morton code of the quantized origin — or a few
    # divergent lanes stall every block (measured 0.35 Mrays/s on
    # random rays without the sort). Results scatter back at the end.
    if sort_rays and R > 1:
        i32 = jnp.int32
        neg = (rays.dir < 0).astype(jnp.uint32)            # [R, dim]
        octk = jnp.zeros((R,), jnp.uint32)
        for d in range(dim):
            octk = octk | (neg[:, d] << d)
        lo = jnp.min(rays.org, axis=0, keepdims=True)
        hi = jnp.max(rays.org, axis=0, keepdims=True)
        span = jnp.maximum(hi - lo, 1e-30)
        q = jnp.clip((rays.org - lo) / span * 63.0, 0.0, 63.0)
        from bvh_tpu.core.utils import morton_encode

        mkey = morton_encode(q.astype(jnp.uint32), dim)
        key = (octk << (6 * dim)) | mkey
        iota_r = jnp.arange(R, dtype=i32)
        _, order = jax.lax.sort(
            (key.astype(i32), iota_r), num_keys=1)
        rays = Ray(org=jnp.take(rays.org, order, axis=0),
                   dir=jnp.take(rays.dir, order, axis=0),
                   tmin=jnp.take(rays.tmin, order),
                   tmax=jnp.take(rays.tmax, order))
    else:
        order = None

    pad = (-R) % block
    Rp = R + pad
    ray_rows = 16 if dim == 4 else 8  # 2*dim+2 packed rows
    packed = jnp.zeros((ray_rows, Rp), jnp.float32)
    packed = packed.at[0:dim, :R].set(rays.org.T)
    packed = packed.at[dim : 2 * dim, :R].set(rays.dir.T)
    packed = packed.at[2 * dim, :R].set(rays.tmin)
    packed = packed.at[2 * dim + 1, :R].set(rays.tmax)
    if pad:
        packed = packed.at[2 * dim, R:].set(1.0)
        packed = packed.at[dim, R:].set(1.0)

    n_blocks = Rp // block
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(node_t.shape, lambda i: (0, 0)),
            pl.BlockSpec(sph_t.shape, lambda i: (0, 0)),
            pl.BlockSpec((ray_rows, block), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i)) for _ in range(2)
        ],
    )
    kernel = partial(_kernel, dim=dim, any_hit=any_hit, robust=robust,
                     stack_depth=stack_depth)
    fout, iout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(node_t, sph_t, packed, root)

    t, u, v = fout[0, :R], fout[1, :R], fout[2, :R]
    pos, nstat, lstat = iout[0, :R], iout[1, :R], iout[2, :R]
    if order is not None:
        # scatter results back to caller ray order
        def unsort(x):
            return jnp.zeros_like(x).at[order].set(x)

        t, u, v = unsort(t), unsort(u), unsort(v)
        pos, nstat, lstat = unsort(pos), unsort(nstat), unsort(lstat)
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
