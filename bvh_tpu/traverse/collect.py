"""Phase-A portal-collect kernel, shared by the wide-treelet engine.

Traverses the *top region* of a treelet-decomposed BVH per ray and
records every portal (treelet entry) whose box the ray enters, with its
entry distance. This reproduces the node-visit order and slab-test
semantics of `Bvh::intersect`'s top-down walk (reference:
src/bvh/v2/bvh.h:124-182, node.h:68-88) restricted to the top region;
the per-treelet continuation runs in the wide-treelet pair rounds
(traverse/wide_treelet.py).

Table format ([16, P] f32 pair table, one column per inner node's child
pair) and the one-hot MXU fetch are documented in wide_treelet.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from bvh_tpu.core.utils import robust_max, robust_min


def collect_kernel(node_ref, ray_ref, root_ref, tid_ref, tent_ref, cnt_ref,
                   *, dim, robust, stack_depth, max_portals,
                   fetch_chunk=None):
    """Traverse the top region; record (entry t, portal) per ray for
    every portal (leaf word) whose box is entered.

    `fetch_chunk`: when set, the per-step one-hot node fetch streams
    the node table in column chunks of this size, so peak VMEM for the
    one-hot intermediate is fetch_chunk x block instead of
    table_cols x block (the San-Miguel-scale fix: a 4K-column top
    table at top_block 8192 would otherwise need a 128 MB one-hot)."""
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

    n_cols = node_ref.shape[1]
    chunk = n_cols if fetch_chunk is None else min(fetch_chunk, n_cols)

    # NOTE: phase A keeps the f32 HIGHEST-precision fetch. The 3x-bf16
    # scheme (onehot.py) does not fuse at phase-A widths (B up to 8192:
    # the bf16 one-hot materializes in scoped VMEM, +8 MB at 384x8192,
    # OOM) and phase A is not fetch-bound — its tables are kept small
    # by the super level. The wide/A2 kernels (B <= ~1024) use it.
    if chunk == n_cols:
        table = node_ref[:, :]

        def fetch(idx):
            iota = jax.lax.broadcasted_iota(i32, (n_cols, B), 0)
            oh = (iota == idx).astype(f32)
            return jax.lax.dot_general(
                table, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )
    else:
        # A python chunk loop unrolls, keeping every chunk's one-hot
        # live at once (measured: 84 MB scoped at 7 x [1024, 4096] —
        # the Mosaic compile fails); a fori_loop keeps exactly one.
        # The chunk slice reads the ref with a dynamic pl.ds offset
        # (Mosaic lowers ref slicing; lax.dynamic_slice on a value it
        # does not). The caller pads the table to a chunk multiple
        # (zero columns are never addressed: idx < real cols).
        assert n_cols % chunk == 0, (n_cols, chunk)
        rows = node_ref.shape[0]

        def fetch(idx):
            def body(ci, acc):
                c = pl.multiple_of(ci * chunk, chunk)
                iota = jax.lax.broadcasted_iota(i32, (chunk, B), 0) + c
                oh = (iota == idx).astype(f32)
                tbl = node_ref[:, pl.ds(c, chunk)]
                return acc + jax.lax.dot_general(
                    tbl, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            return jax.lax.fori_loop(
                0, n_cols // chunk, body, jnp.zeros((rows, B), f32))

    def slab(bounds):
        t0, t1 = tmin, tmax0
        for i in range(dim):
            lo = bounds[2 * i : 2 * i + 1]
            hi = bounds[2 * i + 1 : 2 * i + 2]
            ng = neg[i : i + 1]
            nb = jnp.where(ng, hi, lo)
            fb = jnp.where(ng, lo, hi)
            if robust:
                tn = (nb - org[i : i + 1]) * inv_dir[i : i + 1]
                tf = (fb - org[i : i + 1]) * inv_pad[i : i + 1]
            else:
                tn = nb * inv_dir[i : i + 1] + inv_org[i : i + 1]
                tf = fb * inv_dir[i : i + 1] + inv_org[i : i + 1]
            t0 = robust_max(tn, t0)
            t1 = robust_min(tf, t1)
        return t0, t1

    root_word = root_ref[0, 0]
    state = (
        jnp.zeros((stack_depth, B), i32),
        jnp.zeros((1, B), i32),                 # sp
        jnp.full((1, B), 0, i32) + root_word,   # top word
        (tmin <= tmax0).astype(i32),            # active
        jnp.full((max_portals, B), -1, i32),    # portal ids
        jnp.full((max_portals, B), jnp.inf, f32),  # portal entry t
        jnp.zeros((1, B), i32),                 # portal count
        jnp.zeros((1, B), i32),                 # stack high-water mark
    )

    def cond(s):
        return jnp.any(s[3] > 0)

    def body(s):
        stack, sp, top, active_i, ptid, ptent, pcnt, hwm = s
        active = active_i > 0
        # a "leaf" top word is a portal the root-level may hand us
        # directly (single-treelet scenes): record at t = tmin.
        top_is_leaf = (top & 15) != 0
        rec_root = active & top_is_leaf
        lanes_p = jax.lax.broadcasted_iota(i32, (max_portals, B), 0)
        rec_row = (lanes_p == pcnt) & rec_root & (pcnt < max_portals)
        ptid = jnp.where(rec_row, top >> 4, ptid)
        ptent = jnp.where(rec_row, tmin, ptent)
        pcnt = jnp.where(rec_root, pcnt + 1, pcnt)

        do_node = active & ~top_is_leaf
        fid = top >> 4
        nrow = fetch(fid >> 1)
        row_l = nrow[: 2 * dim]
        row_r = nrow[2 * dim : 4 * dim]
        idx_l = nrow[4 * dim : 4 * dim + 1].astype(i32)
        idx_r = nrow[4 * dim + 1 : 4 * dim + 2].astype(i32)
        tl0, tl1 = slab(row_l)
        tr0, tr1 = slab(row_r)
        hit_l = (tl0 <= tl1) & do_node
        hit_r = (tr0 <= tr1) & do_node
        leaf_l = (idx_l & 15) != 0
        leaf_r = (idx_r & 15) != 0

        # record portal children immediately (up to 2 per step)
        rec_l = hit_l & leaf_l
        rec_row = (lanes_p == pcnt) & rec_l & (pcnt < max_portals)
        ptid = jnp.where(rec_row, idx_l >> 4, ptid)
        ptent = jnp.where(rec_row, tl0, ptent)
        pcnt = jnp.where(rec_l, pcnt + 1, pcnt)
        rec_r = hit_r & leaf_r
        rec_row = (lanes_p == pcnt) & rec_r & (pcnt < max_portals)
        ptid = jnp.where(rec_row, idx_r >> 4, ptid)
        ptent = jnp.where(rec_row, tr0, ptent)
        pcnt = jnp.where(rec_r, pcnt + 1, pcnt)

        # descend only into inner children
        dl = hit_l & ~leaf_l
        dr = hit_r & ~leaf_r
        both = dl & dr
        swap = tl0 > tr0
        near = jnp.where(swap, idx_r, idx_l)
        far = jnp.where(swap, idx_l, idx_r)
        new_top = jnp.where(both, near, jnp.where(dl, idx_l, idx_r))
        descend = do_node & (dl | dr)

        push = do_node & both
        # top-at-row-0 shift stack (see wide_treelet._traverse_core):
        # a push/pop is a conditional one-row shift and the pop read is
        # row 0 — cheaper than sp-masked addressing at [stack_depth, B]
        stack = jnp.where(
            push, jnp.concatenate([far, stack[:-1]], axis=0), stack)
        sp = jnp.where(push, sp + 1, sp)
        hwm = jnp.maximum(hwm, sp)  # exact needed stack depth

        need_pop = active & ~descend  # includes portal-only and miss steps
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = stack[0:1]
        stack = jnp.where(
            can_pop,
            jnp.concatenate([stack[1:], jnp.zeros((1, B), i32)], axis=0),
            stack)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~(need_pop & ~can_pop)
        return (stack, sp, top, active.astype(i32), ptid, ptent, pcnt,
                hwm)

    out = jax.lax.while_loop(cond, body, state)
    _, _, _, _, ptid, ptent, pcnt, hwm = out
    tid_ref[:, :] = ptid
    tent_ref[:, :] = ptent
    # row 0: portal count (the consumer contract); row 1: stack
    # high-water mark (lets callers derive a tight top_stack for
    # steady-state chains); rows 2-7: count again (legacy padding)
    cnt_ref[:, :] = jnp.concatenate(
        [pcnt, hwm, jnp.broadcast_to(pcnt, (6, B))], axis=0)


# Backwards-compatible alias (the kernel lived in traverse/treelet.py
# through round 2; the two-phase driver that surrounded it was
# superseded by wide_treelet and removed in round 3).
_collect_kernel = collect_kernel
