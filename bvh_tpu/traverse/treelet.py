"""Two-phase treelet traversal for scenes beyond VMEM.

The VMEM mega-kernel (pallas_kernel.py) caps out around 2K nodes. For
large scenes the tree is cut into *treelets* of bounded size:

- Phase A (top): the top region (every node whose subtree exceeds the
  treelet capacity) is itself a small tree whose leaves are *portals*
  to treelets. The collect kernel traverses it per ray and records
  every portal whose box the ray enters, with its entry distance.
- Phase B (rounds): rays sort by their nearest pending treelet; blocks
  of rays then traverse one treelet each, with the treelet's node and
  triangle tables streamed HBM->VMEM by the Pallas pipeline via
  scalar-prefetch index maps (PrefetchScalarGridSpec) — sequential
  DMA, no random gathers anywhere. Shrinking tmax prunes remaining
  portals between rounds; rounds repeat until no ray has a pending
  portal nearer than its current hit.

This reproduces `Bvh::intersect` results on arbitrary-size scenes
(reference: bvh.h:124-182): portals are processed per ray in ascending
entry order, so closest-hit termination is exact, and any-hit stops at
the first confirmed hit.

Preprocessing (`build_treelets`) is host-side numpy, one-time per BVH,
like the reference's PrecomputedTri step.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bvh_tpu.core.ray import Ray
from bvh_tpu.core.types import Bvh
from bvh_tpu.core.utils import robust_max, robust_min
from bvh_tpu.traverse.wavefront import Hit, TraversalStats

MAX_PORTALS = 64  # per-ray portal list capacity (phase A)


class Treelets(NamedTuple):
    """Preprocessed two-level scene.

    top_node_t: [16, Pt]      top-region pair table (VMEM kernel format);
                              top leaves are portal words
                              (treelet_id << 4 | 1).
    top_root:   int           top root word.
    node_t:     [T, 16, Pn]   per-treelet pair tables; leaf words hold
                              TREELET-LOCAL prim positions.
    root_w:     [T]           per-treelet root word (may be a leaf word).
    tri_t:      [T, 16, Pm]   per-treelet triangle tables; row 12 is the
                              GLOBAL prim position (f32-exact).
    """

    top_node_t: jnp.ndarray
    top_root: int
    node_t: jnp.ndarray
    root_w: jnp.ndarray
    tri_t: jnp.ndarray


def _round_up(x, m):
    return -(-x // m) * m


def build_treelets(bvh: Bvh, tri_flat, permuted: bool = False,
                   max_nodes: int = 1024) -> Treelets:
    """Cut `bvh` into treelets of at most `max_nodes` nodes and pack
    the kernel tables (host-side numpy). max_nodes=1024 with block=512
    measured fastest on hardware (PERFORMANCE.md)."""
    nc = int(bvh.node_count)
    dim = bvh.dim
    assert dim == 3
    bounds = np.asarray(bvh.bounds[:nc])
    index = np.asarray(bvh.index[:nc]).astype(np.uint64)
    first = (index >> 4).astype(np.int64)
    count = (index & 15).astype(np.int64)
    prim_ids = np.asarray(bvh.prim_ids).astype(np.int64)
    tri_np = np.asarray(tri_flat, np.float32)

    # subtree sizes, children-before-parents is not guaranteed after
    # reinsertion, so do a post-order via explicit stack.
    size = np.ones(nc, np.int64)
    stack = [(0, False)]
    while stack:
        node, processed = stack.pop()
        if count[node] != 0:
            continue
        if processed:
            size[node] = 1 + size[first[node]] + size[first[node] + 1]
        else:
            stack.append((node, True))
            stack.append((int(first[node]), False))
            stack.append((int(first[node]) + 1, False))

    # treelet roots: size <= max_nodes, parent size > max_nodes.
    troots: list[int] = []
    top_nodes: list[int] = []
    if size[0] <= max_nodes:
        troots = [0]
    else:
        stack = [0]
        while stack:
            n = stack.pop()
            top_nodes.append(n)
            for c in (int(first[n]), int(first[n]) + 1):
                if size[c] <= max_nodes:
                    troots.append(c)
                else:
                    stack.append(c)

    T = len(troots)

    # ---- per-treelet tables ----------------------------------------
    troot_words = np.zeros(T, np.int64)
    tre_pairs: list[np.ndarray] = []
    tre_prims: list[np.ndarray] = []
    max_pairs = 1
    max_prims = 1
    for t, root in enumerate(troots):
        # BFS over the subtree, relabeling pairs and prims locally.
        order = []
        queue = deque([root])
        while queue:
            n = queue.popleft()
            order.append(n)
            if count[n] == 0:
                queue.append(int(first[n]))
                queue.append(int(first[n]) + 1)
        prim_positions = []
        pos_local = {}
        # local ids: root is implicit (root word), pairs numbered in BFS.
        inner_nodes = [n for n in order if count[n] == 0]
        pair_base = {}
        for k, n in enumerate(inner_nodes):
            pair_base[n] = k  # pair k = children of inner node n
        for n in order:
            if count[n] != 0:
                for p in range(int(first[n]), int(first[n] + count[n])):
                    pos_local[p] = len(prim_positions)
                    prim_positions.append(p)

        def local_word(n):
            if count[n] != 0:
                return (pos_local[int(first[n])] << 4) | int(count[n])
            # children of n live at pair pair_base[n]: local node ids
            # for the kernel are 2k+1, 2k+2 (pair id k = fid >> 1).
            return (2 * pair_base[n] + 1) << 4

        troot_words[t] = local_word(root)
        rows = np.zeros((len(inner_nodes), 14), np.float32)
        for n in inner_nodes:
            k = pair_base[n]
            l, r = int(first[n]), int(first[n]) + 1
            rows[k, 0:6] = bounds[l]
            rows[k, 6:12] = bounds[r]
            rows[k, 12] = float(local_word(l))
            rows[k, 13] = float(local_word(r))
        tre_pairs.append(rows)
        max_pairs = max(max_pairs, len(rows))

        prows = np.zeros((len(prim_positions), 13), np.float32)
        for j, p in enumerate(prim_positions):
            tri_idx = p if permuted else int(prim_ids[p])
            prows[j, 0:12] = tri_np[tri_idx]
            prows[j, 12] = float(p)  # global position
        tre_prims.append(prows)
        max_prims = max(max_prims, len(prows))

    Pn = _round_up(max_pairs, 128)
    Pm = _round_up(max_prims, 128)
    node_t = np.zeros((T, 16, Pn), np.float32)
    tri_t = np.zeros((T, 16, Pm), np.float32)
    for t in range(T):
        node_t[t, :14, : len(tre_pairs[t])] = tre_pairs[t].T
        tri_t[t, :13, : len(tre_prims[t])] = tre_prims[t].T

    # ---- top-region table -------------------------------------------
    # Top leaves = portals: word = (treelet_id << 4) | 1.
    troot_of = {r: t for t, r in enumerate(troots)}
    if not top_nodes:
        # whole tree is one treelet: a degenerate top with a single
        # portal pair (portal duplicated; right child box empty).
        top_rows = np.zeros((1, 14), np.float32)
        top_rows[0, 0:6] = bounds[0]
        big = np.finfo(np.float32).max
        top_rows[0, 6:12:2] = big
        top_rows[0, 7:12:2] = -big
        top_rows[0, 12] = float((0 << 4) | 1)
        top_rows[0, 13] = float((0 << 4) | 1)
        top_root = 1 << 4  # inner word -> pair 0
        Pt = 128
        top_node_t = np.zeros((16, Pt), np.float32)
        top_node_t[:14, :1] = top_rows.T
    else:
        top_pair = {n: k for k, n in enumerate(top_nodes)}

        def top_word(n):
            if n in troot_of:
                return (troot_of[n] << 4) | 1
            return (2 * top_pair[n] + 1) << 4

        top_rows = np.zeros((len(top_nodes), 14), np.float32)
        for n in top_nodes:
            k = top_pair[n]
            l, r = int(first[n]), int(first[n]) + 1
            top_rows[k, 0:6] = bounds[l]
            top_rows[k, 6:12] = bounds[r]
            top_rows[k, 12] = float(top_word(l))
            top_rows[k, 13] = float(top_word(r))
        top_root = top_word(0)
        Pt = _round_up(len(top_nodes), 128)
        top_node_t = np.zeros((16, Pt), np.float32)
        top_node_t[:14, : len(top_nodes)] = top_rows.T

    return Treelets(
        top_node_t=jnp.asarray(top_node_t),
        top_root=int(top_root),
        node_t=jnp.asarray(node_t),
        root_w=jnp.asarray(troot_words.astype(np.int32)),
        tri_t=jnp.asarray(tri_t),
    )


# ---------------------------------------------------------------- phase A
def _collect_kernel(node_ref, ray_ref, root_ref, tid_ref, tent_ref, cnt_ref,
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
    table = node_ref[:, :]

    n_cols = table.shape[1]
    chunk = n_cols if fetch_chunk is None else min(fetch_chunk, n_cols)

    def fetch(idx):
        acc = None
        for c in range(0, n_cols, chunk):
            w = min(chunk, n_cols - c)
            iota = jax.lax.broadcasted_iota(i32, (w, B), 0) + c
            oh = (iota == idx).astype(f32)
            part = jax.lax.dot_general(
                table[:, c:c + w], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = part if acc is None else acc + part
        return acc

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
    )

    def cond(s):
        return jnp.any(s[3] > 0)

    def body(s):
        stack, sp, top, active_i, ptid, ptent, pcnt = s
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
        lanes = jax.lax.broadcasted_iota(i32, (stack_depth, B), 0)
        stack = jnp.where((lanes == sp) & push, far, stack)
        sp = jnp.where(push, sp + 1, sp)

        need_pop = active & ~descend  # includes portal-only and miss steps
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = jnp.max(jnp.where(lanes == sp, stack, 0), axis=0, keepdims=True)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~(need_pop & ~can_pop)
        return (stack, sp, top, active.astype(i32), ptid, ptent, pcnt)

    out = jax.lax.while_loop(cond, body, state)
    _, _, _, _, ptid, ptent, pcnt = out
    tid_ref[:, :] = ptid
    tent_ref[:, :] = ptent
    cnt_ref[:, :] = jnp.broadcast_to(pcnt, (8, B))


@partial(jax.jit, static_argnames=("robust", "stack_depth", "block",
                                   "interpret", "top_root"))
def _collect_portals_jit(top_node_t, packed, robust, stack_depth, block,
                         interpret, top_root):
    dim = 3
    Rp = packed.shape[1]
    root = jnp.full((8, 128), top_root, jnp.int32)
    n_blocks = Rp // block
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(top_node_t.shape, lambda i: (0, 0)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((MAX_PORTALS, block), lambda i: (0, i)),
            pl.BlockSpec((MAX_PORTALS, block), lambda i: (0, i)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
        ],
    )
    kernel = partial(_collect_kernel, dim=dim, robust=robust,
                     stack_depth=stack_depth, max_portals=MAX_PORTALS)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((MAX_PORTALS, Rp), jnp.int32),
            jax.ShapeDtypeStruct((MAX_PORTALS, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(top_node_t, packed, root)


def _collect_portals(tl: Treelets, rays: Ray, robust: bool, stack_depth: int,
                     block: int, interpret: bool):
    R = rays.tmin.shape[0]
    dim = 3
    pad = (-R) % block
    Rp = R + pad
    packed = jnp.zeros((8, Rp), jnp.float32)
    packed = packed.at[0:dim, :R].set(rays.org.T)
    packed = packed.at[dim : 2 * dim, :R].set(rays.dir.T)
    packed = packed.at[2 * dim, :R].set(rays.tmin)
    packed = packed.at[2 * dim + 1, :R].set(rays.tmax)
    if pad:
        packed = packed.at[2 * dim, R:].set(1.0)
        packed = packed.at[dim, R:].set(1.0)
    tid, tent, cnt = _collect_portals_jit(
        tl.top_node_t, packed, robust=robust, stack_depth=stack_depth,
        block=block, interpret=interpret, top_root=tl.top_root,
    )
    return tid[:, :R], tent[:, :R], cnt[0, :R]


# ---------------------------------------------------------------- phase B
def _treelet_kernel(tid_ref, node_ref, tri_ref, ray_ref, root_ref, state_ref,
                    fout_ref, iout_ref,
                    *, dim, any_hit, robust, stack_depth):
    """Traverse ONE treelet per grid block (node/tri tables DMA'd by the
    pipeline via the scalar-prefetched treelet id)."""
    del tid_ref  # consumed by the index maps
    B = ray_ref.shape[1]
    f32, i32 = jnp.float32, jnp.int32
    rays = ray_ref[:, :]
    org = rays[0:dim]
    dir_ = rays[dim : 2 * dim]
    tmin = rays[2 * dim : 2 * dim + 1]
    tmax0 = state_ref[0:1, :]  # evolving tmax
    best_in = state_ref[1:2, :]
    pos_in = state_ref[2:3, :].astype(i32)  # exact below 2^24
    u_in = state_ref[3:4, :]
    v_in = state_ref[4:5, :]

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

    node_table = node_ref[0]
    tri_table = tri_ref[0]

    def fetch(idx, table):
        iota = jax.lax.broadcasted_iota(i32, (table.shape[1], B), 0)
        oh = (iota == idx).astype(f32)
        return jax.lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )

    def slab(bounds, tmax):
        t0, t1 = tmin, tmax
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

    root_word = root_ref[0:1, :]  # per-lane root word (0 = inactive lane)
    state = (
        jnp.zeros((stack_depth, B), i32),
        jnp.zeros((1, B), i32),
        root_word,
        jnp.zeros((1, B), i32),  # leaf_cur
        jnp.zeros((1, B), i32),  # leaf_rem
        ((root_word != 0) & (tmin <= tmax0)).astype(i32),
        tmax0,
        best_in,
        pos_in,
        u_in,
        v_in,
    )

    def cond(s):
        return jnp.any(s[5] > 0)

    def body(s):
        (stack, sp, top, leaf_cur, leaf_rem, active_i, tmax,
         best_t, best_pos, best_u, best_v) = s
        active = active_i > 0
        in_leaf = active & (leaf_rem > 0)

        tri = fetch(leaf_cur, tri_table)
        p0, e1, e2, nrm = tri[0:3], tri[3:6], tri[6:9], tri[9:12]
        gpos = tri[12:13].astype(i32)
        cvec = p0 - org
        rvec = jnp.concatenate(
            [dir_[1:2] * cvec[2:3] - dir_[2:3] * cvec[1:2],
             dir_[2:3] * cvec[0:1] - dir_[0:1] * cvec[2:3],
             dir_[0:1] * cvec[1:2] - dir_[1:2] * cvec[0:1]], axis=0)
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
        best_pos = jnp.where(tri_hit, gpos, best_pos)
        best_u = jnp.where(tri_hit, uu, best_u)
        best_v = jnp.where(tri_hit, vv, best_v)
        leaf_cur = jnp.where(in_leaf, leaf_cur + 1, leaf_cur)
        leaf_rem = jnp.where(in_leaf, leaf_rem - 1, leaf_rem)
        done_by_hit = tri_hit if any_hit else jnp.zeros_like(tri_hit)
        leaf_exhausted = in_leaf & (leaf_rem == 0) & ~done_by_hit

        in_inner = active & ~in_leaf
        top_count = top & 15
        top_is_leaf = top_count != 0
        enter_leaf = in_inner & top_is_leaf
        do_node = in_inner & ~top_is_leaf

        fid = top >> 4
        nrow = fetch(fid >> 1, node_table)
        row_l = nrow[: 2 * dim]
        row_r = nrow[2 * dim : 4 * dim]
        idx_l = nrow[4 * dim : 4 * dim + 1].astype(i32)
        idx_r = nrow[4 * dim + 1 : 4 * dim + 2].astype(i32)
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
        lanes = jax.lax.broadcasted_iota(i32, (stack_depth, B), 0)
        stack = jnp.where((lanes == sp) & push, far, stack)
        sp = jnp.where(push, sp + 1, sp)

        leaf_cur = jnp.where(enter_leaf, fid, leaf_cur)
        leaf_rem = jnp.where(enter_leaf, top_count, leaf_rem)

        need_pop = (do_node & none) | leaf_exhausted
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = jnp.max(jnp.where(lanes == sp, stack, 0), axis=0, keepdims=True)
        top = jnp.where(descend, new_top, jnp.where(can_pop, popped, top))
        active = active & ~done_by_hit & ~(need_pop & ~can_pop)
        return (stack, sp, top, leaf_cur, leaf_rem, active.astype(i32),
                tmax, best_t, best_pos, best_u, best_v)

    out = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, _, tmax, best_t, best_pos, best_u, best_v) = out
    zf = jnp.zeros_like(tmax)
    fout_ref[:, :] = jnp.concatenate(
        [tmax, best_t, best_u, best_v, zf, zf, zf, zf], axis=0
    )
    zi = jnp.zeros_like(best_pos)
    iout_ref[:, :] = jnp.concatenate(
        [best_pos, zi, zi, zi, zi, zi, zi, zi], axis=0
    )


@jax.jit
def _pending_portals(ptent, ptid, cursor):
    """Per-ray (entry t, treelet id) of the portal at `cursor`
    (inf / 0 when exhausted). Runs on device so the big portal lists
    never leave HBM."""
    R = ptent.shape[1]
    cols = jnp.arange(R)
    cur = jnp.clip(cursor, 0, MAX_PORTALS - 1)
    t = jnp.where(cursor < MAX_PORTALS, ptent[cur, cols], jnp.inf)
    tid = jnp.where(cursor < MAX_PORTALS, ptid[cur, cols], 0)
    return t, tid


@partial(jax.jit, static_argnames=("block", "any_hit", "robust",
                                   "stack_depth", "interpret"))
def _phase_b_jit(btid, node_t, tri_t, brays, broot, bstate,
                 block, any_hit, robust, stack_depth, interpret):
    nb = btid.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 16, node_t.shape[2]),
                         lambda i, tid: (tid[i], 0, 0)),
            pl.BlockSpec((1, 16, tri_t.shape[2]),
                         lambda i, tid: (tid[i], 0, 0)),
            pl.BlockSpec((8, block), lambda i, tid: (0, i)),
            pl.BlockSpec((8, block), lambda i, tid: (0, i)),
            pl.BlockSpec((8, block), lambda i, tid: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, block), lambda i, tid: (0, i)),
            pl.BlockSpec((8, block), lambda i, tid: (0, i)),
        ],
    )
    kernel = partial(_treelet_kernel, dim=3, any_hit=any_hit,
                     robust=robust, stack_depth=stack_depth)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, nb * block), jnp.float32),
            jax.ShapeDtypeStruct((8, nb * block), jnp.int32),
        ],
        interpret=interpret,
    )(btid, node_t, tri_t, brays, broot, bstate)


def treelet_intersect_tris(
    tl: Treelets,
    rays: Ray,
    prim_ids=None,
    *,
    any_hit: bool = False,
    robust: bool = False,
    stack_depth: int = 32,
    block: int = 512,
    top_block: int = 1024,  # larger blocks exhaust VMEM in the collect kernel
    max_rounds: int = 64,
    interpret: bool = False,
    verbose: bool = False,
) -> Hit:
    """Closest/any-hit over a treelet-decomposed scene.

    Phase A collects portals; phase B rounds process, per ray, its
    nearest pending portal (rays sorted by treelet so each kernel block
    streams exactly one treelet table). Python-level rounds end when no
    ray has a pending portal nearer than its current hit.
    """
    R = rays.tmin.shape[0]
    T = tl.node_t.shape[0]
    ptid, ptent, pcnt = _collect_portals(
        tl, rays, robust, stack_depth, top_block, interpret
    )
    # pcnt counts every recordable portal even past the list capacity,
    # so overflow (silently dropped portals = missed intersections) is
    # detectable exactly. Fail loudly rather than return wrong hits.
    max_cnt = int(jnp.max(pcnt))
    if max_cnt > MAX_PORTALS:
        raise ValueError(
            f"portal list overflow: a ray entered {max_cnt} treelet boxes "
            f"(capacity {MAX_PORTALS}); rebuild treelets with a larger "
            f"max_nodes so the top region is shallower"
        )
    # sort each ray's portals by entry t (ascending; empties at inf).
    order = jnp.argsort(ptent, axis=0)
    ptent = jnp.take_along_axis(ptent, order, axis=0)
    ptid = jnp.take_along_axis(ptid, order, axis=0)

    cursor = np.zeros(R, np.int64)
    tmax = np.asarray(rays.tmax).copy()
    best_t = np.full(R, np.inf, np.float32)
    best_pos = np.full(R, -1, np.int32)
    best_u = np.zeros(R, np.float32)
    best_v = np.zeros(R, np.float32)
    org_h = np.asarray(rays.org)
    dir_h = np.asarray(rays.dir)
    tmin_h = np.asarray(rays.tmin)

    import time as _time

    for round_i in range(max_rounds):
        _t0 = _time.time()
        # next pending portal per ray with entry < current tmax,
        # selected ON DEVICE — only the compact per-round arrays (the
        # ready mask and treelet ids) travel to the host, not the
        # [MAX_PORTALS, R] portal lists.
        if any_hit:
            live = best_pos < 0
        else:
            live = np.ones(R, bool)
        pend_t_d, pend_tid_d = _pending_portals(
            ptent, ptid, jnp.asarray(cursor.astype(np.int32)))
        pend_t = np.asarray(pend_t_d)
        ready = live & (pend_t <= tmax)
        if not ready.any():
            break
        ridx = np.nonzero(ready)[0]
        tids = np.asarray(pend_tid_d)[ridx]
        # group rays by treelet into fixed-size blocks
        sort = np.argsort(tids, kind="stable")
        ridx = ridx[sort]
        tids = tids[sort]
        blocks = []
        i = 0
        while i < len(ridx):
            t = tids[i]
            j = min(i + block, len(ridx))
            while j > i and tids[j - 1] != t:
                j -= 1
            if j == i:
                j = i + np.searchsorted(tids[i:], t, side="right")
            blocks.append((t, ridx[i:j]))
            i = j
        # Pad the block count to a power of two: the kernel recompiles
        # per distinct grid size, so bucketing bounds compilations to
        # O(log R/block) instead of one per round.
        nb = 1 << max(0, (len(blocks) - 1).bit_length())
        btid = np.zeros(nb, np.int32)
        brays = np.zeros((8, nb * block), np.float32)
        bstate = np.zeros((8, nb * block), np.float32)
        broot = np.zeros((8, nb * block), np.int32)
        bmap = np.full(nb * block, -1, np.int64)
        root_np = np.asarray(tl.root_w)
        for bi, (t, rs) in enumerate(blocks):
            btid[bi] = t
            sl = slice(bi * block, bi * block + len(rs))
            bmap[sl] = rs
            brays[0:3, sl] = org_h[rs].T
            brays[3:6, sl] = dir_h[rs].T
            brays[6, sl] = tmin_h[rs]
            brays[7, sl] = tmax[rs]
            bstate[0, sl] = tmax[rs]
            bstate[1, sl] = best_t[rs]
            bstate[2, sl] = best_pos[rs].astype(np.float32)
            bstate[3, sl] = best_u[rs]
            bstate[4, sl] = best_v[rs]
            broot[0, sl] = root_np[t]

        fout, iout = _phase_b_jit(
            jnp.asarray(btid), tl.node_t, tl.tri_t, jnp.asarray(brays),
            jnp.asarray(broot), jnp.asarray(bstate),
            block=block, any_hit=any_hit, robust=robust,
            stack_depth=stack_depth, interpret=interpret,
        )
        fout = np.asarray(fout)
        iout = np.asarray(iout)
        valid = bmap >= 0
        rs = bmap[valid]
        tmax[rs] = fout[0, valid]
        best_t[rs] = fout[1, valid]
        best_pos[rs] = iout[0, valid]
        best_u[rs] = fout[2, valid]
        best_v[rs] = fout[3, valid]
        # advance the cursor of every ray processed this round
        processed = np.zeros(R, bool)
        processed[rs] = True
        cursor[processed] += 1
        if verbose:
            print(
                f"round {round_i}: rays {len(ridx)}, blocks {nb}, "
                f"{_time.time() - _t0:.2f}s",
                flush=True,
            )

    invalid = np.uint32(0xFFFFFFFF)
    missed = best_pos < 0
    pos_u = np.where(missed, invalid, best_pos.astype(np.uint32))
    if prim_ids is not None:
        ids = np.asarray(prim_ids).astype(np.uint32)
        prim_id = np.where(
            missed, invalid, ids[np.clip(best_pos, 0, len(ids) - 1)]
        )
    else:
        prim_id = pos_u
    return Hit(
        t=jnp.asarray(np.where(missed, np.inf, best_t)),
        u=jnp.asarray(best_u),
        v=jnp.asarray(best_v),
        prim_pos=jnp.asarray(pos_u),
        prim_id=jnp.asarray(prim_id),
        stats=TraversalStats(jnp.asarray(pcnt), jnp.asarray(pcnt)),
    )
