"""Sub-bisect the ~96ms tail of a binned round: decisions, fallback,
and apply_splits stages (cumulative deltas)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu.build import frontier
from bvh_tpu.build.binned import _round
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core.types import Index, make_node_bounds_row


def sync(r):
    leaf = jax.tree.leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return r


def timeit(name, fn, *args, reps=5):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2]
    print(f"  {name:44s} {t*1e3:9.2f} ms", flush=True)
    return t


def tail_upto(state, bb_min, bb_max, do_split, goes_left, min_leaf_size,
              stage: int):
    """apply_splits body truncated at `stage`."""
    n = state.order.shape[0]
    cap = state.open_.shape[0]
    dim = bb_min.shape[1]
    index_dtype = state.index.dtype
    pos = jnp.arange(n, dtype=jnp.int32)
    nid = state.seg
    act = do_split[nid]
    begin_p = state.begin[nid]
    gl = goes_left & act

    count_left = frontier.segment_sums_at(
        gl.astype(jnp.int32), state.begin, state.end)
    count_left = jnp.where(do_split, count_left, 0)
    left_rank = frontier.segmented_left_rank(gl, begin_p)
    right_rank = (pos - begin_p) - left_rank
    new_pos = jnp.where(
        act,
        jnp.where(gl, begin_p + left_rank,
                  begin_p + count_left[nid] + right_rank),
        pos,
    )
    if stage == 0:  # ranks + new_pos
        return jnp.sum(new_pos) + jnp.sum(count_left)

    mid = state.begin + count_left
    split_i = do_split.astype(jnp.int32)
    child_base = state.node_count + 2 * (
        jnp.cumsum(split_i, dtype=jnp.int32) - split_i)
    num_splits = jnp.sum(split_i, dtype=jnp.int32)

    pb_min = bb_min[state.order]
    pb_max = bb_max[state.order]
    big = jnp.asarray(jnp.finfo(pb_min.dtype).max, pb_min.dtype)
    heads = frontier.segment_heads(state)
    gr = act & ~gl
    vals_mn = jnp.concatenate(
        [jnp.where(gl[:, None], pb_min, big),
         jnp.where(gr[:, None], pb_min, big)], axis=1)
    vals_mx = jnp.concatenate(
        [jnp.where(gl[:, None], pb_max, -big),
         jnp.where(gr[:, None], pb_max, -big)], axis=1)
    smn, smx = frontier.segmented_minmax(heads, vals_mn, vals_mx)
    last = jnp.clip(state.end - 1, 0, n - 1)
    side_min = smn[last].reshape(cap, 2, dim)
    side_max = smx[last].reshape(cap, 2, dim)
    if stage == 1:  # + side-bbox ascan + [cap] gather
        return jnp.sum(side_min) + jnp.sum(side_max)

    area_a = bbox_ops.get_half_area(side_min[:, 0], side_max[:, 0])
    area_b = bbox_ops.get_half_area(side_min[:, 1], side_max[:, 1])
    swap = area_a < area_b
    a_first = ~swap
    c0_min = jnp.where(a_first[:, None], side_min[:, 0], side_min[:, 1])
    c0_max = jnp.where(a_first[:, None], side_max[:, 0], side_max[:, 1])
    c1_min = jnp.where(a_first[:, None], side_min[:, 1], side_min[:, 0])
    c1_max = jnp.where(a_first[:, None], side_max[:, 1], side_max[:, 0])
    c0_begin = jnp.where(a_first, state.begin, mid)
    c0_end = jnp.where(a_first, mid, state.end)
    c1_begin = jnp.where(a_first, mid, state.begin)
    c1_end = jnp.where(a_first, state.end, mid)

    rank = jnp.cumsum(split_i, dtype=jnp.int32) - split_i
    skey = jnp.where(do_split, rank, cap)
    _, split_node_of = jax.lax.sort(
        (skey, jnp.arange(cap, dtype=jnp.int32)), num_keys=1)
    slot = jnp.arange(cap, dtype=jnp.int32)
    rel = slot - state.node_count
    is_child = (rel >= 0) & (rel < 2 * num_splits)
    src = split_node_of[jnp.clip(rel >> 1, 0, cap - 1)]
    side1 = (rel & 1) == 1
    c0_row = make_node_bounds_row(c0_min, c0_max)
    c1_row = make_node_bounds_row(c1_min, c1_max)
    child_row = jnp.where(side1[:, None], c1_row[src], c0_row[src])
    bounds = jnp.where(is_child[:, None], child_row, state.bounds)
    if stage == 2:  # + SATO + child compaction sort + bounds rows
        return jnp.sum(bounds) + jnp.sum(src)

    new_order, seg = frontier.inverse_permute(
        new_pos, (state.order,
                  jnp.where(act, jnp.where(gl, child_base[nid],
                                           child_base[nid] + 1), state.seg)))
    if stage == 3:  # + permutation sort
        return jnp.sum(new_order) + jnp.sum(seg) + jnp.sum(bounds)

    s2, _ = frontier.apply_splits(
        state, bb_min, bb_max, do_split, goes_left, min_leaf_size)
    return jnp.sum(s2.node_count) + jnp.sum(s2.order[:8]) + jnp.sum(s2.seg[:8])


def main():
    n = 262_144
    rng = np.random.default_rng(0)
    tris = rng.random((n, 3, 3), np.float32)
    bb_min = jnp.asarray(tris.min(axis=1))
    bb_max = jnp.asarray(tris.max(axis=1))
    centers = jnp.asarray(tris.mean(axis=1))
    cfg = TopDownConfig()
    print(f"device: {jax.devices()[0].platform}", flush=True)

    state = frontier.init_state(bb_min, bb_max, cfg.min_leaf_size)
    round_j = jax.jit(lambda s: _round(s, bb_min, bb_max, centers, cfg))
    for _ in range(12):
        state = round_j(state)
    state = sync(state)
    # realistic routing inputs
    size_all = state.end - state.begin
    do_split = state.open_ & (size_all > cfg.max_leaf_size)
    goes_left = jnp.asarray(rng.random(n) < 0.5)
    do_split, goes_left = sync((do_split, goes_left))
    print("state ready", flush=True)

    names = ["ranks + new_pos", "+ side-bbox scan", "+ SATO/compaction",
             "+ permutation sort", "full apply_splits"]
    prev = 0.0
    for stage in range(5):
        fn = jax.jit(lambda s, d, g, st=stage: tail_upto(
            s, bb_min, bb_max, d, g, cfg.min_leaf_size, st))
        t = timeit(names[stage], fn, state, do_split, goes_left)
        print(f"    delta: {(t - prev)*1e3:+9.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
