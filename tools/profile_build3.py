"""Bisect the ~230ms binned-round cost: time the real round body
truncated at successive stages (cumulative), on a realistic mid-build
state. Stage cost = t(k) - t(k-1)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu.build import frontier
from bvh_tpu.build.binned import BIN_COUNT, _round
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.core import bbox as bbox_ops


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
    print(f"  {name:40s} {t*1e3:9.2f} ms", flush=True)
    return t


def round_upto(state, bb_min, bb_max, centers, config, stage: int):
    """The _round body, truncated after `stage`. Returns a scalar dep on
    everything computed so far (prevents DCE)."""
    n, dim = centers.shape
    cap = state.open_.shape[0]
    dtype = centers.dtype
    B = BIN_COUNT
    inf = jnp.asarray(jnp.inf, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    sah = config.sah

    fpos, f2n, _ = frontier.compact_frontier(state.open_)
    f_cap = f2n.shape[0]
    nid = state.seg
    act = state.open_[nid]
    prim = state.order
    c = centers[prim]
    node_row = state.bounds[nid]
    nmn, nmx = node_row[:, 0::2], node_row[:, 1::2]
    bin_scale = jnp.asarray(B, dtype) / (nmx - nmn)
    posf = c * bin_scale + (-nmn * bin_scale)
    posf = jnp.where(posf > 0, posf, 0)
    posf = jnp.where(posf < B - 1, posf, B - 1)
    bins_of = posf.astype(jnp.int32)
    if stage == 0:  # binning keys + frontier compaction
        return jnp.sum(bins_of) + jnp.sum(f2n)

    pbmn = bb_min[prim]
    pbmx = bb_max[prim]
    onehot = bins_of[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
    node_f_c = jnp.minimum(f2n, cap - 1)
    begin_f = state.begin[node_f_c]
    end_f = state.end[node_f_c]
    cnt_cols = (onehot & act[:, None, None]).reshape(n, dim * B).astype(jnp.int32)
    cnt = frontier.segment_sums_at(cnt_cols, begin_f, end_f).reshape(f_cap, dim, B)
    if stage == 1:  # + counts cumsum
        return jnp.sum(cnt)

    mask4 = onehot[:, :, :, None]
    vals_mn = jnp.where(mask4, pbmn[:, None, None, :], big).reshape(n, dim * B * dim)
    vals_mx = jnp.where(mask4, pbmx[:, None, None, :], -big).reshape(n, dim * B * dim)
    heads = frontier.segment_heads(state)
    smn, smx = frontier.segmented_minmax(heads, vals_mn, vals_mx)
    last_f = jnp.clip(end_f - 1, 0, n - 1)
    bmn = smn[last_f].reshape(f_cap, dim, B, dim)
    bmx = smx[last_f].reshape(f_cap, dim, B, dim)
    if stage == 2:  # + bin-bbox flagged scan
        return jnp.sum(bmn) + jnp.sum(bmx)

    live_f = (f2n < cap)[:, None, None]
    cnt = jnp.where(live_f, cnt, 0)
    bmn = jnp.where(live_f[..., None], bmn, big)
    bmx = jnp.where(live_f[..., None], bmx, -big)
    right_cost = jnp.full((f_cap, dim, B), inf, dtype)
    racc_mn = jnp.full((f_cap, dim, dim), big, dtype)
    racc_mx = jnp.full((f_cap, dim, dim), -big, dtype)
    rcnt = jnp.zeros((f_cap, dim), jnp.int32)
    for i in range(B - 1, 0, -1):
        racc_mn = jnp.minimum(racc_mn, bmn[:, :, i])
        racc_mx = jnp.maximum(racc_mx, bmx[:, :, i])
        rcnt = rcnt + cnt[:, :, i]
        ha = bbox_ops.get_half_area(racc_mn, racc_mx)
        right_cost = right_cost.at[:, :, i].set(
            jnp.where(rcnt > 0, sah.get_leaf_cost(rcnt, ha), inf))
    costs = jnp.full((f_cap, dim, B - 1), inf, dtype)
    lacc_mn = jnp.full((f_cap, dim, dim), big, dtype)
    lacc_mx = jnp.full((f_cap, dim, dim), -big, dtype)
    lcnt = jnp.zeros((f_cap, dim), jnp.int32)
    for i in range(B - 1):
        lacc_mn = jnp.minimum(lacc_mn, bmn[:, :, i])
        lacc_mx = jnp.maximum(lacc_mx, bmx[:, :, i])
        lcnt = lcnt + cnt[:, :, i]
        ha = bbox_ops.get_half_area(lacc_mn, lacc_mx)
        costs = costs.at[:, :, i].set(jnp.where(
            lcnt > 0, sah.get_leaf_cost(lcnt, ha) + right_cost[:, :, i + 1],
            inf))
    flat = costs.reshape(f_cap, dim * (B - 1))
    flat = jnp.where(jnp.isnan(flat), inf, flat)
    best_flat = jnp.argmin(flat, axis=1)
    best_cost = jnp.take_along_axis(flat, best_flat[:, None], axis=1)[:, 0]
    if stage == 3:  # + SAH sweep + argmin
        return jnp.sum(best_cost) + jnp.sum(best_flat)

    # stage 4 = full round via the real function
    s = _round(state, bb_min, bb_max, centers, config)
    return jnp.sum(s.node_count) + jnp.sum(s.order[:8])


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
    print("state ready (12 rounds in)", flush=True)

    prev = 0.0
    names = ["bin keys + compaction", "+ counts cumsum",
             "+ bin-bbox ascan", "+ SAH sweep/argmin", "full round"]
    for stage in range(5):
        fn = jax.jit(lambda s, st=stage: round_upto(
            s, bb_min, bb_max, centers, cfg, st))
        t = timeit(names[stage], fn, state)
        print(f"    delta: {(t - prev)*1e3:+9.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
