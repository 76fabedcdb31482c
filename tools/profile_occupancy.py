"""Round-1 occupancy analysis: measure per-pair kernel step counts on
hardware once, then simulate block_iters for alternative block sizes
and within-run orderings host-side (a pair's step count depends only on
its (ray, treelet) traversal, not on the blocking).

Prints, per candidate (block size x ordering): simulated block-iters,
est. kernel ms (iters x per-iter cost model), and occupancy.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

i32, f32 = jnp.int32, jnp.float32


def main():
    n = 262_144
    side = 1024
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse import wide_treelet as wt

    tris = sponza_class(n, seed=0)
    import glob

    dev = sorted(glob.glob(f"/tmp/bench_sponza_dev_{n}_*.bvh"))
    bvh = load_bvh(dev[0] if dev else f"/tmp/bench_sponza_{n}.bvh")
    tri = Tri(*(jnp.asarray(tris[:, i]) for i in range(3)))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, side, side)
    R = side * side
    tl = wt.build_wide_treelets(bvh, flat, max_prims=1024)
    T = tl.table.shape[0]
    ktab = (jax.jit(wt.pack_kernel_table)(
        tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
        if tl.table.shape[2] >= wt.PACK_MIN_P else tl.table)
    block, top_block, MP, K = 1024, 8192, 32, 4
    Rp = wt._round_up(R, wt._lcm(block, top_block))
    Rc = Rp // 8

    packed = np.zeros((8, Rp), np.float32)
    packed[0:3, :R] = np.asarray(rays.org.T)
    packed[3:6, :R] = np.asarray(rays.dir.T)
    packed[6, :R] = np.asarray(rays.tmin)
    packed[7, :R] = np.asarray(rays.tmax)
    packed[6, R:] = 1.0
    packed[3, R:] = 1.0
    packed = jnp.asarray(packed)

    # ---- phase A + compact + round-1 window (mirrors _render_jit) ----
    from bvh_tpu.traverse.collect import _collect_kernel
    from jax.experimental import pallas as pl

    @jax.jit
    def phase_a(top_node_t, packed):
        root = jnp.full((8, 128), tl.top_root, i32)
        grid_spec = pl.GridSpec(
            grid=(Rp // top_block,),
            in_specs=[
                pl.BlockSpec(top_node_t.shape, lambda i: (0, 0)),
                pl.BlockSpec((8, top_block), lambda i: (0, i)),
                pl.BlockSpec((8, 128), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((MP, top_block), lambda i: (0, i)),
                pl.BlockSpec((MP, top_block), lambda i: (0, i)),
                pl.BlockSpec((8, top_block), lambda i: (0, i)),
            ],
        )
        kernel = partial(_collect_kernel, dim=3, robust=False,
                         stack_depth=16, max_portals=MP)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((MP, Rp), i32),
                       jax.ShapeDtypeStruct((MP, Rp), f32),
                       jax.ShapeDtypeStruct((8, Rp), i32)],
        )(top_node_t, packed, root)

    ptid, ptent, cnt = phase_a(tl.top_node_t, packed)
    ready0 = np.asarray(cnt[0]) > 0
    order = np.argsort(~ready0, kind="stable")
    sel = order[:Rc]
    pt0 = np.asarray(ptid)[:, sel]
    pe0 = np.asarray(ptent)[:, sel]
    rayc = np.asarray(packed)[:, sel]
    srt = np.argsort(pe0, axis=0, kind="stable")
    pc_t = np.take_along_axis(pt0, srt, axis=0)
    pc_e = np.take_along_axis(pe0, srt, axis=0)
    wtid = pc_t[:K]                        # [K, Rc]
    wtt = pc_e[:K]
    validk = (wtid >= 0) & (wtt <= rayc[7][None, :])
    neg = np.signbit(rayc[3:6]).astype(np.int64)
    oct_ = neg[0] + 2 * neg[1] + 4 * neg[2]
    nvalid = int(validk.sum())
    print(f"T={T} Rc={Rc} ready={int(ready0.sum())} "
          f"valid pairs={nvalid}", flush=True)

    # ---- one hardware pass at block=1024 to get per-pair steps -------
    L = K * Rc
    keyL = np.where(validk, wtid * 8 + oct_[None, :], T * 8).reshape(L)
    entL = np.where(validk, wtt, np.inf).reshape(L)
    srt_pairs = np.lexsort((entL, keyL))
    keyS = keyL[srt_pairs]
    tidS = keyS >> 3
    ray_of_pair = (srt_pairs % Rc)
    rows10 = np.concatenate(
        [np.tile(rayc[0:7], (1, K)),
         np.tile(rayc[7:8], (1, K)),
         np.arange(L, dtype=np.float32)[None, :],
         validk.reshape(1, L).astype(np.float32)], axis=0)
    dataS_np = rows10[:, srt_pairs]

    blk = 1024
    iota_L = np.arange(L, dtype=np.int64)
    prev = np.concatenate([[-1], tidS[:-1]])
    flag = tidS != prev
    run_start = np.maximum.accumulate(np.where(flag, iota_L, 0))
    prev_start = np.concatenate([[0], run_start[:-1]])
    prev_len = np.where(flag, iota_L - prev_start, 0)
    pad_delta = np.where(flag, (-prev_len) % blk, 0)
    lane_slot = iota_L + np.cumsum(pad_delta)
    NBL = -(-L // blk) + min(T + 2, 4096)
    blocks_i = np.arange(NBL)
    p0_b = np.searchsorted(lane_slot, blocks_i * blk, side="left")
    p0c = np.clip(p0_b, 0, L - 1)
    t_b = tidS[p0c]
    tid_of_block = np.clip(t_b, 0, T - 1)
    l0_b = lane_slot[p0c]
    e_b = np.searchsorted(tidS, t_b, side="right")
    start_un = p0_b - l0_b + blocks_i * blk
    start_b = np.clip(start_un, 0, L)
    erel_b = np.where(start_un == start_b, np.maximum(e_b - start_un, 0), 0)

    pad = np.zeros((10, blk + 128), np.float32)
    pad[8] = float(L)
    dataS_full = np.concatenate([dataS_np, pad], axis=1)
    dataS_full = np.concatenate(
        [dataS_full, np.zeros((6, L + blk + 128), np.float32)], axis=0)

    # persist the round-1 workload for tools/ablate_kernel2.py (real
    # block schedule + pair data, block=1024 placement)
    np.savez("/tmp/occ_round1.npz", dataS=dataS_np, tidS=tidS,
             entS=entL[srt_pairs], keyS=keyS, L=L, T=T, blk=blk,
             ray_of_pair=ray_of_pair)

    t0 = time.perf_counter()
    fout = jax.jit(partial(wt._phase_b, block=blk, any_hit=False,
                           robust=False, stack_depth=24,
                           interpret=False))(
        jnp.asarray(tid_of_block, i32), jnp.asarray(start_b, i32),
        jnp.asarray(erel_b, i32), ktab, jnp.asarray(dataS_full))
    fout = np.asarray(fout)
    print(f"kernel pass: {time.perf_counter()-t0:.1f} s", flush=True)

    # per-pair steps via the pair-id echo
    pid = fout[4].astype(np.int64)
    steps_e = fout[7]
    ok = pid < L
    steps_of_pair = np.zeros(L, np.float64)
    steps_of_pair[pid[ok]] = steps_e[ok]
    # steps in SORTED pair order:
    steps_sorted = steps_of_pair  # indexed by sorted position? pid is
    # the pre-sort pair id: dataS row 8 carried iota over sorted order?
    # No: rows10 row 8 = arange(L) in UNSORTED order, then permuted; so
    # pid echoes the unsorted pair id. Map back to sorted positions:
    steps_srt = steps_of_pair[dataS_np[8].astype(np.int64)]
    validS = dataS_np[9] > 0

    real_iters = fout[5].reshape(NBL, blk)[:, 0].sum()
    print(f"measured block_iters={real_iters:.0f} "
          f"lane_steps={steps_e[ok].sum():.0f}", flush=True)

    per_iter_us = {256: None, 512: None, 1024: 14.0e3 / real_iters * 1.0}

    def simulate(order_within_run, blk_s, label):
        """order_within_run: None (current), 'steps' (oracle),
        'entry' (sort by entry t)."""
        tid_s = tidS
        s = steps_srt.copy()
        v = validS.copy()
        # reorder within runs
        idx = np.arange(L)
        if order_within_run is not None:
            # sort within each (tid) run by the requested key, valid
            # pairs only (invalid have steps 0 anyway)
            if order_within_run == "steps":
                key2 = -s
            elif order_within_run == "entry":
                key2 = entL[srt_pairs]
            idx = np.lexsort((key2, tid_s))
            tid_s = tid_s[idx]
            s = s[idx]
            v = v[idx]
        # run-padded placement at block size blk_s
        prev = np.concatenate([[-1], tid_s[:-1]])
        flag = tid_s != prev
        rs = np.maximum.accumulate(np.where(flag, np.arange(L), 0))
        ps = np.concatenate([[0], rs[:-1]])
        pl_ = np.where(flag, np.arange(L) - ps, 0)
        pd = np.where(flag, (-pl_) % blk_s, 0)
        slot = np.arange(L) + np.cumsum(pd)
        nb = int(slot[-1] // blk_s + 1)
        bi = slot // blk_s
        # block iters = max steps per block (only valid, real tids)
        mask = v & (tid_s < T)
        iters_b = np.zeros(nb)
        np.maximum.at(iters_b, bi[mask], s[mask])
        tot = iters_b.sum()
        occ = s[mask].sum() / max(tot * blk_s, 1)
        print(f"{label:40s} blocks={nb:5d} iters={tot:9.0f} "
              f"occ={occ:.3f}", flush=True)
        return tot

    # ---- chord predictor: ray segment length inside the treelet's
    # root bbox (phase A's slab test computes entry AND exit, so this
    # is free to record at collect time) --------------------------------
    tabnp = np.asarray(tl.table)  # [T, 64, P]
    # root bbox of treelet t = union of wide node col 0's 8 slot boxes
    root_b = np.empty((T, 6), np.float32)
    c0 = tabnp[:, :48, 0].reshape(T, 8, 6)
    valid_slot = c0[:, :, 0] <= c0[:, :, 1]
    big = np.float32(np.finfo(np.float32).max)
    for d in range(3):
        lo = np.where(valid_slot, c0[:, :, 2 * d], big).min(axis=1)
        hi = np.where(valid_slot, c0[:, :, 2 * d + 1], -big).max(axis=1)
        root_b[:, 2 * d] = lo
        root_b[:, 2 * d + 1] = hi
    ray_of = ray_of_pair  # [L] sorted order -> compact ray id
    tid_cl = np.clip(tidS, 0, T - 1)
    org_s = rayc[0:3][:, ray_of]
    dir_s = rayc[3:6][:, ray_of]
    tmin_s = rayc[6][ray_of]
    tmax_s = rayc[7][ray_of]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / dir_s
    t0c = np.full(L, -np.inf)
    t1c = np.full(L, np.inf)
    bsel = root_b[tid_cl]  # [L, 6]
    for d in range(3):
        lo = (bsel[:, 2 * d] - org_s[d]) * inv[d]
        hi = (bsel[:, 2 * d + 1] - org_s[d]) * inv[d]
        t0c = np.maximum(t0c, np.minimum(lo, hi))
        t1c = np.maximum(np.minimum(t1c, np.maximum(lo, hi)), t0c)
    chord = np.maximum(np.minimum(t1c, tmax_s) - np.maximum(t0c, tmin_s), 0)
    m = validS & (tidS < T)
    # within-run rank correlation chord vs steps
    from scipy import stats as _st  # noqa: F401

    try:
        rho = _st.spearmanr(chord[m], steps_srt[m]).statistic
        print(f"\nchord-vs-steps spearman (all pairs): {rho:.3f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(scipy unavailable: {e})", flush=True)

    def simulate_key(key2, blk_s, label, desc=True):
        idx = np.lexsort((-key2 if desc else key2, tidS))
        tid_s = tidS[idx]
        s = steps_srt[idx]
        v = validS[idx]
        prev = np.concatenate([[-1], tid_s[:-1]])
        flag = tid_s != prev
        rs = np.maximum.accumulate(np.where(flag, np.arange(L), 0))
        ps = np.concatenate([[0], rs[:-1]])
        pl_ = np.where(flag, np.arange(L) - ps, 0)
        pd = np.where(flag, (-pl_) % blk_s, 0)
        slot = np.arange(L) + np.cumsum(pd)
        nb = int(slot[-1] // blk_s + 1)
        bi = slot // blk_s
        mask = v & (tid_s < T)
        iters_b = np.zeros(nb)
        np.maximum.at(iters_b, bi[mask], s[mask])
        tot = iters_b.sum()
        occ = s[mask].sum() / max(tot * blk_s, 1)
        print(f"{label:40s} blocks={nb:5d} iters={tot:9.0f} "
              f"occ={occ:.3f}", flush=True)
        return tot

    print("\n--- simulated round-1 block_iters ---", flush=True)
    for blk_s in (1024, 512, 256, 128):
        simulate(None, blk_s, f"current order, block={blk_s}")
    for blk_s in (1024, 512, 256):
        simulate("entry", blk_s, f"entry-t order, block={blk_s}")
    for blk_s in (1024, 512, 256):
        simulate("steps", blk_s, f"oracle steps order, block={blk_s}")
    print("", flush=True)
    for blk_s in (1024, 512, 256):
        simulate_key(chord, blk_s, f"chord order, block={blk_s}")
    oct_s = oct_[ray_of].astype(np.float64)
    for blk_s in (1024, 512):
        # chord quantized to octaves, octant as tiebreak (coherence)
        q = np.floor(np.log2(np.maximum(chord, 1e-30)))
        key = -q * 8 - (7 - oct_s) / 8.0
        simulate_key(-key, blk_s,
                     f"chord-octave+oct order, block={blk_s}")

    # ---- oracle-pruning upper bound: pairs whose entry > the ray's
    # FINAL closest t would be culled by perfect intra-round pruning ---
    final_t = np.full(Rc, np.inf, np.float32)
    # per-pair best t from the kernel echo
    bt_pair = np.full(L, np.inf, np.float64)
    bt_pair[pid[ok]] = fout[0][ok]
    bt_srt = bt_pair[dataS_np[8].astype(np.int64)]
    np.minimum.at(final_t, ray_of[m], bt_srt[m].astype(np.float32))
    entry_s = entL[srt_pairs]
    culled = m & (entry_s > final_t[ray_of])
    print(f"\noracle-pruning: {culled.sum()} of {m.sum()} round-1 pairs "
          f"({100.0 * culled.sum() / max(m.sum(), 1):.1f}%) have entry > "
          f"final t; their steps = "
          f"{steps_srt[culled].sum():.0f} of {steps_srt[m].sum():.0f} "
          f"({100.0 * steps_srt[culled].sum() / steps_srt[m].sum():.1f}%)",
          flush=True)

    # ---- budget-split + recompact simulation -------------------------
    def simulate_budget(blk_s, budget, nphase, label):
        s = steps_srt[m].copy()
        tid_s = tidS[m]
        order = np.lexsort((np.arange(len(s)), tid_s))
        s = s[order]
        tid_s = tid_s[order]
        tot = 0.0
        for ph in range(nphase):
            if len(s) == 0:
                break
            prev = np.concatenate([[-1], tid_s[:-1]])
            flag = tid_s != prev
            n_ = len(s)
            rs = np.maximum.accumulate(np.where(flag, np.arange(n_), 0))
            ps = np.concatenate([[0], rs[:-1]])
            pl_ = np.where(flag, np.arange(n_) - ps, 0)
            pd = np.where(flag, (-pl_) % blk_s, 0)
            slot = np.arange(n_) + np.cumsum(pd)
            bi = slot // blk_s
            nb = int(bi[-1] + 1)
            last = ph == nphase - 1
            eff = np.minimum(s, np.inf if last else budget)
            iters_b = np.zeros(nb)
            np.maximum.at(iters_b, bi, eff)
            tot += iters_b.sum()
            if last:
                break
            keep = s > budget
            s = s[keep] - budget
            tid_s = tid_s[keep]
        print(f"{label:40s} iters={tot:9.0f}", flush=True)
        return tot

    print("\n--- budget-split (recompact survivors, keep stacks) ---",
          flush=True)
    for blk_s in (1024, 512):
        for budget in (16, 24, 32):
            simulate_budget(blk_s, budget, 4,
                            f"block={blk_s} budget={budget} x4 phases")

    # step distribution
    sv = steps_srt[validS & (tidS < T)]
    print(f"\nsteps/pair: mean {sv.mean():.1f} p50 {np.median(sv):.0f} "
          f"p90 {np.percentile(sv, 90):.0f} p99 "
          f"{np.percentile(sv, 99):.0f} max {sv.max():.0f}", flush=True)
    # run-length distribution
    runs = np.unique(tidS[validS & (tidS < T)], return_counts=True)[1]
    print(f"runs: n={len(runs)} mean {runs.mean():.0f} "
          f"p50 {np.median(runs):.0f} p90 {np.percentile(runs, 90):.0f} "
          f"max {runs.max()}", flush=True)


if __name__ == "__main__":
    main()
