"""Round-3 per-stage profile of the CURRENT wide-treelet render.

Mirrors _render_jit's stages exactly (phase A, portal sort, round-1
partition+gathers, expansion sort, run placement, kernel, unsort,
merge, write-back) at the bench config, each chained x4 inside one jit
so the ~35 ms tunnel sync amortizes. Also A/Bs the round-3 candidate
replacements (scatter-unsort by pid echo, scatter write-back,
selected-only portal sort, 3-op expansion sort + gather).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

i32, f32 = jnp.int32, jnp.float32


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
    return x


SYNC_MS = [35.0]


def bench(name, fn, *a, n=3, per=4):
    sync(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[n // 2] * 1e3
    print(f"{name:44s} {t:8.1f} ms  (per op {(t - SYNC_MS[0]) / per:7.2f})",
          flush=True)
    return (t - SYNC_MS[0]) / per


def main():
    n = 262_144
    side = 1024
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse import wide_treelet as wt
    from bvh_tpu.traverse.collect import _collect_kernel

    tris = sponza_class(n, seed=0)
    import glob
    dev = sorted(glob.glob(f"/tmp/bench_sponza_dev_{n}_*.bvh"))
    path = dev[0] if dev else f"/tmp/bench_sponza_{n}.bvh"
    print(f"BVH: {path}", flush=True)
    bvh = load_bvh(path)
    tri = Tri(*(jnp.asarray(tris[:, i]) for i in range(3)))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, side, side)
    R = side * side
    tl = wt.build_wide_treelets(bvh, flat, max_prims=1024)
    table = (jax.jit(wt.pack_kernel_table)(
        tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
        if tl.table.shape[2] >= wt.PACK_MIN_P else tl.table)
    T, ROWS, P = table.shape
    block, top_block, MP, K = 1024, 8192, 32, 4
    Rp = wt._round_up(R, wt._lcm(block, top_block))
    Rc = Rp // 8
    L = K * Rc
    NBL = -(-L // block) + min(T + 2, 4096)
    print(f"T={T} P={P} Rp={Rp} Rc={Rc} L={L} NBL={NBL}", flush=True)

    packed = np.zeros((8, Rp), np.float32)
    packed[0:3, :R] = np.asarray(rays.org.T)
    packed[3:6, :R] = np.asarray(rays.dir.T)
    packed[6, :R] = np.asarray(rays.tmin)
    packed[7, :R] = np.asarray(rays.tmax)
    packed = jnp.asarray(packed)

    # ---- measure the sync floor ------------------------------------
    @jax.jit
    def null(x):
        return x + 1.0

    sync(null(jnp.zeros(())))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(null(jnp.zeros(())))
        ts.append(time.perf_counter() - t0)
    SYNC_MS[0] = sorted(ts)[2] * 1e3
    print(f"sync floor: {SYNC_MS[0]:.1f} ms", flush=True)

    # ---- phase A ----------------------------------------------------
    def phase_a_only(top_node_t, packed):
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
                         stack_depth=16, max_portals=MP)  # hwm-measured max is 8; 48 + the r5 shift-stack copies exceed scoped VMEM
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((MP, Rp), i32),
                       jax.ShapeDtypeStruct((MP, Rp), f32),
                       jax.ShapeDtypeStruct((8, Rp), i32)],
        )(top_node_t, packed, root)

    @jax.jit
    def phase_a_x4(top_node_t, packed):
        def body(i, c):
            out = phase_a_only(top_node_t, c)
            return c - jnp.nan_to_num(out[1][0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, packed)

    bench("phase A kernel", phase_a_x4, tl.top_node_t, packed)
    ptid0, ptent0, cnt = jax.jit(phase_a_only)(tl.top_node_t, packed)
    cnt_np = np.asarray(cnt[0])
    print(f"  rays with portals: {(cnt_np > 0).sum()} "
          f"max {cnt_np.max()} total pairs {cnt_np.sum()}", flush=True)

    # ---- portal sort: full width vs selected only --------------------
    @jax.jit
    def psort_full(ptent, ptid):
        def body(i, c):
            e, t = jax.lax.sort((c, ptid), num_keys=1, dimension=0)
            return c - jnp.nan_to_num(e[0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, ptent)

    bench("portal sort [32,1M] 2-op", psort_full, ptent0, ptid0)

    ptent, ptid = jax.lax.sort((ptent0, ptid0), num_keys=1, dimension=0)
    sync(ptent)

    iota_r = jnp.arange(Rp, dtype=i32)
    iota_mp = jax.lax.broadcasted_iota(i32, (MP, 1), 0)
    iota_L = jnp.arange(L, dtype=i32)
    tmax0 = packed[7]
    ray_rows = packed[0:7]
    S6 = jnp.stack([tmax0, jnp.full((Rp,), jnp.inf, f32),
                    jnp.zeros((Rp,), f32), jnp.zeros((Rp,), f32),
                    jnp.full((Rp,), -1.0, f32), jnp.zeros((Rp,), f32)])

    def ready_of(S6_, ptid_, ptent_):
        cur = S6_[5].astype(i32)[None, :]
        rowmask = iota_mp == cur
        p_t = jnp.max(jnp.where(rowmask, ptent_, -jnp.inf), axis=0)
        p_tid = jnp.max(jnp.where(rowmask, ptid_, -1), axis=0)
        return (p_tid >= 0) & (p_t <= S6_[0])

    # ---- stage 1: partition + gathers --------------------------------
    def stage1(S6_, ptid_, ptent_):
        key = 1 - ready_of(S6_, ptid_, ptent_).astype(i32)
        _, ids = jax.lax.sort((key, iota_r), num_keys=1)
        sel = ids[:Rc]
        Ssel = jnp.take(S6_, sel, axis=1)
        raysel = jnp.take(ray_rows, sel, axis=1)
        ptid_sel = jnp.take(ptid_, sel, axis=1)
        ptent_sel = jnp.take(ptent_, sel, axis=1)
        return ids, sel, Ssel, raysel, ptid_sel, ptent_sel

    @jax.jit
    def stage1_x4(S6_, ptid_, ptent_):
        def body(i, c):
            out = stage1(c, ptid_, ptent_)
            return c - jnp.nan_to_num(out[2][0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, S6_)

    bench("stage1: partition+gathers", stage1_x4, S6, ptid, ptent)
    ids, sel, Ssel, raysel, ptid_sel, ptent_sel = [
        sync(x) for x in jax.jit(stage1)(S6, ptid, ptent)]

    # portal sort at Rc only (candidate: replaces full-width sort)
    @jax.jit
    def psort_sel(ptent_sel, ptid_sel):
        def body(i, c):
            e, t = jax.lax.sort((c, ptid_sel), num_keys=1, dimension=0)
            return c - jnp.nan_to_num(e[0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, ptent_sel)

    bench("candidate: portal sort [32,131K]", psort_sel, ptent_sel,
          ptid_sel)

    # ---- stage 2: window + 11-op expansion sort + scans --------------
    def windows(Ssel_, ptid_sel_, ptent_sel_):
        cursel = Ssel_[5].astype(i32)[None, :]
        wtid, wt_ = [], []
        for j in range(K):
            rm = iota_mp == cursel + j
            wtid.append(jnp.max(jnp.where(rm, ptid_sel_, -1), axis=0))
            wt_.append(jnp.max(jnp.where(rm, ptent_sel_, -jnp.inf),
                               axis=0))
        wtid = jnp.stack(wtid)
        wt_ = jnp.stack(wt_)
        validk = (wtid >= 0) & (wt_ <= Ssel_[0][None, :])
        return wtid, validk

    def stage2(Ssel_, raysel_, ptid_sel_, ptent_sel_):
        wtid, validk = windows(Ssel_, ptid_sel_, ptent_sel_)
        keyL = jnp.where(validk, wtid, T).reshape(L)
        pidf = iota_L.astype(f32)
        validf = validk.reshape(L).astype(f32)
        ops = (keyL,) + tuple(
            jnp.tile(raysel_[i], (K,)) for i in range(7)) + (
            jnp.tile(Ssel_[0], (K,)), pidf, validf)
        sorted_ = jax.lax.sort(ops, num_keys=1)
        keyS = sorted_[0]
        dataS = jnp.stack(sorted_[1:11])
        pad = jnp.zeros((10, block + 128), f32).at[8].set(float(L))
        dataS = jnp.concatenate([dataS, pad], axis=1)
        dataS = jnp.concatenate(
            [dataS, jnp.zeros((6, L + block + 128), f32)], axis=0)
        prev = jnp.concatenate([jnp.full((1,), -1, i32), keyS[:-1]])
        flag = keyS != prev
        run_start = jax.lax.cummax(jnp.where(flag, iota_L, 0))
        prev_start = jnp.concatenate([jnp.zeros((1,), i32),
                                      run_start[:-1]])
        prev_len = jnp.where(flag, iota_L - prev_start, 0)
        pad_delta = jnp.where(flag, (-prev_len) % block, 0)
        lane_slot = iota_L + jnp.cumsum(pad_delta)
        blocks_i = jnp.arange(NBL, dtype=i32)
        p0_b = jnp.searchsorted(lane_slot, blocks_i * block,
                                side="left").astype(i32)
        p0c = jnp.clip(p0_b, 0, L - 1)
        t_b = jnp.take(keyS, p0c)
        tid_of_block = jnp.clip(t_b, 0, T - 1)
        l0_b = jnp.take(lane_slot, p0c)
        e_b = jnp.searchsorted(keyS, t_b, side="right").astype(i32)
        start_un = p0_b - l0_b + blocks_i * block
        start_b = jnp.clip(start_un, 0, L)
        erel_b = jnp.where(start_un == start_b,
                           jnp.maximum(e_b - start_un, 0), 0)
        return validk, dataS, tid_of_block, start_b, erel_b, lane_slot

    @jax.jit
    def stage2_x4(Ssel_, raysel_, ptid_sel_, ptent_sel_):
        def body(i, c):
            out = stage2(c, raysel_, ptid_sel_, ptent_sel_)
            return c - jnp.nan_to_num(out[1][0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, Ssel_)

    bench("stage2: window+11op-sort+scans", stage2_x4, Ssel, raysel,
          ptid_sel, ptent_sel)
    validk, dataS, tid_of_block, start_b, erel_b, lane_slot = [
        sync(x) for x in jax.jit(stage2)(Ssel, raysel, ptid_sel,
                                         ptent_sel)]

    # 11-op sort alone vs 3-op sort + 9-row gather
    wtid, validk2 = jax.jit(windows)(Ssel, ptid_sel, ptent_sel)
    keyL = jnp.where(validk2, wtid, T).reshape(L)
    sync(keyL)

    @jax.jit
    def sort11(keyL_, raysel_, Ssel_):
        def body(i, c):
            pidf = iota_L.astype(f32)
            ops = (c,) + tuple(
                jnp.tile(raysel_[j], (K,)) for j in range(7)) + (
                jnp.tile(Ssel_[0], (K,)), pidf, pidf)
            s = jax.lax.sort(ops, num_keys=1)
            return c - s[1][0].astype(i32) * 0  # int feed: no inf/NaN risk

        return jax.lax.fori_loop(0, 4, body, keyL_)

    bench("  11-op sort [524K] alone", sort11, keyL, raysel, Ssel)

    @jax.jit
    def sort3_gather(keyL_, raysel_, Ssel_):
        rows9 = jnp.concatenate(
            [jnp.tile(raysel_, (1, K)), jnp.tile(Ssel_[0:1], (1, K))],
            axis=0)

        def body(i, c):
            pidf = iota_L.astype(f32)
            s = jax.lax.sort((c, pidf, pidf), num_keys=1)
            pid = s[1].astype(i32)
            dat = jnp.take(rows9, pid, axis=1)
            return c - dat[0].astype(i32) * 0  # int feed: no inf/NaN risk

        return jax.lax.fori_loop(0, 4, body, keyL_)

    bench("  3-op sort + take 9 rows [524K]", sort3_gather, keyL, raysel,
          Ssel)

    # ---- stage 3: kernel ---------------------------------------------
    def stage3(tid_, start_, erel_, table_, dataS_):
        return wt._phase_b(tid_, start_, erel_, table_, dataS_,
                           block=block, any_hit=False, robust=False,
                           stack_depth=24, interpret=False)

    @jax.jit
    def stage3_x4(tid_, start_, erel_, table_, dataS_):
        def body(i, c):
            out = stage3(tid_, start_, erel_, table_, c)
            return c - jnp.nan_to_num(out[0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, dataS_)

    bench("stage3: kernel", stage3_x4, tid_of_block, start_b, erel_b,
          table, dataS)
    fout = sync(jax.jit(stage3)(tid_of_block, start_b, erel_b, table,
                                dataS))
    it = np.asarray(fout[5].reshape(NBL, block)[:, 0])
    print(f"  block iters: total {it.sum():.0f} "
          f"active blocks {(it > 1).sum()}", flush=True)

    # ---- stage 4: unsort + merge + write-back ------------------------
    def stage4(fout_, S6_, ids_, Ssel_, validk_):
        so = jax.lax.sort(
            (fout_[4], fout_[0], fout_[1], fout_[2], fout_[3]),
            num_keys=1)
        out_pair = jnp.stack(so[1:])[:, :L].reshape(4, K, Rc)
        n_tmax = Ssel_[0]
        n_bt, n_bu, n_bv, n_pos = (Ssel_[1], Ssel_[2], Ssel_[3],
                                   Ssel_[4])
        for j in range(K):
            better = validk_[j] & (out_pair[0, j] < n_bt)
            n_bt = jnp.where(better, out_pair[0, j], n_bt)
            n_bu = jnp.where(better, out_pair[1, j], n_bu)
            n_bv = jnp.where(better, out_pair[2, j], n_bv)
            n_pos = jnp.where(better, out_pair[3, j], n_pos)
        n_tmax = jnp.minimum(n_tmax, n_bt)
        new6 = jnp.stack([n_tmax, n_bt, n_bu, n_bv, n_pos,
                          Ssel_[5] + K])
        old_tail = jnp.take(S6_, ids_[Rc:], axis=1)
        rows_cat = jnp.concatenate([new6, old_tail], axis=1)
        sorted_back = jax.lax.sort(
            (ids_,) + tuple(rows_cat[i] for i in range(6)), num_keys=1)
        return jnp.stack(sorted_back[1:])

    @jax.jit
    def stage4_x4(fout_, S6_, ids_, Ssel_, validk_):
        def body(i, c):
            return stage4(fout_, c, ids_, Ssel_, validk_)

        return jax.lax.fori_loop(0, 4, body, S6_)

    bench("stage4: unsort+merge+sortback", stage4_x4, fout, S6, ids,
          Ssel, validk)

    # candidates for stage 4 pieces
    @jax.jit
    def unsort5(fout_):
        def body(i, c):
            so = jax.lax.sort((c, fout_[0], fout_[1], fout_[2],
                               fout_[3]), num_keys=1)
            return c - jnp.nan_to_num(so[1] * 0.0)

        return jax.lax.fori_loop(0, 4, body, fout_[4])

    bench("  unsort 5-op sort [909K]", unsort5, fout)

    @jax.jit
    def unsort_scatter(fout_):
        def body(i, c):
            pid = fout_[4].astype(i32)
            out = jnp.zeros((4, L + 1), f32).at[:, pid].set(
                fout_[0:4] + i)
            return c - jnp.nan_to_num(out[0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, jnp.zeros(()))

    bench("  candidate: scatter-unsort [4,909K]", unsort_scatter, fout)

    new6 = jnp.stack([Ssel[0]] * 6)

    @jax.jit
    def sortback7(S6_, ids_, new6_):
        def body(i, c):
            old_tail = jnp.take(c, ids_[Rc:], axis=1)
            rows_cat = jnp.concatenate([new6_, old_tail], axis=1)
            sorted_back = jax.lax.sort(
                (ids_,) + tuple(rows_cat[j] for j in range(6)),
                num_keys=1)
            return jnp.stack(sorted_back[1:])

        return jax.lax.fori_loop(0, 4, body, S6_)

    bench("  sortback 7-op [1M]", sortback7, S6, ids, new6)

    @jax.jit
    def scatterback(S6_, sel_, new6_):
        def body(i, c):
            return c.at[:, sel_].set(new6_ + i)

        return jax.lax.fori_loop(0, 4, body, S6_)

    bench("  candidate: scatter-back 131K cols", scatterback, S6, sel,
          new6)

    # row-split scatter (6 separate 1-D scatters)
    @jax.jit
    def scatterback_rows(S6_, sel_, new6_):
        def body(i, c):
            rows = [c[j].at[sel_].set(new6_[j] + i) for j in range(6)]
            return jnp.stack(rows)

        return jax.lax.fori_loop(0, 4, body, S6_)

    bench("  candidate: scatter-back 6x1-D", scatterback_rows, S6, sel,
          new6)


if __name__ == "__main__":
    main()
