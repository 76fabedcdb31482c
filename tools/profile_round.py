"""Per-stage cost of one wide-treelet pair round on the sponza scene.

Each stage is chained x4 inside one jit (fake dependency) so the
~30 ms tunnel roundtrip amortizes away.

Usage: python tools/profile_round.py [--block 1024] [--k 4]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--max-prims", type=int, default=1024)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--rc-div", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp

    from bvh_tpu.api.native import NativeBvh3f, load_library
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse import wide_treelet as wt
    from bvh_tpu.traverse.treelet import _collect_kernel

    def sync(x):
        np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
        return x

    def bench(name, fn, *a, n=3):
        sync(fn(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[n // 2]
        print(f"{name}: {t*1e3:8.1f} ms", flush=True)
        return t

    i32, f32 = jnp.int32, jnp.float32
    tris = sponza_class(args.n, seed=0)
    cache = f"/tmp/bench_sponza_{args.n}.bvh"
    if not os.path.exists(cache):
        nat = NativeBvh3f(load_library())
        h = nat.build(tris.min(axis=1), tris.max(axis=1),
                      tris.mean(axis=1), quality=2)
        nat.save(h, cache)
        nat.destroy(h)
    bvh = load_bvh(cache)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, args.rays, args.rays)
    R = args.rays * args.rays

    tl = wt.build_wide_treelets(bvh, flat, max_prims=args.max_prims)
    table = tl.table
    T, ROWS, P = table.shape
    block, top_block, MP, K = args.block, 8192, 32, args.k
    Rp = wt._round_up(R, wt._lcm(block, top_block))
    Rc = max(block, wt._round_up(Rp // args.rc_div, block))
    L = K * Rc
    NBL = L // block + T
    LL = NBL * block
    print(f"T={T} P={P} Rp={Rp} Rc={Rc} K={K} L={L} LL={LL} "
          f"NBL={NBL}", flush=True)

    packed = np.zeros((8, Rp), np.float32)
    packed[0:3, :R] = np.asarray(rays.org.T)
    packed[3:6, :R] = np.asarray(rays.dir.T)
    packed[6, :R] = np.asarray(rays.tmin)
    packed[7, :R] = np.asarray(rays.tmax)
    packed = jnp.asarray(packed)

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
                         stack_depth=48, max_portals=MP)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((MP, Rp), i32),
                jax.ShapeDtypeStruct((MP, Rp), f32),
                jax.ShapeDtypeStruct((8, Rp), i32),
            ],
        )(top_node_t, packed, root)
        ptid, ptent, cnt = out
        ptent, ptid = jax.lax.sort((ptent, ptid), num_keys=1, dimension=0)
        return ptid, ptent, cnt

    bench("phase A + portal sort", phase_a, tl.top_node_t, packed)
    ptid, ptent, cnt = phase_a(tl.top_node_t, packed)

    tmax0 = packed[7]
    S6 = jnp.stack([tmax0, jnp.full((Rp,), jnp.inf, f32),
                    jnp.zeros((Rp,), f32), jnp.zeros((Rp,), f32),
                    jnp.full((Rp,), -1.0, f32), jnp.zeros((Rp,), f32)])
    ray_rows = packed[0:7]
    iota_r = jnp.arange(Rp, dtype=i32)
    iota_L = jnp.arange(L, dtype=i32)
    iota_LL = jnp.arange(LL, dtype=i32)
    iota_mp = jax.lax.broadcasted_iota(i32, (MP, 1), 0)
    tids = jnp.arange(T, dtype=i32)

    def ready_of(S6):
        cur = S6[5].astype(i32)[None, :]
        rowmask = iota_mp == cur
        p_t = jnp.max(jnp.where(rowmask, ptent, -jnp.inf), axis=0)
        p_tid = jnp.max(jnp.where(rowmask, ptid, -1), axis=0)
        return (p_tid >= 0) & (p_t <= S6[0])

    # ---- stage 1: ready + partition + select gathers ------------------
    def ready_of2(S6, ptid, ptent):
        cur = S6[5].astype(i32)[None, :]
        rowmask = iota_mp == cur
        p_t = jnp.max(jnp.where(rowmask, ptent, -jnp.inf), axis=0)
        p_tid = jnp.max(jnp.where(rowmask, ptid, -1), axis=0)
        return (p_tid >= 0) & (p_t <= S6[0])

    def stage1(S6, ptid, ptent, ray_rows):
        key = 1 - ready_of2(S6, ptid, ptent).astype(i32)
        _, ids = jax.lax.sort((key, iota_r), num_keys=1)
        sel = ids[:Rc]
        Ssel = jnp.take(S6, sel, axis=1)
        raysel = jnp.take(ray_rows, sel, axis=1)
        ptid_sel = jnp.take(ptid, sel, axis=1)
        ptent_sel = jnp.take(ptent, sel, axis=1)
        return ids, sel, Ssel, raysel, ptid_sel, ptent_sel

    @jax.jit
    def stage1x(S6, ptid, ptent, ray_rows):
        def body(i, c):
            out = stage1(c, ptid, ptent, ray_rows)
            return c * 1.0 + (out[2][0, 0] * 0)

        return jax.lax.fori_loop(0, 4, body, S6)

    t1 = bench("stage1 x4 (part+gathers)", stage1x, S6, ptid, ptent, ray_rows)
    s1 = jax.jit(stage1)(S6, ptid, ptent, ray_rows)
    ids, sel, Ssel, raysel, ptid_sel, ptent_sel = [sync(x) for x in s1]

    # ---- stage 2: window + pair sort + block map + lane gathers --------
    def stage2(Ssel, raysel, ptid_sel, ptent_sel):
        cursel = Ssel[5].astype(i32)[None, :]
        wtid, wtt = [], []
        for j in range(K):
            rm = iota_mp == cursel + j
            wtid.append(jnp.max(jnp.where(rm, ptid_sel, -1), axis=0))
            wtt.append(jnp.max(jnp.where(rm, ptent_sel, -jnp.inf), axis=0))
        wtid = jnp.stack(wtid)
        wtt = jnp.stack(wtt)
        validk = (wtid >= 0) & (wtt <= Ssel[0][None, :])
        keyL = jnp.where(validk, wtid, T).reshape(L)
        keyS, pidS = jax.lax.sort((keyL, iota_L), num_keys=1)
        start_t = jnp.searchsorted(keyS, tids, side="left").astype(i32)
        end_t = jnp.searchsorted(keyS, tids, side="right").astype(i32)
        nblk_t = -(-(end_t - start_t) // block)
        blk_base = jnp.cumsum(nblk_t) - nblk_t
        total_blocks = blk_base[-1] + nblk_t[-1]
        blocks = jnp.arange(NBL, dtype=i32)
        tid_of_block = (
            jnp.searchsorted(blk_base, blocks, side="right").astype(i32) - 1)
        tid_of_block = jnp.clip(tid_of_block, 0, T - 1)
        slot_b = iota_LL // block
        slot_l = iota_LL % block
        t_b = jnp.take(tid_of_block, slot_b)
        pos = (jnp.take(start_t, t_b)
               + (slot_b - jnp.take(blk_base, t_b)) * block + slot_l)
        lane_ok = (slot_b < total_blocks) & (pos < jnp.take(end_t, t_b))
        pid = jnp.take(pidS, jnp.clip(pos, 0, L - 1))
        s_of = pid % Rc
        data = jnp.take(jnp.concatenate([raysel, Ssel], axis=0),
                        s_of, axis=1)
        brays = jnp.concatenate(
            [data[0:7], lane_ok[None, :].astype(f32)], axis=0)
        bstate = jnp.concatenate(
            [data[7:12], jnp.zeros((3, LL), f32)], axis=0)
        return (validk, keyS, pidS, start_t, blk_base, tid_of_block,
                brays, bstate)

    @jax.jit
    def stage2x(Ssel, raysel, ptid_sel, ptent_sel):
        def body(i, c):
            out = stage2(c, raysel, ptid_sel, ptent_sel)
            return c + out[6][0, 0] * 0

        return jax.lax.fori_loop(0, 4, body, Ssel)

    t2 = bench("stage2 x4 (pairs+map+gathers)", stage2x, Ssel, raysel,
               ptid_sel, ptent_sel)
    s2 = jax.jit(stage2)(Ssel, raysel, ptid_sel, ptent_sel)
    (validk, keyS, pidS, start_t, blk_base, tid_of_block, brays,
     bstate) = [sync(x) for x in s2]
    nvalid = int(np.asarray(validk).sum())
    print(f"  valid pairs: {nvalid}", flush=True)

    # ---- stage 3: kernel ------------------------------------------------
    def stage3(tid_of_block, table, brays, bstate):
        return wt._phase_b(tid_of_block, table, brays, bstate, block=block,
                           any_hit=False, robust=False, stack_depth=24,
                           interpret=False)

    @jax.jit
    def stage3x(tid_of_block, table, brays, bstate):
        def body(i, c):
            out = stage3(tid_of_block, table, c, bstate)
            return c + out[0, 0] * 0

        return jax.lax.fori_loop(0, 4, body, brays)

    t3 = bench("stage3 x4 (kernel)", stage3x, tid_of_block, table, brays,
               bstate)
    fout = sync(jax.jit(stage3)(tid_of_block, table, brays, bstate))

    # ---- stage 4: unsort + merge + writeback ----------------------------
    def stage4(fout, S6, ids, Ssel, validk, keyS, pidS, start_t, blk_base):
        kt = jnp.clip(keyS, 0, T - 1)
        pos_in_run = iota_L - jnp.take(start_t, kt)
        slot_of_i = ((jnp.take(blk_base, kt) + pos_in_run // block) * block
                     + pos_in_run % block)
        out_sorted = jnp.take(fout[0:5], jnp.clip(slot_of_i, 0, LL - 1),
                              axis=1)
        _, posL = jax.lax.sort((pidS, iota_L), num_keys=1)
        out_pair = jnp.take(out_sorted, posL, axis=1).reshape(5, K, Rc)
        n_tmax = Ssel[0]
        n_bt, n_bu, n_bv, n_pos = Ssel[1], Ssel[2], Ssel[3], Ssel[4]
        for j in range(K):
            vj = validk[j]
            n_tmax = jnp.where(vj, jnp.minimum(n_tmax, out_pair[0, j]),
                               n_tmax)
            better = vj & (out_pair[1, j] < n_bt)
            n_bt = jnp.where(better, out_pair[1, j], n_bt)
            n_bu = jnp.where(better, out_pair[2, j], n_bu)
            n_bv = jnp.where(better, out_pair[3, j], n_bv)
            n_pos = jnp.where(better, out_pair[4, j], n_pos)
        new6 = jnp.stack([n_tmax, n_bt, n_bu, n_bv, n_pos, Ssel[5] + K])
        old_tail = jnp.take(S6, ids[Rc:], axis=1)
        rows_cat = jnp.concatenate([new6, old_tail], axis=1)
        sorted_back = jax.lax.sort(
            (ids,) + tuple(rows_cat[i] for i in range(6)), num_keys=1)
        return jnp.stack(sorted_back[1:])

    @jax.jit
    def stage4x(fout, S6, ids, Ssel, validk, keyS, pidS, start_t, blk_base):
        def body(i, c):
            out = stage4(fout, c, ids, Ssel, validk, keyS, pidS, start_t,
                         blk_base)
            return out

        return jax.lax.fori_loop(0, 4, body, S6)

    t4 = bench("stage4 x4 (unsort+merge+wb)", stage4x, fout, S6, ids, Ssel,
               validk, keyS, pidS, start_t, blk_base)

    rt = 0.030
    print(f"\nper-round estimate: "
          f"s1 {(t1-rt)/4*1e3:.1f} + s2 {(t2-rt)/4*1e3:.1f} + "
          f"s3 {(t3-rt)/4*1e3:.1f} + s4 {(t4-rt)/4*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
