"""Measure phase-B kernel cost with the REAL round-1 schedule on the
sponza-class scene, plus per-iteration cost at controlled depths.

Usage: python tools/profile_phaseb.py [--block 2048]
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
    ap.add_argument("--block", type=int, default=2048)
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
    print(f"platform: {jax.devices()[0].platform}", flush=True)
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
    T, ROWS, P = tl.table.shape
    print(f"T={T} P={P} n_wide mean {tl.n_wide.mean():.0f}", flush=True)

    block, top_block, MP = args.block, 8192, 32
    Rp = wt._round_up(R, wt._lcm(block, top_block))
    NB = Rp // block
    packed = np.zeros((8, Rp), np.float32)
    packed[0:3, :R] = np.asarray(rays.org.T)
    packed[3:6, :R] = np.asarray(rays.dir.T)
    packed[6, :R] = np.asarray(rays.tmin)
    packed[7, :R] = np.asarray(rays.tmax)
    packed = jnp.asarray(packed)

    # ---- phase A to get real portals -----------------------------------
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
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((MP, Rp), i32),
                jax.ShapeDtypeStruct((MP, Rp), f32),
                jax.ShapeDtypeStruct((8, Rp), i32),
            ],
        )(top_node_t, packed, root)

    bench("phase A", phase_a, tl.top_node_t, packed)
    ptid, ptent, cnt = phase_a(tl.top_node_t, packed)
    ptent, ptid = jax.lax.sort((ptent, ptid), num_keys=1, dimension=0)
    ptid_np = np.asarray(ptid)
    ptent_np = np.asarray(ptent)
    cnt_np = np.asarray(cnt[0])
    print(f"portal count: mean {cnt_np.mean():.2f} max {cnt_np.max()} "
          f"total {cnt_np.sum()}", flush=True)

    # ---- build round-1 schedule on host --------------------------------
    key = np.where(ptid_np[0] >= 0, ptid_np[0], T)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    start_t = np.searchsorted(key_s, np.arange(T))
    end_t = np.searchsorted(key_s, np.arange(T), side="right")
    cnt_t = end_t - start_t
    nblk_t = -(-cnt_t // block)
    blk_base = np.cumsum(nblk_t) - nblk_t
    total_blocks = int(min(blk_base[-1] + nblk_t[-1], NB))
    print(f"round-1 ready rays: {(key < T).sum()}  "
          f"active blocks: {total_blocks}/{NB}", flush=True)

    btid = np.zeros(NB, np.int64)
    brays = np.zeros((8, NB * block), np.float32)
    bstate = np.zeros((8, NB * block), np.float32)
    packed_np = np.asarray(packed)
    for t in range(T):
        for b in range(nblk_t[t]):
            blk = blk_base[t] + b
            btid[blk] = t
            lo = start_t[t] + b * block
            hi = min(start_t[t] + (b + 1) * block, end_t[t])
            rays_sel = order[lo:hi]
            sl = slice(blk * block, blk * block + (hi - lo))
            brays[0:7, sl] = packed_np[0:7, rays_sel]
            brays[7, sl] = 1.0
            bstate[0, sl] = packed_np[7, rays_sel]
            bstate[1, sl] = np.inf
            bstate[4, sl] = -1.0
    btid_j = jnp.asarray(btid.astype(np.int32))
    brays_j = jnp.asarray(brays)
    bstate_j = jnp.asarray(bstate)

    def run_phaseb(btid, brays, bstate, sd=24):
        return wt._phase_b(btid, tl.table, brays, bstate, block=block,
                           any_hit=False, robust=False, stack_depth=sd,
                           interpret=False)

    pb = jax.jit(partial(run_phaseb))
    t1 = bench("phase B round-1 schedule", pb, btid_j, brays_j, bstate_j)
    print(f"  -> per active block: {t1*1e3/max(total_blocks,1):.3f} ms",
          flush=True)

    # ---- per-iteration cost: all lanes traverse treelet 0 --------------
    # lanes active but rays degenerate (miss everything fast) vs real
    for name, nblocks in (("64 dense blocks tid0", 64),):
        bt2 = jnp.zeros((nblocks,), i32)
        br2 = brays_j[:, : nblocks * block]
        bs2 = bstate_j[:, : nblocks * block]

        def pb2(bt2, br2, bs2):
            return wt._phase_b(bt2, tl.table, br2, bs2, block=block,
                               any_hit=False, robust=False, stack_depth=24,
                               interpret=False)

        t2 = bench(name, jax.jit(pb2), bt2, br2, bs2)
        print(f"  -> per block: {t2*1e3/nblocks:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
