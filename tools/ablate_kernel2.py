"""Per-iteration cost attribution of the wide-treelet kernel on the
REAL sponza round-1 workload (saved by tools/profile_occupancy.py as
/tmp/occ_round1.npz).

Each variant toggles wide_treelet._ABLATE (trace-time gates; results
intentionally wrong for ablated variants), re-places the pairs at the
requested block size, chains the kernel k times in one jit, and
reports ms/render and ns/iteration — normalized by the variant's OWN
measured block-iteration count, since ablation changes control flow.

Usage: python tools/ablate_kernel2.py [--block 512] [--chain 8]
Run ALONE (single TPU process).
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

i32, f32 = jnp.int32, jnp.float32


def place(tidS, L, T, blk, max_runs=4096):
    iota_L = np.arange(L, dtype=np.int64)
    prev = np.concatenate([[-1], tidS[:-1]])
    flag = tidS != prev
    run_start = np.maximum.accumulate(np.where(flag, iota_L, 0))
    prev_start = np.concatenate([[0], run_start[:-1]])
    prev_len = np.where(flag, iota_L - prev_start, 0)
    pad_delta = np.where(flag, (-prev_len) % blk, 0)
    lane_slot = iota_L + np.cumsum(pad_delta)
    NBL = -(-L // blk) + min(T + 2, max_runs)
    blocks_i = np.arange(NBL)
    p0_b = np.searchsorted(lane_slot, blocks_i * blk, side="left")
    p0c = np.clip(p0_b, 0, L - 1)
    t_b = tidS[p0c]
    tid_of_block = np.clip(t_b, 0, T - 1)
    l0_b = lane_slot[p0c]
    e_b = np.searchsorted(tidS, t_b, side="right")
    start_un = p0_b - l0_b + blocks_i * blk
    start_b = np.clip(start_un, 0, L)
    erel_b = np.where(start_un == start_b,
                      np.maximum(e_b - start_un, 0), 0)
    return tid_of_block, start_b, erel_b, NBL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--variants", type=str,
                    default="base,leaf,nosort8,fetch2,fetch1,leaf+nosort8")
    args = ap.parse_args()

    from bvh_tpu.io.scenes import sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.traverse import wide_treelet as wt
    import glob

    z = np.load("/tmp/occ_round1.npz")
    dataS, tidS = z["dataS"], z["tidS"]
    L, T = int(z["L"]), int(z["T"])
    print(f"workload: L={L} T={T}", flush=True)

    n = 262_144
    tris = sponza_class(n, seed=0)
    dev = sorted(glob.glob(f"/tmp/bench_sponza_dev_{n}_*.bvh"))
    bvh = load_bvh(dev[0])
    tri = Tri(*(jnp.asarray(tris[:, i]) for i in range(3)))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    tl = wt.build_wide_treelets(bvh, flat, max_prims=1024)
    ktab = (jax.jit(wt.pack_kernel_table)(
        tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
        if tl.table.shape[2] >= wt.PACK_MIN_P else tl.table)

    blk = args.block
    tid_b, start_b, erel_b, NBL = place(tidS, L, T, blk)
    pad = np.zeros((10, blk + 128), np.float32)
    pad[8] = float(L)
    dataS_full = np.concatenate([dataS, pad], axis=1)
    dataS_full = np.concatenate(
        [dataS_full, np.zeros((6, L + blk + 128), np.float32)], axis=0)
    dev_args = (jnp.asarray(tid_b, i32), jnp.asarray(start_b, i32),
                jnp.asarray(erel_b, i32), ktab, jnp.asarray(dataS_full))

    def sync(x):
        np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
        return x

    K = args.chain
    results = {}
    for name in args.variants.split(","):
        wt._ABLATE = (frozenset()
                      if name == "base" else frozenset(name.split("+")))

        @jax.jit
        def run(tid_b, start_b, erel_b, ktab, data):
            def body(i, c):
                f = wt._phase_b(tid_b, start_b, erel_b, ktab, c,
                                block=blk, any_hit=False, robust=False,
                                stack_depth=24, interpret=False)
                # NaN-safe: f[0,0] is +inf when lane 0 misses
                bump = jnp.nan_to_num(f[0, 0] * 0.0).astype(c.dtype)
                return c.at[0, 0].add(bump)

            data = jax.lax.fori_loop(0, K - 1, body, data)
            f = wt._phase_b(tid_b, start_b, erel_b, ktab, data,
                            block=blk, any_hit=False, robust=False,
                            stack_depth=24, interpret=False)
            iters = jnp.sum(f[5].reshape(NBL, blk)[:, 0])
            return f[0, 0], iters

        t0 = time.perf_counter()
        out = sync(run(*dev_args))
        tc = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = sync(run(*dev_args))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1]
        iters = float(out[1])
        per_pass = t / K
        per_iter = per_pass / max(iters, 1) * 1e9
        results[name] = (per_pass * 1e3, iters, per_iter)
        print(f"{name:16s}: {per_pass*1e3:7.2f} ms/pass  "
              f"iters={iters:8.0f}  {per_iter:7.1f} ns/iter "
              f"(compile {tc:.0f}s)", flush=True)
    wt._ABLATE = frozenset()

    if "base" in results:
        b = results["base"][2]
        for name, (_, _, pi) in results.items():
            if name != "base":
                print(f"  {name:16s} saves {b - pi:6.1f} ns/iter "
                      f"({100*(b-pi)/b:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
