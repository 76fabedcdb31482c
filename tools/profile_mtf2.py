"""Stage-by-stage timing of build_minitree_fast at sponza scale."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    from bvh_tpu.build.minitree import MiniTreeConfig
    from bvh_tpu.build.minitree_fast import _host_groups, _device_build
    from bvh_tpu.io.scenes import sponza_class

    tris = sponza_class(n, seed=0)
    bb_min = tris.min(axis=1).astype(np.float32)
    bb_max = tris.max(axis=1).astype(np.float32)
    centers = ((bb_min + bb_max) * 0.5).astype(np.float32)
    config = MiniTreeConfig()
    dim = 3
    print("device:", jax.devices()[0])

    for it in range(3):
        t = {}
        t0 = time.perf_counter()
        group, g_cap = _host_groups(centers, config)
        t["groups"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        prim_ids = np.arange(n, dtype=np.int64)
        order = np.lexsort((prim_ids, group))
        gs = group[order]
        counts_all = np.bincount(group, minlength=g_cap).astype(np.int32)
        tids = np.nonzero(counts_all > 0)[0].astype(np.int32)
        G = len(tids)
        counts = counts_all[tids]
        P = int(max(128, ((counts.max() + 127) // 128) * 128))
        NCAP = 2 * P
        dense_of = np.full(g_cap, -1, np.int64)
        dense_of[tids] = np.arange(G)
        base = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        dst = (np.arange(n) - base[dense_of[gs]]) + dense_of[gs] * P
        pf = np.zeros((16, G * P), np.float32)
        cc = centers[order]
        pf[0:dim, dst] = cc.T
        pf[dim:2 * dim, dst] = bb_min[order].T
        pf[2 * dim:3 * dim, dst] = bb_max[order].T
        gq = np.repeat(np.arange(G, dtype=np.int64), counts)
        flat_q = (gq * P + (np.arange(n) - base[gq])).astype(np.int32)
        off_q = base[gq].astype(np.int32)
        t["pack"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        args = [jnp.asarray(pf), jnp.asarray(counts),
                jnp.asarray(order.astype(np.int64)),
                jnp.asarray(base[:-1].astype(np.int32)),
                jnp.asarray(flat_q), jnp.asarray(off_q)]
        # force the transfers
        _ = [a.block_until_ready() for a in args]
        t["h2d"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        dev_fn = _device_build(n, dim, G, P, NCAP, g_cap, config, False)
        bvh = dev_fn(*args)
        nc = int(bvh.node_count)
        t["device"] = time.perf_counter() - t0
        tot = sum(t.values())
        print(f"iter {it}: " + " ".join(
            f"{k}={v * 1e3:.0f}ms" for k, v in t.items())
            + f" total={tot * 1e3:.0f}ms -> {n / tot / 1e6:.2f} Mprims/s "
            f"(G={G} P={P} nodes={nc})")


if __name__ == "__main__":
    main()
