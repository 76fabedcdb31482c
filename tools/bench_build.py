"""TPU build throughput benchmark (forced-readback timing).

usage: python tools/bench_build.py [--n 262144 10000000] [--minitree]
Run ALONE (single TPU process).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="*", default=[262_144])
    ap.add_argument("--minitree", action="store_true")
    ap.add_argument("--binned", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="mini-tree via the per-group Pallas kernel")
    ap.add_argument("--high", action="store_true",
                    help="device quality=high: mini-tree fast + reinsertion")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=0,
                    help="ALSO measure mtf/high steady-state: K builds "
                         "chained inside ONE jitted program (amortizes "
                         "the ~100 ms/call tunnel dispatch, the analogue "
                         "of the render chain)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bvh_tpu.build.lbvh import build_lbvh
    from bvh_tpu.io.scenes import sponza_class

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return r

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    for n in args.n:
        tris = sponza_class(n, seed=0)
        bb_min = jnp.asarray(tris.min(axis=1))
        bb_max = jnp.asarray(tris.max(axis=1))
        centers = jnp.asarray(tris.mean(axis=1))

        fns = [("lbvh", jax.jit(build_lbvh))]
        if args.minitree:
            from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
            fns.append(("minitree", jax.jit(
                lambda a, b, c: build_minitree(a, b, c, MiniTreeConfig()))))
        if args.binned:
            from bvh_tpu.build.binned import build_binned
            fns.append(("binned", jax.jit(build_binned)))
        if args.fast:
            from bvh_tpu.build.minitree_fast import build_minitree_fast
            # host-staged sizing inside; jitted per-shape internally
            fns.append(("mtf", build_minitree_fast))
        if args.high:
            from bvh_tpu.build.minitree_fast import build_minitree_fast
            from bvh_tpu.build.reinsertion import (
                ReinsertionConfig, optimize_reinsertion)

            def high(a, b, c):
                bvh = build_minitree_fast(a, b, c)
                return optimize_reinsertion(bvh, ReinsertionConfig())

            fns.append(("high", high))

        for name, fn in fns:
            try:
                t0 = time.perf_counter()
                bvh = sync(fn(bb_min, bb_max, centers))
                t_compile = time.perf_counter() - t0
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    bvh = sync(fn(bb_min, bb_max, centers))
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                dt = ts[len(ts) // 2]
                print(f"n={n:>9} {name:9s}: {n/dt/1e6:8.3f} Mprims/s "
                      f"({dt*1e3:8.1f} ms, compile {t_compile:.1f}s, "
                      f"{int(bvh.node_count)} nodes)", flush=True)
            except Exception as e:
                print(f"n={n:>9} {name:9s}: FAILED {str(e)[:200]}", flush=True)

        if args.chain:
            from bvh_tpu.build.minitree import MiniTreeConfig
            from bvh_tpu.build.minitree_fast import (
                _device_build_raw, staging_plan)
            from bvh_tpu.build.reinsertion import (
                ReinsertionConfig, optimize_reinsertion)

            cfg = MiniTreeConfig()
            order, counts, statics, cfg = staging_plan(centers, cfg)
            raw = _device_build_raw(*statics, cfg, False)
            K = args.chain

            def chain_of(step, k):
                @jax.jit
                def run(bb_min, bb_max, centers, order, counts):
                    def body(i, c):
                        bvh = step(bb_min, bb_max, c, order, counts)
                        # data-dependent feed-forward so XLA cannot
                        # collapse the chain (bounds[0,0] is the scene
                        # min corner: x + 0*x == x exactly)
                        return c + 0.0 * bvh.bounds[0, 0]

                    c = jax.lax.fori_loop(0, k - 1, body, centers)
                    return step(bb_min, bb_max, c, order, counts)

                return run

            tiers = [("mtf chain", raw),
                     ("lbvh chain",
                      lambda a, b, c, order, counts: build_lbvh(a, b, c))]
            if args.high:
                rcfg = ReinsertionConfig()
                tiers.append(("high chain", lambda *a: optimize_reinsertion(
                    raw(*a), rcfg)))
            for name, step in tiers:
                try:
                    # Probe with a 1-build program first, then clamp the
                    # chain so ONE program stays under ~90 s of device
                    # time: a 2M quality=high chain of 8 x 33 s builds in
                    # one program crashed the TPU worker (UNAVAILABLE,
                    # BENCHMARKS_r4) — the tunnel does not survive
                    # multi-minute programs.
                    probe = chain_of(step, 1)
                    t0 = time.perf_counter()
                    bvh = sync(probe(bb_min, bb_max, centers, order,
                                     counts))
                    t_compile = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    bvh = sync(probe(bb_min, bb_max, centers, order,
                                     counts))
                    t_single = time.perf_counter() - t0
                    # 40 s: a ~70 s 3-chained 2M high program still
                    # crashed the worker (r5) — the tunnel tolerates
                    # less than the r4 crash suggested
                    k_eff = max(1, min(K, int(40.0 / max(t_single, 1e-3))))
                    if k_eff > 1:
                        fn = chain_of(step, k_eff)
                        t0 = time.perf_counter()
                        bvh = sync(fn(bb_min, bb_max, centers, order,
                                      counts))
                        t_compile += time.perf_counter() - t0
                    else:
                        fn = probe
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        bvh = sync(fn(bb_min, bb_max, centers, order,
                                      counts))
                        ts.append((time.perf_counter() - t0) / k_eff)
                    ts.sort()
                    dt = ts[len(ts) // 2]
                    print(f"n={n:>9} {name:9s}: {n/dt/1e6:8.3f} Mprims/s "
                          f"({dt*1e3:8.1f} ms/build x{k_eff}, compile "
                          f"{t_compile:.1f}s, {int(bvh.node_count)} nodes)",
                          flush=True)
                except Exception as e:
                    print(f"n={n:>9} {name:9s}: FAILED {str(e)[:200]}",
                          flush=True)


if __name__ == "__main__":
    main()
