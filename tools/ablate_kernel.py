"""Per-iteration cost ablation of the wide-treelet kernel.

A synthetic treelet table forms a chain of wide nodes (each node's
slot 0 is a huge box leading to the next node; other slots empty), so
every lane executes exactly `depth` node iterations then pops dry.
Timing two depths gives the marginal per-iteration cost; kernel
variants with chunks disabled decompose it.

Usage: python tools/ablate_kernel.py [--block 1024] [--p 384]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
    return x


def make_chain_table(depth, P):
    """[1, 64, P] table: cols 0..depth-1 wide nodes, slot 0 box = world,
    child word -> next col; last node has no hits (empty boxes)."""
    t = np.zeros((1, 64, P), np.float32)
    big = np.float32(np.finfo(np.float32).max)
    # default all slots empty boxes
    for d in range(3):
        t[0, 0 + 2 * d::6][: 8] = 0  # noop, clarity
    for c in range(P):
        for s in range(8):
            t[0, s * 6 + 0, c] = big
            t[0, s * 6 + 1, c] = -big
            t[0, s * 6 + 2, c] = big
            t[0, s * 6 + 3, c] = -big
            t[0, s * 6 + 4, c] = big
            t[0, s * 6 + 5, c] = -big
    for c in range(depth - 1):
        # slot 0: huge box, child = inner node c+1
        t[0, 0, c] = -1e30
        t[0, 1, c] = 1e30
        t[0, 2, c] = -1e30
        t[0, 3, c] = 1e30
        t[0, 4, c] = -1e30
        t[0, 5, c] = 1e30
        t[0, 48, c] = np.float32((c + 1) << 4)
    return jnp.asarray(t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--p", type=int, default=384)
    ap.add_argument("--reps", type=int, default=24)
    args = ap.parse_args()
    B, P = args.block, args.p

    from bvh_tpu.traverse import wide_treelet as wt

    brays = np.zeros((8, B), np.float32)
    brays[0:3] = 0.0
    brays[3] = 1.0  # dir x
    brays[6] = 0.0  # tmin
    brays[7] = 1.0  # active
    brays = jnp.asarray(brays)
    bstate = np.zeros((8, B), np.float32)
    bstate[0] = 1e30  # tmax
    bstate[1] = np.inf
    bstate[4] = -1.0
    bstate = jnp.asarray(bstate)
    btid = jnp.zeros((1,), jnp.int32)

    def run(table, kernel_fn, sd, reps):
        Pv = table.shape[2]

        def one(brays):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((1, 64, Pv), lambda i, tid: (tid[i], 0, 0)),
                    pl.BlockSpec((8, B), lambda i, tid: (0, i)),
                    pl.BlockSpec((8, B), lambda i, tid: (0, i)),
                ],
                out_specs=pl.BlockSpec((8, B), lambda i, tid: (0, i)),
            )
            return pl.pallas_call(
                partial(kernel_fn, any_hit=False, robust=False,
                        stack_depth=sd),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
            )(btid, table, brays, bstate)

        @jax.jit
        def chained(brays):
            def body(i, c):
                out = one(c)
                return c - jnp.nan_to_num(out[0:1, 0:1] * 0.0)

            return jax.lax.fori_loop(0, reps, body, brays)

        sync(chained(brays))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(chained(brays))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    def measure(name, kernel_fn, sd=24, P_=None):
        Pv = P_ or P
        t_lo = run(make_chain_table(16, Pv), kernel_fn, sd, args.reps)
        t_hi = run(make_chain_table(Pv - 16, Pv), kernel_fn, sd, args.reps)
        per_iter = (t_hi - t_lo) / ((Pv - 32) * args.reps)
        print(f"{name:34s}: {per_iter*1e6:7.2f} us/iter "
              f"(lo {t_lo*1e3:.1f} hi {t_hi*1e3:.1f} ms)", flush=True)

    print(f"platform: {jax.devices()[0].platform} B={B} P={P}", flush=True)
    measure("full kernel sd=24", wt._wide_kernel, 24)
    measure("full kernel sd=8", wt._wide_kernel, 8)

    # ---- ablation variants ------------------------------------------
    import bvh_tpu.traverse.wide_treelet as m

    src_mod = {}

    def variant(name, transform):
        import inspect
        import types

        src = inspect.getsource(m._wide_kernel)
        src = transform(src)
        ns = dict(m.__dict__)
        exec(compile(src, f"<{name}>", "exec"), ns)
        return ns["_wide_kernel"]

    # (a) no quad MT chunk
    def no_quad(src):
        a = src.index("# ---- quad leaf step")
        b = src.index("leaf_cur = jnp.where(in_leaf, leaf_cur + 1")
        return (src[:a]
                + "done_by_hit = jnp.zeros((1, B), bool)\n        "
                + src[b:])

    measure("no quad MT", variant("noquad", no_quad), 24)

    # (b) no sort8 (slot order)
    def no_sort(src):
        return src.replace("kt, wt = _sort8(keys, words)",
                           "kt = [keys[i:i+1] for i in range(8)]\n"
                           "        wt = [words[i:i+1] for i in range(8)]")

    measure("no sort8", variant("nosort", no_sort), 24)

    # (c) fetch cost via P scaling: same kernel, narrower table
    measure("full kernel P=128", wt._wide_kernel, 24, P_=128)

    # (d) no stack push loop (wrong results, cost probe only)
    def no_push(src):
        return src.replace(
            "        for j in range(WIDTH - 1, 0, -1):",
            "        for j in []:")

    measure("no stack pushes", variant("nopush", no_push), 24)

    # (e) default-precision dot (inexact, cost probe only)
    def fast_dot(src):
        return src.replace("precision=jax.lax.Precision.HIGHEST",
                           "precision=jax.lax.Precision.DEFAULT")

    measure("default-precision dot", variant("fastdot", fast_dot), 24)


if __name__ == "__main__":
    main()
