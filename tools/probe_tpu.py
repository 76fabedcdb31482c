"""Hardware probes for the round-2 wide-treelet kernel design.

Measures, on the real TPU, the constants that size the kernel:
  A. per-while-iteration cost of a representative wide-node op chain
     as a function of ray-block width B and table columns C;
  B. cost of the 8-way sorting network (Batcher, 19 comparators);
  C. dual-chain interleaving (2 independent ray sub-blocks per body)
     to test whether the iteration floor is latency- or throughput-
     bound;
  D. XLA sort / gather costs at 1M elements (round bookkeeping).

Usage: python tools/probe_tpu.py  (run ALONE - single TPU process).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 256


def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _sort8(t0, words):
    """Batcher odd-even merge sort network for 8 rows: t0/words [8, B]."""
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7),
             (0, 2), (1, 3), (4, 6), (5, 7),
             (1, 2), (5, 6),
             (0, 4), (1, 5), (2, 6), (3, 7),
             (2, 4), (3, 5),
             (1, 2), (3, 4), (5, 6)]
    rows_t = [t0[i:i + 1] for i in range(8)]
    rows_w = [words[i:i + 1] for i in range(8)]
    for a, b in pairs:
        swap = rows_t[a] > rows_t[b]
        ta = jnp.where(swap, rows_t[b], rows_t[a])
        tb = jnp.where(swap, rows_t[a], rows_t[b])
        wa = jnp.where(swap, rows_w[b], rows_w[a])
        wb = jnp.where(swap, rows_w[a], rows_w[b])
        rows_t[a], rows_t[b] = ta, tb
        rows_w[a], rows_w[b] = wa, wb
    return jnp.concatenate(rows_t, 0), jnp.concatenate(rows_w, 0)


def make_kernel(B, C, rows, sort8, chains, stack_depth, iters):
    """A while-loop kernel whose body mimics one wide-treelet step:
    one-hot fetch of a [rows, C] table column, 8-child slab chain,
    optional sort-8, one one-hot stack push + pop."""

    def chain_step(table, state, org, inv_dir, inv_org):
        it, top, sp, stack, acc = state
        f32, i32 = jnp.float32, jnp.int32
        iota = jax.lax.broadcasted_iota(i32, (C, B), 0)
        oh = (iota == top).astype(f32)
        nrow = jax.lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [rows, B]
        # 8-child slab test: bounds rows 0..47 as 8 x (3 dims x lo/hi)
        t0s, t1s = [], []
        for c in range(8):
            t0 = jnp.zeros((1, B), f32)
            t1 = jnp.full((1, B), 1e30, f32)
            for d in range(3):
                lo = nrow[c * 6 + 2 * d: c * 6 + 2 * d + 1]
                hi = nrow[c * 6 + 2 * d + 1: c * 6 + 2 * d + 2]
                tn = lo * inv_dir[d:d + 1] + inv_org[d:d + 1]
                tf = hi * inv_dir[d:d + 1] + inv_org[d:d + 1]
                t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
                t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
            t0s.append(t0)
            t1s.append(t1)
        t0v = jnp.concatenate(t0s, 0)  # [8, B]
        t1v = jnp.concatenate(t1s, 0)
        hitm = t0v <= t1v
        words = nrow[48:56].astype(i32)
        keys = jnp.where(hitm, t0v, jnp.full_like(t0v, 1e30))
        if sort8:
            keys, words = _sort8(keys, words)
        # one push + one pop via one-hot rows
        lanes = jax.lax.broadcasted_iota(i32, (stack_depth, B), 0)
        stack = jnp.where(lanes == sp, words[0:1], stack)
        sp = jnp.where(jnp.any(hitm, 0, keepdims=True), sp + 1, sp)
        sp = jnp.maximum(sp - 1, 0)
        popped = jnp.max(jnp.where(lanes == sp, stack, 0), 0, keepdims=True)
        top = (popped + words[1:2] + it) % C
        acc = acc + keys[0:1]
        return (it + 1, top, sp, stack, acc)

    def kernel(table_ref, ray_ref, out_ref):
        f32, i32 = jnp.float32, jnp.int32
        table = table_ref[:, :]
        rays = ray_ref[:, :]
        org = rays[0:3]
        inv_dir = 1.0 / rays[3:6]
        inv_org = -inv_dir * org

        def mkstate():
            return (
                jnp.zeros((1, B), i32),
                jnp.zeros((1, B), i32),
                jnp.zeros((1, B), i32),
                jnp.zeros((stack_depth, B), i32),
                jnp.zeros((1, B), f32),
            )

        states = tuple(mkstate() for _ in range(chains))

        def cond(s):
            return s[0][0][0, 0] < iters

        def body(s):
            return tuple(
                chain_step(table, st, org, inv_dir, inv_org) for st in s
            )

        out = jax.lax.while_loop(cond, body, states)
        out_ref[:, :] = jnp.concatenate(
            [out[c][4] for c in range(chains)]
            + [jnp.zeros((8 - chains, B), jnp.float32)], 0
        )

    return kernel


@partial(jax.jit, static_argnames=("B", "C", "rows", "sort8", "chains",
                                   "stack_depth", "iters"))
def run_probe(table, rays, *, B, C, rows, sort8, chains, stack_depth, iters):
    kernel = make_kernel(B, C, rows, sort8, chains, stack_depth, iters)
    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[
                pl.BlockSpec((rows, C), lambda i: (0, 0)),
                pl.BlockSpec((8, B), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, B), lambda i: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(table, rays)


def probe_kernels():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rows = 64
    rng = np.random.default_rng(0)
    results = []
    configs = [
        # (B, C, sort8, chains)
        (512, 128, False, 1),
        (2048, 128, False, 1),
        (8192, 128, False, 1),
        (2048, 512, False, 1),
        (8192, 512, False, 1),
        (2048, 128, True, 1),
        (8192, 128, True, 1),
        (2048, 128, False, 2),
        (8192, 128, False, 2),
        (2048, 128, False, 4),
        (8192, 512, True, 1),
        (8192, 128, True, 2),
    ]
    LO, HI = 512, 8192
    for B, C, sort8, chains in configs:
        table = jnp.asarray(
            np.abs(rng.normal(0, 1, (rows, C))).astype(np.float32))
        rays = jnp.asarray(rng.normal(0, 1, (8, B)).astype(np.float32) + 2.0)
        try:
            def run(iters):
                return run_probe(
                    table, rays, B=B, C=C, rows=rows, sort8=sort8,
                    chains=chains, stack_depth=24, iters=iters,
                ).block_until_ready()

            t_lo = timeit(lambda: run(LO), n=5)
            t_hi = timeit(lambda: run(HI), n=5)
            us = (t_hi - t_lo) / (HI - LO) * 1e6
            eff = us / chains
            print(f"B={B:5d} C={C:4d} sort8={int(sort8)} chains={chains}: "
                  f"{us:7.3f} us/iter ({eff:6.3f} us/iter/chain) "
                  f"[launch+{LO}it: {t_lo * 1e3:.2f} ms]", flush=True)
            results.append((B, C, sort8, chains, us))
        except Exception as e:
            print(f"B={B} C={C} sort8={int(sort8)} chains={chains}: "
                  f"FAILED {str(e)[:200]}", flush=True)
    return results


def probe_xla():
    rng = np.random.default_rng(1)
    R = 1 << 20
    keys = jnp.asarray(rng.integers(0, 256, R, np.int32))
    pay = jnp.asarray(rng.normal(0, 1, (R, 8)).astype(np.float32))

    @jax.jit
    def do_sort(k, p):
        order = jnp.argsort(k)
        return order, jnp.take(p, order, axis=0)

    @jax.jit
    def do_sort_multiop(k, p):
        ops = (k,) + tuple(p[:, i] for i in range(8))
        out = jax.lax.sort(ops, num_keys=1)
        return out[1]

    @jax.jit
    def do_gather(p, idx):
        return jnp.take(p, idx, axis=0)

    idx = jnp.asarray(rng.permutation(R).astype(np.int32))
    t = timeit(lambda: jax.block_until_ready(do_sort(keys, pay)))
    print(f"argsort+take 1M x [8] f32: {t * 1e3:8.2f} ms", flush=True)
    t = timeit(lambda: jax.block_until_ready(do_sort_multiop(keys, pay)))
    print(f"lax.sort 1key+8ops 1M:     {t * 1e3:8.2f} ms", flush=True)
    t = timeit(lambda: jax.block_until_ready(do_gather(pay, idx)))
    print(f"take 1M rows [8] f32:      {t * 1e3:8.2f} ms", flush=True)
    k2 = jnp.asarray(rng.integers(0, 64, 1 << 17, np.int32))
    p2 = jnp.asarray(rng.normal(0, 1, (1 << 17, 8)).astype(np.float32))
    t = timeit(lambda: jax.block_until_ready(do_sort(k2, p2)))
    print(f"argsort+take 128K x [8]:   {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    probe_kernels()
    probe_xla()
