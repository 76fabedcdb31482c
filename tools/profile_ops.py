"""True on-device op costs: chain K dependent copies of each op inside
one jit so the ~30 ms tunnel roundtrip amortizes away.

Usage: python tools/profile_ops.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sync(out):
    """block_until_ready is a no-op on axon; force a readback."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def bench(name, fn, *args, n=3):
    out = sync(fn(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[n // 2]
    print(f"{name}: {t*1e3:8.1f} ms total", flush=True)
    return out, t


import jax
import jax.numpy as jnp

Rp = 1 << 20
K = 16
i32, f32 = jnp.int32, jnp.float32

key = jnp.asarray(np.random.randint(0, 376, Rp).astype(np.int32))
iota = jnp.arange(Rp, dtype=i32)
pay = jnp.asarray(np.random.rand(Rp).astype(np.float32))
idx = jnp.asarray(np.random.permutation(Rp).astype(np.int32))

print(f"platform: {jax.devices()[0].platform}  Rp={Rp} K={K}", flush=True)


@jax.jit
def noop(x):
    return x + 1


_, t_round = bench("roundtrip (x+1)", noop, pay)


@jax.jit
def chain_sort2(key, iota):
    def body(i, c):
        k, v = c
        k2, v2 = jax.lax.sort((k, v), num_keys=1)
        return (k2 ^ (i + 1), v2)  # break idempotence

    return jax.lax.fori_loop(0, K, body, (key, iota))


_, t = bench("sort 2-op i32", chain_sort2, key, iota)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_sort8(key, iota, pay):
    p = [pay + j for j in range(6)]

    def body(i, c):
        k, v, *ps = c
        out = jax.lax.sort(tuple([k, v] + ps), num_keys=1)
        return (out[0] ^ (i + 1),) + out[1:]

    return jax.lax.fori_loop(0, K, body, tuple([key, iota] + p))


_, t = bench("sort 8-op", chain_sort8, key, iota, pay)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_gather(pay, idx):
    def body(i, c):
        return jnp.take(c, idx)

    return jax.lax.fori_loop(0, K, body, pay)


_, t = bench("gather f32[1M]", chain_gather, pay, idx)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


x8 = jnp.asarray(np.random.rand(Rp, 8).astype(np.float32))


@jax.jit
def chain_gather8(x8, idx):
    def body(i, c):
        return jnp.take(c, idx, axis=0)

    return jax.lax.fori_loop(0, K, body, x8)


_, t = bench("gather f32[1M,8] rows", chain_gather8, x8, idx)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)

mp = jnp.asarray(np.random.rand(32, Rp).astype(np.float32))
cur = jnp.zeros((Rp,), i32)


@jax.jit
def chain_maskmax(mp, cur):
    iota_mp = jax.lax.broadcasted_iota(i32, (32, 1), 0)

    def body(i, c):
        rowmask = iota_mp == c[None, :]
        t = jnp.max(jnp.where(rowmask, mp, -jnp.inf), axis=0)
        return (c + t.astype(i32)) % 32

    return jax.lax.fori_loop(0, K, body, cur)


_, t = bench("masked max [32,1M]", chain_maskmax, mp, cur)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_searchsorted(pay, key):
    tids = jnp.arange(376, dtype=i32)

    def body(i, c):
        s = jnp.searchsorted(c, tids).astype(i32)
        return c + s.sum().astype(f32) * 0

    return jax.lax.fori_loop(0, K, body, pay)


_, t = bench("searchsorted 376 in 1M", chain_searchsorted, pay, key)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_elem(pay):
    def body(i, c):
        return jnp.where(c > 0.5, c * 0.99, c + 0.01)

    return jax.lax.fori_loop(0, K, body, pay)


_, t = bench("elementwise where [1M]", chain_elem, pay)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)

# idle pallas launch cost: NB blocks whose lanes are all inactive
from functools import partial

import jax.experimental.pallas as pl

from bvh_tpu.traverse import wide_treelet as wt

T, ROWS, P = 376, 64, 384
table = jnp.asarray(np.random.rand(T, ROWS, P).astype(np.float32))
block = 2048
NB = Rp // block
btid = jnp.zeros((NB,), i32)
brays = jnp.zeros((8, Rp), f32)  # active row 7 = 0 -> all idle
bstate = jnp.zeros((8, Rp), f32)


@jax.jit
def idle_kernel(btid, table, brays, bstate):
    def body(i, c):
        out = wt._phase_b(btid, table, c, bstate, block=block,
                          any_hit=False, robust=False, stack_depth=24,
                          interpret=False)
        return jnp.concatenate([out[0:7], c[7:8]], axis=0)

    return jax.lax.fori_loop(0, 4, body, brays)


_, t = bench("idle phase_b x4 (512 idle blocks)", idle_kernel, btid, table,
             brays, bstate)
print(f"  per launch: {(t - t_round)/4*1e3:8.2f} ms "
      f"({(t - t_round)/4/NB*1e6:.1f} us/block)", flush=True)

# ---- layout ops for the pair-schedule glue ------------------------------
x8w = jnp.asarray(np.random.rand(8, Rp).astype(np.float32))
idx4 = jnp.asarray(np.random.permutation(Rp).astype(np.int32))


@jax.jit
def chain_gather_ax1(x8w, idx4):
    def body(i, c):
        return jnp.take(c, idx4, axis=1)

    return jax.lax.fori_loop(0, K, body, x8w)


_, t = bench("gather [8,1M] axis=1", chain_gather_ax1, x8w, idx4)
print(f"  per op: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_transpose(x8w):
    def body(i, c):
        return (c.T + 1.0).T

    return jax.lax.fori_loop(0, K, body, x8w)


_, t = bench("transpose [8,1M] x2 (+1)", chain_transpose, x8w)
print(f"  per op pair: {(t - t_round)/K*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_sort2_4m(key, iota):
    k4 = jnp.concatenate([key, key, key, key])
    v4 = jnp.concatenate([iota, iota, iota, iota])

    def body(i, c):
        k, v = c
        k2, v2 = jax.lax.sort((k, v), num_keys=1)
        return (k2 ^ (i + 1), v2)

    return jax.lax.fori_loop(0, 4, body, (k4, v4))


_, t = bench("sort 2-op [4M] x4", chain_sort2_4m, key, iota)
print(f"  per op: {(t - t_round)/4*1e3:8.2f} ms", flush=True)


@jax.jit
def chain_gather8_4m(x8, idx):
    x32 = jnp.concatenate([x8, x8, x8, x8], axis=0)
    i4 = jnp.concatenate([idx, idx + 1, idx ^ 1, idx ^ 2])

    def body(i, c):
        return jnp.take(c, i4, axis=0)

    return jax.lax.fori_loop(0, 4, body, x32)


_, t = bench("gather [4M,8] rows x4", chain_gather8_4m, x8, idx)
print(f"  per op: {(t - t_round)/4*1e3:8.2f} ms", flush=True)

# portal-table sort [32, 1M] along axis 0
mpv = jnp.asarray(np.random.rand(32, Rp).astype(np.float32))
mpi = jnp.asarray(np.random.randint(0, 376, (32, Rp)).astype(np.int32))


@jax.jit
def chain_psort(mpv, mpi):
    def body(i, c):
        v, d = jax.lax.sort(c, num_keys=1, dimension=0)
        return (v * -1.0, d)

    return jax.lax.fori_loop(0, 4, body, (mpv, mpi))


_, t = bench("portal sort [32,1M] ax0 x4", chain_psort, mpv, mpi)
print(f"  per op: {(t - t_round)/4*1e3:8.2f} ms", flush=True)
