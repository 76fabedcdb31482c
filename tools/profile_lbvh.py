"""Stage-by-stage cost of build_lbvh on the default device.

Stages are jitted separately (morton+sort / range search / split search
/ sparse-table bounds / assemble+SATO) with device-resident handoff, so
per-stage times sum to roughly the fused end-to-end time.

Usage: python tools/profile_lbvh.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from bvh_tpu.build import lbvh as L
    from bvh_tpu.io.scenes import sponza_class

    tris = sponza_class(n, seed=0)
    bb_min = jnp.asarray(tris.min(axis=1).astype(np.float32))
    bb_max = jnp.asarray(tris.max(axis=1).astype(np.float32))
    centers = jnp.asarray(tris.mean(axis=1).astype(np.float32))
    print("device:", jax.devices()[0])

    bits = L._grid_bits(3, L.LbvhConfig())
    kmax = max(1, (n - 1).bit_length()) + 1

    @jax.jit
    def s1(centers):
        codes = L._morton_codes(centers, bits)
        mc, order = jax.lax.sort(
            (codes, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return mc.astype(jnp.int32), order

    def make_delta(mc_i):
        def delta(i, j):
            ok = (j >= 0) & (j < n)
            jc = jnp.clip(j, 0, n - 1)
            x = jnp.bitwise_xor(mc_i[i], mc_i[jc])
            same = x == 0
            x2 = jnp.bitwise_xor(i, jc)
            d = jnp.where(same, 32 + jax.lax.clz(x2), jax.lax.clz(x))
            return jnp.where(ok, d, -1)
        return delta

    @jax.jit
    def s2(mc_i):
        delta = make_delta(mc_i)
        ii = jnp.arange(n - 1, dtype=jnp.int32)
        d_dir = jnp.sign(delta(ii, ii + 1) - delta(ii, ii - 1)).astype(jnp.int32)
        d_dir = jnp.where(d_dir == 0, 1, d_dir)
        delta_min = delta(ii, ii - d_dir)

        def len_body(k, l):
            t = jnp.int32(1 << (kmax - 1 - k))
            probe = ii + (l + t) * d_dir
            take = delta(ii, probe) > delta_min
            return jnp.where(take, l + t, l)

        l = jax.lax.fori_loop(0, kmax, len_body,
                              jnp.zeros((n - 1,), jnp.int32))
        return d_dir, l

    @jax.jit
    def s3(mc_i, d_dir, l):
        delta = make_delta(mc_i)
        ii = jnp.arange(n - 1, dtype=jnp.int32)
        jj = ii + l * d_dir
        delta_node = delta(ii, jj)

        def split_body(k, s):
            t_k = jnp.maximum(-((-l) >> (k + 1)), 1)
            probe = ii + (s + t_k) * d_dir
            take = (delta(ii, probe) > delta_node) & (s + t_k < l)
            return jnp.where(take, s + t_k, s)

        s = jax.lax.fori_loop(0, kmax, split_body,
                              jnp.zeros((n - 1,), jnp.int32))
        return s

    @jax.jit
    def s4(bb_min, bb_max, order, d_dir, l):
        ii = jnp.arange(n - 1, dtype=jnp.int32)
        jj = ii + l * d_dir
        lo = jnp.minimum(ii, jj)
        hi = jnp.maximum(ii, jj)
        pmn = bb_min[order]
        pmx = bb_max[order]
        return L._sparse_table_union(pmn, pmx, lo, hi)

    @jax.jit
    def s5(bb_min, bb_max, centers):
        return L.build_lbvh(bb_min, bb_max, centers)

    def sync(out):
        # block_until_ready does not block on this platform; force a
        # scalar readback (see PERFORMANCE.md).
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    def bench(name, fn, *args):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name:24s} {ts[1]*1e3:8.1f} ms")
        return out

    mc_i, order = bench("morton+sort", s1, centers)
    d_dir, l = bench("range search", s2, mc_i)
    bench("split search", s3, mc_i, d_dir, l)
    bench("sparse-table bounds", s4, bb_min, bb_max, order, d_dir, l)
    bench("full build (fused)", s5, bb_min, bb_max, centers)


if __name__ == "__main__":
    main()
