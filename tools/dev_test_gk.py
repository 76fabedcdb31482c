"""Dev check: group kernel vs build_binned on a single group (CPU)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.group_kernel import group_forest_build
from bvh_tpu.core.types import Index


def run_one(n, P, seed, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        k = max(1, n // 50)
        cent = rng.uniform(0, 100, (k, 3))
        c = cent[rng.integers(0, k, n)] + rng.normal(0, 1.0, (n, 3))
    else:
        c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 2.0, (n, 3))
    mn = (c - h).astype(np.float32)
    mx = (c + h).astype(np.float32)
    cc = ((mn + mx) * 0.5).astype(np.float32)

    ref = build_binned(jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc))
    nc_ref = int(ref.node_count)

    pf = np.zeros((16, P), np.float32)
    pf[0:3, :n] = cc.T
    pf[3:6, :n] = mn.T
    pf[6:9, :n] = mx.T
    nbf, nbi, src, cnt = group_forest_build(
        jnp.asarray(pf), jnp.asarray([n]), dim=3, P=P, interpret=True)
    nbf, nbi, src, cnt = map(np.asarray, (nbf, nbi, src, cnt))
    nc = int(cnt[0])
    assert nc == nc_ref, f"node_count {nc} != {nc_ref}"

    # prim order
    order_ref = np.asarray(ref.prim_ids).astype(np.int64)
    order_k = src[:n]
    assert np.array_equal(order_k, order_ref), (
        f"order mismatch: {np.sum(order_k != order_ref)} of {n}")

    # bounds + index
    bounds_ref = np.asarray(ref.bounds)[:nc]
    bounds_k = nbf[0:6, :nc].T
    assert np.array_equal(bounds_k, bounds_ref), (
        f"bounds mismatch at {np.argwhere(bounds_k != bounds_ref)[:5]}")
    idx_ref = np.asarray(ref.index)[:nc]
    begin = nbi[0, :nc]
    end = nbi[1, :nc]
    child = nbi[2, :nc]
    leaf = child < 0
    idx_k = np.where(
        leaf,
        (begin.astype(np.uint32) << 4)
        | (end - begin).astype(np.uint32),
        child.astype(np.uint32) << 4,
    )
    bad = np.nonzero(idx_k != idx_ref)[0]
    assert len(bad) == 0, (
        f"index mismatch at slots {bad[:6]}: "
        f"ours={idx_k[bad[:6]]} ref={idx_ref[bad[:6]]}")
    print(f"  n={n} P={P} seed={seed} clustered={clustered}: "
          f"OK ({nc} nodes)")


if __name__ == "__main__":
    run_one(5, 128, 0)
    run_one(100, 128, 1)
    run_one(500, 512, 2)
    run_one(500, 512, 3, clustered=True)
    run_one(1000, 1024, 4)
    run_one(1000, 1024, 5, clustered=True)
    print("all ok")
