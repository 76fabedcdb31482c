"""262K-scale parity: build_minitree vs build_minitree_fast on device."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
    from bvh_tpu.build.minitree_fast import build_minitree_fast
    from bvh_tpu.io.scenes import sponza_class

    tris = sponza_class(n, seed=0)
    mn = jnp.asarray(tris.min(axis=1), jnp.float32)
    mx = jnp.asarray(tris.max(axis=1), jnp.float32)
    cc = (mn + mx) * 0.5
    cfg = MiniTreeConfig()
    print("device:", jax.devices()[0])

    t0 = time.perf_counter()
    fast = build_minitree_fast(mn, mx, cc, cfg)
    ncf = int(fast.node_count)
    print(f"fast: {time.perf_counter()-t0:.0f} s, nodes={ncf}")

    t0 = time.perf_counter()
    ref = jax.jit(lambda a, b, c: build_minitree(a, b, c, cfg))(mn, mx, cc)
    ncr = int(ref.node_count)
    print(f"exact: {time.perf_counter()-t0:.0f} s, nodes={ncr}")

    assert ncr == ncf, (ncr, ncf)
    pr_r = np.asarray(ref.prim_ids)
    pr_f = np.asarray(fast.prim_ids)
    print("prim mismatches:", int((pr_r != pr_f).sum()))
    b_r = np.asarray(ref.bounds)[:ncr]
    b_f = np.asarray(fast.bounds)[:ncr]
    db = int((b_r != b_f).any(axis=1).sum())
    print("bounds mismatch rows:", db)
    i_r = np.asarray(ref.index)[:ncr]
    i_f = np.asarray(fast.index)[:ncr]
    print("index mismatch rows:", int((i_r != i_f).sum()))


if __name__ == "__main__":
    main()
