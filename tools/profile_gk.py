"""Measure group_forest_build on the TPU at sponza scale (262K prims).

Groups come from the same morton grid + greedy merge as build_minitree;
prims are packed [16, G*P] host-side; the kernel runs G grid steps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    from bvh_tpu.build.minitree import MiniTreeConfig, _grid_groups
    from bvh_tpu.build.group_kernel import group_forest_build
    from bvh_tpu.io.scenes import sponza_class

    tris = sponza_class(n, seed=0)
    mn = tris.min(axis=1).astype(np.float32)
    mx = tris.max(axis=1).astype(np.float32)
    cc = ((mn + mx) * 0.5).astype(np.float32)

    cfg = MiniTreeConfig()
    group, _ = np.asarray(
        jax.jit(lambda c: _grid_groups(c, cfg)[0], backend="cpu")(
            jnp.asarray(cc))), None
    group = np.asarray(group)
    order = np.lexsort((np.arange(n), group))
    gs = group[order]
    counts = np.bincount(gs)
    G = len(counts)
    print(f"n={n} groups={G} max={counts.max()} mean={counts.mean():.0f}")
    P = int(max(1024, ((counts.max() + 127) // 128) * 128))
    NCAP = 2 * P
    print(f"P={P} NCAP={NCAP} packed={16 * G * P * 4 / 1e6:.0f} MB")

    begins = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pf = np.zeros((16, G * P), np.float32)
    dst = np.arange(n) - begins[gs] + gs.astype(np.int64) * P
    pf[0:3, dst] = cc[order].T
    pf[3:6, dst] = mn[order].T
    pf[6:9, dst] = mx[order].T

    dev = jax.devices()[0]
    print("device:", dev)
    pf_d = jax.device_put(jnp.asarray(pf), dev)
    sizes_d = jax.device_put(jnp.asarray(counts, jnp.int32), dev)

    run = jax.jit(lambda p, s: group_forest_build(p, s, dim=3, P=P,
                                                  NCAP=NCAP))
    t0 = time.perf_counter()
    out = run(pf_d, sizes_d)
    cntv = np.asarray(out[3])
    print(f"compile+run: {time.perf_counter() - t0:.1f} s; "
          f"total nodes {cntv.sum()}")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(pf_d, sizes_d)
        s = float(np.asarray(out[3]).sum())  # forces completion
        dt = time.perf_counter() - t0
        print(f"steady: {dt * 1e3:.0f} ms -> {n / dt / 1e6:.2f} Mprims/s "
              f"(forest only; nodes={s:.0f})")


if __name__ == "__main__":
    main()
