"""Profile the FULL build_minitree_fast pipeline at sponza scale.

Reports host staging ms, device (kernel + assemble) ms, and end-to-end
Mprims/s on the current jax default device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    from bvh_tpu.build.minitree_fast import build_minitree_fast
    from bvh_tpu.io.scenes import sponza_class

    tris = sponza_class(n, seed=0)
    import jax.numpy as jnp

    # device-resident inputs (the real pipeline hands over jnp arrays;
    # matches how the LBVH rate is measured in bench.py)
    mn = jnp.asarray(tris.min(axis=1).astype(np.float32))
    mx = jnp.asarray(tris.max(axis=1).astype(np.float32))
    cc = jnp.asarray(((tris.min(axis=1) + tris.max(axis=1)) * 0.5)
                     .astype(np.float32))
    print("device:", jax.devices()[0])

    t0 = time.perf_counter()
    bvh = build_minitree_fast(mn, mx, cc)
    nc = int(bvh.node_count)
    print(f"first call (compile): {time.perf_counter() - t0:.1f} s; "
          f"nodes={nc}")

    for _ in range(3):
        t0 = time.perf_counter()
        bvh = build_minitree_fast(mn, mx, cc)
        nc = int(bvh.node_count)  # forces completion
        dt = time.perf_counter() - t0
        print(f"end-to-end: {dt * 1e3:.0f} ms -> {n / dt / 1e6:.2f} "
              f"Mprims/s (nodes={nc})")


if __name__ == "__main__":
    main()
