"""Small-scale TPU compile probe for the group-build kernel variants."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu.build.group_kernel import group_forest_build


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "ls"
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    G = 4
    rng = np.random.default_rng(0)
    n = G * P
    sizes = np.full(G, P, np.int32)
    c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 2.0, (n, 3)).astype(np.float32)
    pf = np.zeros((16, n), np.float32)
    pf[0:3] = c.T
    pf[3:6] = (c - h).T
    pf[6:9] = (c + h).T
    out = group_forest_build(
        jnp.asarray(pf), jnp.asarray(sizes), dim=3, P=P, variant=variant)
    print(variant, "nodes:", np.asarray(out[3]))


if __name__ == "__main__":
    main()
