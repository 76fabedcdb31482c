"""Probe: does Mosaic lower a per-lane dynamic gather (sublane dim) on
this backend? If yes, table fetches can drop the O(P*B) one-hot matmul.

Variants:
  A: x[idx, lane] via take_along_axis over a [P, B] broadcast — naive
  B: within-tile gather: one-hot to pick the 8-row tile + per-lane
     sublane gather via take_along_axis on an [8, B] tile
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, B = 256, 1024


def kernel_a(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]          # [P, B_cols=128] table columns
    idx = idx_ref[:, :]          # [8, B]
    # gather row idx[k, j] for each lane
    out = jnp.take_along_axis(
        jnp.broadcast_to(tab[:, 0:1], (P, B)), idx[0:1] % P, axis=0)
    out_ref[:, :] = jnp.broadcast_to(out, (8, B))


def kernel_b(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:, :]          # [8, B] one tile
    idx = idx_ref[:, :] % 8      # [8, B]
    out = jnp.take_along_axis(tab, idx[0:1], axis=0)
    out_ref[:, :] = jnp.broadcast_to(out, (8, B))


def try_one(name, kernel, tab_shape):
    tab = jnp.asarray(np.random.rand(*tab_shape).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, P, (8, B)).astype(np.int32))
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        )
        lowered = jax.jit(fn).lower(tab, idx)
        compiled = lowered.compile()
        out = compiled(tab, idx)
        np.asarray(out[0, 0])
        print(f"{name}: OK")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL — {str(e)[:300]}")


if __name__ == "__main__":
    try_one("A naive [P,B] take_along_axis", kernel_a, (P, B))
    try_one("B within-tile [8,B] take_along_axis", kernel_b, (8, B))
