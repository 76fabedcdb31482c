"""Shared test helpers: BVH structural invariants and scene setup."""

import jax.numpy as jnp
import numpy as np

from bvh_tpu.core.types import Index
from bvh_tpu.geom.tri import PrecomputedTri, Tri


def tris_from_array(tri_array):
    """[n, 3, 3] numpy vertices -> Tri of jnp arrays."""
    t = jnp.asarray(tri_array)
    return Tri(t[:, 0], t[:, 1], t[:, 2])


def scene_arrays(tri_array):
    """Returns (bb_min, bb_max, centers, tri_flat) for a [n,3,3] array."""
    tri = tris_from_array(tri_array)
    mn, mx = tri.get_bbox()
    centers = tri.get_center()
    flat = PrecomputedTri.from_tri(tri).as_flat()
    return mn, mx, centers, flat


def check_bvh_invariants(bvh, n_prims):
    """Structural validity of a built BVH:
    - prim_ids is a permutation of [0, n)
    - every leaf range is within bounds; leaves tile [0, n) exactly
    - inner child bounds are contained in the parent bounds
    - child pairs are allocated consecutively with left child odd
    """
    nc = int(bvh.node_count)
    index = np.asarray(bvh.index[:nc])
    bounds = np.asarray(bvh.bounds[:nc])
    prim_ids = np.asarray(bvh.prim_ids[: int(bvh.prim_count)])

    assert sorted(prim_ids.tolist()) == list(range(n_prims))

    first = index >> 4
    count = index & 15
    covered = np.zeros(n_prims, np.int32)
    for i in range(nc):
        if count[i] != 0:  # leaf
            assert first[i] + count[i] <= n_prims
            covered[first[i] : first[i] + count[i]] += 1
        else:  # inner
            ci = int(first[i])
            assert 0 < ci and ci + 1 < nc
            assert ci % 2 == 1, "left child must be at an odd index (bvh.h:34)"
            for c in (ci, ci + 1):
                pm = bounds[i].reshape(-1, 2)
                cm = bounds[c].reshape(-1, 2)
                assert np.all(cm[:, 0] >= pm[:, 0] - 1e-6), (i, c)
                assert np.all(cm[:, 1] <= pm[:, 1] + 1e-6), (i, c)
    assert np.all(covered == 1), "leaves must tile the primitive range exactly"
