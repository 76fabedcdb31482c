"""Canonical end-to-end usage, mirroring the reference's simple_example
(reference: test/simple_example.cpp): build a BVH over two triangles
with the default (high-quality) builder, permute the primitive data,
trace one closest-hit ray, print the hit, and exit 1 if it is missed.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from bvh_tpu.api.flat import BuildConfig, bvh3f
from bvh_tpu.core.ray import Ray
from bvh_tpu.geom.tri import PrecomputedTri, Tri
from bvh_tpu.traverse.wavefront import make_tri_leaf_fn


def main():
    tri = Tri(
        jnp.asarray([[1.0, -1.0, 1.0], [1.0, -1.0, 1.0]], jnp.float32),
        jnp.asarray([[1.0, 1.0, 1.0], [-1.0, -1.0, 1.0]], jnp.float32),
        jnp.asarray([[-1.0, 1.0, 1.0], [-1.0, 1.0, 1.0]], jnp.float32),
    )
    bb_min, bb_max = tri.get_bbox()
    bvh = bvh3f.build(bb_min, bb_max, tri.get_center(), BuildConfig())

    # Permuting the primitive data removes the traversal indirection
    # (reference: simple_example.cpp:54-64).
    perm = jnp.asarray(np.asarray(bvh.prim_ids).astype(np.int64))
    flat = PrecomputedTri.from_tri(tri).as_flat()[perm]
    leaf_fn = make_tri_leaf_fn(bvh, flat, permuted=True)

    rays = Ray.make(
        jnp.zeros((1, 3), jnp.float32),
        jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        tmin=0.0,
        tmax=100.0,
    )
    hit = bvh3f.intersect_ray_robust(bvh, rays, leaf_fn)
    if not bool(hit.hit[0]):
        print("No intersection found")
        return 1
    print(
        f"Hit primitive {int(hit.prim_id[0])} at distance {float(hit.t[0]):.6f} "
        f"(u={float(hit.u[0]):.4f}, v={float(hit.v[0]):.4f})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
