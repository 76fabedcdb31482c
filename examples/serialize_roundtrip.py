"""Serialization round-trip, mirroring the reference's serialize test
(reference: test/serialize.cpp): build a BVH serially over two
triangles, save it, load it back, and deep-compare; exit 1 on mismatch.
The byte format is the C++ v2 format, so the file also loads in the
reference library and the native libbvh_c runtime.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import tempfile

import jax.numpy as jnp

from bvh_tpu.api.flat import BuildConfig, bvh3f
from bvh_tpu.build.default import Quality
from bvh_tpu.geom.tri import Tri
from bvh_tpu.io.serialize import bvh_equal


def main():
    tri = Tri(
        jnp.asarray([[1.0, -1.0, 1.0], [1.0, -1.0, 1.0]], jnp.float32),
        jnp.asarray([[1.0, 1.0, 1.0], [-1.0, -1.0, 1.0]], jnp.float32),
        jnp.asarray([[-1.0, 1.0, 1.0], [-1.0, 1.0, 1.0]], jnp.float32),
    )
    bb_min, bb_max = tri.get_bbox()
    bvh = bvh3f.build(bb_min, bb_max, tri.get_center(),
                      BuildConfig(quality=Quality.MEDIUM), parallel=False)
    with tempfile.NamedTemporaryFile(suffix=".bvh") as f:
        bvh3f.save(bvh, f.name)
        again = bvh3f.load(f.name)
    if not bvh_equal(bvh, again):
        print("Roundtrip mismatch")
        return 1
    print(f"Roundtrip OK: {bvh3f.get_node_count(bvh)} nodes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
