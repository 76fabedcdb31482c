"""bvh_tpu — a TPU-native BVH construction and ray-traversal framework.

This package re-implements the capabilities of the C++ `bvh` library (v2,
madmann91/bvh) as an idiomatic JAX/XLA/Pallas framework:

- Structure-of-arrays geometry math (`bvh_tpu.core`, `bvh_tpu.geom`)
- Packed-index BVH arrays matching the v2 bit layout (`bvh_tpu.core.types`)
- Level-synchronous SAH builders: binned, sweep, mini-tree
  (`bvh_tpu.build`), plus a parallel reinsertion optimizer
- Wavefront ray traversal: closest/any hit × fast/robust slab tests
  (`bvh_tpu.traverse`), with Pallas kernels on the hot path
- Bit-exact v2 serialization interoperable with the C++ reference
  (`bvh_tpu.io.serialize`)
- Multi-chip scaling via `jax.sharding` meshes (`bvh_tpu.par`)
- A flat, C-API-shaped functional surface (`bvh_tpu.api`)

Reference parity notes cite files in the C++ reference as `file:line`.
"""

__version__ = "0.1.0"

from bvh_tpu.core.types import Bvh, Index  # noqa: F401
from bvh_tpu.core.ray import Ray  # noqa: F401
