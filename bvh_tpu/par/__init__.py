from bvh_tpu.par.mesh import (
    make_mesh,
    shard_rays,
    intersect_tris_sharded,
    build_minitree_sharded,
)

__all__ = [
    "make_mesh",
    "shard_rays",
    "intersect_tris_sharded",
    "build_minitree_sharded",
]
