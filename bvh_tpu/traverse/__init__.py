from bvh_tpu.traverse.wavefront import (
    Hit,
    TraversalStats,
    intersect_tris,
    traverse,
    make_tri_leaf_fn,
)

__all__ = [
    "Hit",
    "TraversalStats",
    "intersect_tris",
    "traverse",
    "make_tri_leaf_fn",
]
