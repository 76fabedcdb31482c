from bvh_tpu.traverse.wavefront import (
    Hit,
    TraversalStats,
    intersect_tris,
    traverse,
    make_tri_leaf_fn,
    make_sphere_leaf_fn,
)
from bvh_tpu.traverse.refit import refit, compute_parents, leaf_of_position
from bvh_tpu.traverse.stack import required_stack_depth, max_depth
from bvh_tpu.traverse.wide import WideBvh, widen, traverse_wide, intersect_tris_wide
from bvh_tpu.traverse.pallas_kernel import pallas_intersect_tris
from bvh_tpu.traverse.pallas_sphere import pallas_intersect_spheres
from bvh_tpu.traverse.wide_treelet import (
    WideTreelets,
    build_wide_treelets,
    wide_treelet_intersect_tris,
)

__all__ = [
    "Hit",
    "TraversalStats",
    "intersect_tris",
    "traverse",
    "make_tri_leaf_fn",
    "make_sphere_leaf_fn",
    "refit",
    "compute_parents",
    "leaf_of_position",
    "required_stack_depth",
    "max_depth",
    "WideBvh",
    "widen",
    "traverse_wide",
    "intersect_tris_wide",
    "pallas_intersect_tris",
    "pallas_intersect_spheres",
    "WideTreelets",
    "build_wide_treelets",
    "wide_treelet_intersect_tris",
]
