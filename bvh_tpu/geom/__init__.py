from bvh_tpu.geom.tri import PrecomputedTri, Tri
from bvh_tpu.geom.sphere import Sphere

__all__ = ["Tri", "PrecomputedTri", "Sphere"]
