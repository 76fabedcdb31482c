from bvh_tpu.core.types import Bvh, Index
from bvh_tpu.core.ray import Ray

__all__ = ["Bvh", "Index", "Ray"]
