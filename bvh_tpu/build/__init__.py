from bvh_tpu.build.sah import SplitHeuristic, TopDownConfig
from bvh_tpu.build.binned import build_binned

__all__ = ["SplitHeuristic", "TopDownConfig", "build_binned"]
