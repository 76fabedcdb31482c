from bvh_tpu.build.sah import SplitHeuristic, TopDownConfig
from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.sweep import build_sweep
from bvh_tpu.build.lbvh import LbvhConfig, build_lbvh
from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
from bvh_tpu.build.reinsertion import ReinsertionConfig, optimize_reinsertion
from bvh_tpu.build.default import DefaultConfig, Quality, build_default
from bvh_tpu.build.canonicalize import canonicalize, extract_bvh

__all__ = [
    "SplitHeuristic",
    "TopDownConfig",
    "build_binned",
    "build_sweep",
    "LbvhConfig",
    "build_lbvh",
    "MiniTreeConfig",
    "build_minitree",
    "ReinsertionConfig",
    "optimize_reinsertion",
    "DefaultConfig",
    "Quality",
    "build_default",
    "canonicalize",
    "extract_bvh",
]
