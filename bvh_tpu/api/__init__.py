from bvh_tpu.api.flat import FlatApi, bvh2f, bvh3f, bvh2d, bvh3d

__all__ = ["FlatApi", "bvh2f", "bvh3f", "bvh2d", "bvh3d"]
