from bvh_tpu.io.serialize import serialize, deserialize, save_bvh, load_bvh
from bvh_tpu.io.obj import load_obj
from bvh_tpu.io.ppm import save_ppm

__all__ = ["serialize", "deserialize", "save_bvh", "load_bvh", "load_obj", "save_ppm"]
