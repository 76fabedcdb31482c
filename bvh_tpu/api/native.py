"""ctypes bindings for the native C runtime (native/libbvh_c.so).

The shared library implements the reference's C API surface
(reference: src/bvh/v2/c_api/bvh.h) over the same v2 byte format, so a
BVH built natively can be saved and loaded by the JAX side and vice
versa. Build it with:

    g++ -std=c++20 -O2 -fPIC -shared native/bvh_c.cpp -o native/libbvh_c.so

This module wraps the float/3D surface (bvh3f) for tests and host-side
tooling; the .so exports all four (scalar, dim) monomorphizations for C
consumers.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libbvh_c.so"),
    "libbvh_c.so",
]


class BuildConfigC(ctypes.Structure):
    _fields_ = [
        ("quality", ctypes.c_int),
        ("min_leaf_size", ctypes.c_size_t),
        ("max_leaf_size", ctypes.c_size_t),
        ("parallel_threshold", ctypes.c_size_t),
    ]


CALLBACK3F = ctypes.CFUNCTYPE(
    ctypes.c_bool, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
    ctypes.c_size_t, ctypes.c_size_t,
)


class Callback3f(ctypes.Structure):
    _fields_ = [("user_data", ctypes.c_void_p), ("user_fn", CALLBACK3F)]


def load_library():
    last = None
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(path) if os.path.sep in path else path)
            break
        except OSError as e:  # pragma: no cover
            last = e
            lib = None
    if lib is None:  # pragma: no cover
        raise OSError(f"libbvh_c.so not found: {last}")

    lib.bvh_thread_pool_create.restype = ctypes.c_void_p
    lib.bvh_thread_pool_create.argtypes = [ctypes.c_size_t]
    lib.bvh_thread_pool_destroy.argtypes = [ctypes.c_void_p]

    lib.bvh3f_build.restype = ctypes.c_void_p
    lib.bvh3f_build.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(BuildConfigC),
    ]
    lib.bvh3f_destroy.argtypes = [ctypes.c_void_p]
    lib.bvh3f_get_node_count.restype = ctypes.c_size_t
    lib.bvh3f_get_node_count.argtypes = [ctypes.c_void_p]
    lib.bvh3f_get_prim_count.restype = ctypes.c_size_t
    lib.bvh3f_get_prim_count.argtypes = [ctypes.c_void_p]
    lib.bvh3f_get_prim_id.restype = ctypes.c_size_t
    lib.bvh3f_get_prim_id.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.bvh3f_refit.argtypes = [ctypes.c_void_p]
    lib.bvh3f_optimize.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.bvh3f_intersect_ray.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(Callback3f)]
    lib.bvh3f_intersect_ray_robust.argtypes = lib.bvh3f_intersect_ray.argtypes
    lib.bvh3f_intersect_ray_any.argtypes = lib.bvh3f_intersect_ray.argtypes
    lib.bvh3f_intersect_ray_any_robust.argtypes = lib.bvh3f_intersect_ray.argtypes
    return lib


class NativeBvh3f:
    """Minimal RAII wrapper over the bvh3f_* surface."""

    def __init__(self, lib=None):
        self.lib = lib or load_library()

    def build(self, bb_min, bb_max, centers, quality=2, threads=0):
        bb_min = np.ascontiguousarray(bb_min, np.float32)
        bb_max = np.ascontiguousarray(bb_max, np.float32)
        centers = np.ascontiguousarray(centers, np.float32)
        boxes = np.empty((len(centers), 6), np.float32)
        boxes[:, 0:3] = bb_min
        boxes[:, 3:6] = bb_max
        cfg = BuildConfigC(quality, 1, 8, 1024)
        pool = self.lib.bvh_thread_pool_create(threads) if threads else None
        handle = self.lib.bvh3f_build(
            pool, boxes.ctypes.data_as(ctypes.c_void_p),
            centers.ctypes.data_as(ctypes.c_void_p), len(centers),
            ctypes.byref(cfg),
        )
        if pool:
            self.lib.bvh_thread_pool_destroy(pool)
        return handle

    def save(self, handle, path):
        libc = ctypes.CDLL(None)
        libc.fopen.restype = ctypes.c_void_p
        f = libc.fopen(path.encode(), b"wb")
        self.lib.bvh3f_save.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        self.lib.bvh3f_save(handle, f)
        libc.fclose.argtypes = [ctypes.c_void_p]
        libc.fclose(f)

    def load(self, path):
        libc = ctypes.CDLL(None)
        libc.fopen.restype = ctypes.c_void_p
        f = libc.fopen(path.encode(), b"rb")
        self.lib.bvh3f_load.restype = ctypes.c_void_p
        self.lib.bvh3f_load.argtypes = [ctypes.c_void_p]
        h = self.lib.bvh3f_load(f)
        libc.fclose.argtypes = [ctypes.c_void_p]
        libc.fclose(f)
        return h

    def destroy(self, handle):
        self.lib.bvh3f_destroy(handle)

    def node_count(self, handle):
        return self.lib.bvh3f_get_node_count(handle)

    def prim_ids(self, handle):
        n = self.lib.bvh3f_get_prim_count(handle)
        return np.asarray([self.lib.bvh3f_get_prim_id(handle, i) for i in range(n)])

    def intersect_closest(self, handle, org, dir, tris, robust=True):
        """Closest-hit against precomputed triangle data permuted by this
        BVH's prim positions; returns (prim_pos, t) or (-1, inf)."""
        state = {"prim": -1, "t": np.inf}
        prim_ids = self.prim_ids(handle)

        def tri_hit(p0, e1, e2, nrm, o, d, tmin, tmax):
            c = p0 - o
            r = np.cross(d, c)
            det = float(np.dot(nrm, d))
            if det == 0:
                return None
            inv = 1.0 / det
            u = float(np.dot(r, e2)) * inv
            v = float(np.dot(r, e1)) * inv
            w = 1.0 - u - v
            eps = -np.finfo(np.float32).eps
            if u >= eps and v >= eps and w >= eps:
                t = float(np.dot(nrm, c)) * inv
                if tmin <= t <= tmax:
                    return t
            return None

        @CALLBACK3F
        def cb(_user, ray_ptr, begin, end):
            ray = np.ctypeslib.as_array(ray_ptr, shape=(8,))
            hit_any = False
            for i in range(begin, end):
                tri = tris[prim_ids[i]]
                t = tri_hit(tri[0], tri[0] - tri[1], tri[2] - tri[0],
                            np.cross(tri[0] - tri[1], tri[2] - tri[0]),
                            ray[0:3], ray[3:6], ray[6], ray[7])
                if t is not None:
                    state["prim"] = i
                    state["t"] = t
                    ray[7] = t
                    hit_any = True
            return hit_any

        ray = np.asarray([*org, *dir, 0.0, np.finfo(np.float32).max], np.float32)
        callback = Callback3f(None, cb)
        fn = (self.lib.bvh3f_intersect_ray_robust if robust
              else self.lib.bvh3f_intersect_ray)
        fn(handle, ray.ctypes.data_as(ctypes.c_void_p), ctypes.byref(callback))
        return state["prim"], state["t"]
