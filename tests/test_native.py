"""Native C runtime: build/save/load interop with the JAX side."""

import os
import subprocess

import numpy as np
import pytest

from bvh_tpu.api.native import NativeBvh3f, load_library
from bvh_tpu.io.serialize import load_bvh

from helpers import check_bvh_invariants, scene_arrays

LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libbvh_c.so")
SRC = os.path.join(os.path.dirname(__file__), "..", "native", "bvh_c.cpp")


@pytest.fixture(scope="module")
def native():
    if not os.path.exists(LIB):
        subprocess.check_call([
            "g++", "-std=c++20", "-O2", "-fPIC", "-shared",
            "-ffp-contract=off", SRC, "-o", LIB,
        ])
    return NativeBvh3f(load_library())


def test_native_build_and_interop(native, cornell_tris, tmp_path):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    h = native.build(np.asarray(mn), np.asarray(mx), np.asarray(centers))
    assert native.node_count(h) > 1
    path = str(tmp_path / "native.bvh")
    native.save(h, path)
    # The JAX side must read the natively-written file and see a valid tree.
    bvh = load_bvh(path)
    assert int(bvh.node_count) == native.node_count(h)
    check_bvh_invariants(bvh, len(cornell_tris))
    native.destroy(h)


def test_native_load_of_reference_golden(native, golden_dir, cornell_tris):
    """The native lib must load the byte stream written by the C++
    reference (same v2 format)."""
    h = native.load(os.path.join(golden_dir, "cornell_sweep.bvh"))
    assert native.node_count(h) == 37
    ids = native.prim_ids(h)
    assert sorted(ids.tolist()) == list(range(len(cornell_tris)))
    native.destroy(h)


def test_native_intersect_matches_golden(native, golden_dir, cornell_tris, golden_hits):
    """Native traversal over the reference's own tree must reproduce the
    oracle hits (spot-checked subset for speed: ctypes callbacks)."""
    h = native.load(os.path.join(golden_dir, "cornell_sweep.bvh"))
    eye = np.asarray([0.0, 1.0, 2.0], np.float32)
    d = np.asarray([0.0, 0.0, -1.0], np.float32)
    up0 = np.asarray([0.0, 1.0, 0.0], np.float32)
    right = np.cross(d, up0)
    right /= np.linalg.norm(right)
    up = np.cross(right, d)
    W = H = 64
    rng = np.random.default_rng(0)
    sample = rng.choice(W * H, 64, replace=False)
    for idx in sample:
        x, y = idx % W, idx // W
        u = 2.0 * x / W - 1.0
        v = 2.0 * y / H - 1.0
        ray_dir = d + u * right + v * up
        prim, t = native.intersect_closest(h, eye, ray_dir, cornell_tris)
        want = golden_hits["prim_id"][idx]
        if want == 0xFFFFFFFF:
            assert prim == -1
        else:
            assert prim != -1
            np.testing.assert_allclose(t, golden_hits["t"][idx], rtol=1e-5)
    native.destroy(h)


def test_native_optimize_reduces_area(native, cornell_tris):
    mn, mx, centers, _ = scene_arrays(cornell_tris)
    h = native.build(np.asarray(mn), np.asarray(mx), np.asarray(centers), quality=1)
    lib = native.lib
    before = native.node_count(h)
    lib.bvh3f_optimize(None, h)
    assert native.node_count(h) == before
    native.destroy(h)


def test_native_pool_minitree_build(native, tmp_path):
    """A non-NULL pool selects the parallel mini-tree pipeline
    (reference: c_api/bvh_impl.h:105-114 -> default_builder.h:33-46 ->
    mini_tree_builder.h:47-310). The tree differs from the serial sweep
    build but must be structurally valid and find the same closest hits."""
    from bvh_tpu.io.scenes import sponza_class

    tris = sponza_class(4096, seed=3)
    mn = tris.min(axis=1).astype(np.float32)
    mx = tris.max(axis=1).astype(np.float32)
    centers = tris.mean(axis=1).astype(np.float32)

    h_par = native.build(mn, mx, centers, quality=1, threads=2)
    h_ser = native.build(mn, mx, centers, quality=1)
    # parallel rebuilds are deterministic (reference sorts ids per task,
    # mini_tree_builder.h:122-124)
    h_par2 = native.build(mn, mx, centers, quality=1, threads=3)
    assert native.node_count(h_par) == native.node_count(h_par2)
    assert np.array_equal(native.prim_ids(h_par), native.prim_ids(h_par2))

    path = str(tmp_path / "pool.bvh")
    native.save(h_par, path)
    bvh = load_bvh(path)
    assert int(bvh.node_count) == native.node_count(h_par)
    check_bvh_invariants(bvh, len(tris))

    center = tris.mean(axis=(0, 1)).astype(np.float32)
    eye = center + np.asarray([0.0, 0.0, 3.0], np.float32)
    rng = np.random.default_rng(0)
    for _ in range(32):
        ray_dir = (rng.standard_normal(3)).astype(np.float32)
        p1, t1 = native.intersect_closest(h_par, eye, ray_dir, tris)
        p0, t0 = native.intersect_closest(h_ser, eye, ray_dir, tris)
        assert (p1 == -1) == (p0 == -1)
        if p0 != -1:
            np.testing.assert_allclose(t1, t0, rtol=1e-5)
    for h in (h_par, h_ser, h_par2):
        native.destroy(h)
