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
