"""Serialization: bit-exact interop with the C++ v2 format."""

import os

import numpy as np

from bvh_tpu.io.serialize import (
    bvh_equal,
    deserialize_from_bytes,
    load_bvh,
    serialize_to_bytes,
)

from helpers import check_bvh_invariants


def test_golden_roundtrip_bit_exact(golden_dir, cornell_tris):
    """Read a BVH file written by the C++ reference, write it back, and
    require byte equality (the interop north star, BASELINE.md)."""
    path = os.path.join(golden_dir, "cornell_sweep.bvh")
    raw = open(path, "rb").read()
    bvh = load_bvh(path)
    assert int(bvh.node_count) == 37  # printed by the golden generator
    assert int(bvh.prim_count) == len(cornell_tris)
    out = serialize_to_bytes(bvh)
    assert out == raw


def test_golden_structure_valid(golden_dir, cornell_tris):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    check_bvh_invariants(bvh, len(cornell_tris))


def test_python_roundtrip_equality(golden_dir):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    again = deserialize_from_bytes(serialize_to_bytes(bvh))
    assert bvh_equal(bvh, again)


def test_golden_bounds_sane(golden_dir):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    mn, mx = bvh.root_bbox()
    # Cornell box fits in roughly [-1.02, 0]..[1.02, 2] range.
    assert np.all(np.asarray(mn) >= -1.2)
    assert np.all(np.asarray(mx) <= 2.2)


def test_golden_double_roundtrip_bit_exact(golden_dir):
    """float64 BVH written by the reference (uint64 index words) must
    round-trip byte-exact (node.h:21, bvh.h:84-88)."""
    import numpy as np

    path = os.path.join(golden_dir, "cornell_sweep_d.bvh")
    raw = open(path, "rb").read()
    bvh = load_bvh(path, dim=3, scalar_dtype=np.float64)
    assert int(bvh.node_count) == 37
    assert serialize_to_bytes(bvh) == raw


def test_golden_2d_roundtrip_bit_exact(golden_dir):
    """2D float BVH interop (dimension-parametric layout)."""
    import numpy as np

    path = os.path.join(golden_dir, "cornell_sweep_2d.bvh")
    raw = open(path, "rb").read()
    bvh = load_bvh(path, dim=2, scalar_dtype=np.float32)
    assert int(bvh.node_count) == 21
    assert bvh.dim == 2
    assert serialize_to_bytes(bvh) == raw
