"""Unit tests for core scalar/bit utilities, index codec and bbox math."""

import jax.numpy as jnp
import numpy as np

from bvh_tpu.core import bbox as bbox_ops
from bvh_tpu.core import utils
from bvh_tpu.core.types import Index, make_node_bounds_row, node_capacity_for


def test_robust_min_max_nan():
    nan = jnp.float32(jnp.nan)
    # NaN in the first argument returns the second (utils.h:40-43).
    assert utils.robust_min(nan, jnp.float32(2.0)) == 2.0
    assert utils.robust_max(nan, jnp.float32(2.0)) == 2.0
    assert utils.robust_min(jnp.float32(1.0), jnp.float32(2.0)) == 1.0
    assert utils.robust_max(jnp.float32(3.0), jnp.float32(2.0)) == 3.0


def test_add_ulp_magnitude():
    x = jnp.float32(1.0)
    y = utils.add_ulp_magnitude(x, 2)
    xi = np.asarray(x).view(np.uint32)
    yi = np.asarray(y).view(np.uint32)
    assert yi - xi == 2
    inf = jnp.float32(jnp.inf)
    assert utils.add_ulp_magnitude(inf, 2) == inf


def test_safe_inverse():
    assert np.isclose(float(utils.safe_inverse(jnp.float32(2.0))), 0.5)
    big = np.finfo(np.float32).max
    assert float(utils.safe_inverse(jnp.float32(0.0))) == big
    assert float(utils.safe_inverse(jnp.float32(-0.0))) == -big
    tiny = np.float32(1e-8)
    assert float(utils.safe_inverse(jnp.float32(tiny))) == big


def test_split_bits_reference_example():
    # split_bits(0b00110010) == 0b000000001001000000001000 (utils.h:102).
    x = jnp.asarray(0b00110010, jnp.uint32)
    assert int(utils.split_bits(x, 3)) == 0b000000001001000000001000


def test_morton_encode_3d():
    coords = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 3, 3]], jnp.uint32)
    codes = utils.morton_encode(coords)
    assert list(np.asarray(codes)) == [1, 2, 4, 0b111111]


def test_morton_encode_2d():
    coords = jnp.asarray([[1, 0], [0, 1], [3, 3]], jnp.uint32)
    codes = utils.morton_encode(coords)
    assert list(np.asarray(codes)) == [1, 2, 0b1111]


def test_index_codec_roundtrip():
    for first, count in [(0, 1), (5, 15), (123456, 0), (7, 3)]:
        word = (
            Index.make_leaf(first, count)
            if count
            else Index.make_inner(first)
        )
        assert int(Index.first_id(word)) == first
        assert int(Index.prim_count(word)) == count
        assert bool(Index.is_leaf(word)) == (count != 0)


def test_index_codec_uint64():
    word = Index.make_leaf(jnp.asarray(2**40, jnp.uint64), 7, jnp.uint64)
    assert int(Index.first_id(word)) == 2**40
    assert int(Index.prim_count(word)) == 7


def test_half_area_3d():
    mn = jnp.asarray([[0.0, 0.0, 0.0]])
    mx = jnp.asarray([[2.0, 3.0, 4.0]])
    # (dx+dy)*dz + dx*dy = 5*4 + 6 = 26 (bbox.h:32-38).
    assert float(bbox_ops.get_half_area(mn, mx)[0]) == 26.0


def test_half_area_2d():
    mn = jnp.asarray([[0.0, 0.0]])
    mx = jnp.asarray([[2.0, 3.0]])
    assert float(bbox_ops.get_half_area(mn, mx)[0]) == 5.0


def test_bounds_row_interleaving():
    mn = jnp.asarray([1.0, 2.0, 3.0])
    mx = jnp.asarray([4.0, 5.0, 6.0])
    row = make_node_bounds_row(mn, mx)
    # [min_x, max_x, min_y, max_y, min_z, max_z] (node.h:31-34).
    assert list(np.asarray(row)) == [1.0, 4.0, 2.0, 5.0, 3.0, 6.0]


def test_node_capacity():
    assert node_capacity_for(1) == 1
    assert node_capacity_for(2) == 3
    assert node_capacity_for(36) == 71


def test_scatter_max():
    from bvh_tpu.core.utils import scatter_max

    target = jnp.asarray([1.0, 5.0, 2.0])
    out = scatter_max(target, jnp.asarray([0, 0, 2]), jnp.asarray([3.0, 2.0, 1.0]))
    assert list(np.asarray(out)) == [3.0, 5.0, 2.0]
