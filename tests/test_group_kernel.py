"""Group-kernel mini-tree build: bit-identical to build_minitree.

The fast path (build/minitree_fast.py) must reproduce the
level-synchronous `build_minitree` exactly — same grouping, same split
decisions (reference: binned_sah_builder.h:82-156), same pruning cut
and splice order (mini_tree_builder.h:207-310) — so equality of the
full node/prim arrays is the oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
from bvh_tpu.build.minitree_fast import build_minitree_fast


def random_scene(n, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        k = max(1, n // 64)
        cent = rng.uniform(0, 100, (k, 3))
        c = cent[rng.integers(0, k, n)] + rng.normal(0, 1.0, (n, 3))
        c = c.astype(np.float32)
    else:
        c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 2.0, (n, 3))
    mn = (c - h).astype(np.float32)
    mx = (c + h).astype(np.float32)
    cc = ((mn + mx) * 0.5).astype(np.float32)
    return mn, mx, cc


def assert_bvh_equal(a, b):
    nc = int(a.node_count)
    assert nc == int(b.node_count)
    assert int(a.prim_count) == int(b.prim_count)
    np.testing.assert_array_equal(np.asarray(a.bounds)[:nc],
                                  np.asarray(b.bounds)[:nc])
    np.testing.assert_array_equal(np.asarray(a.index)[:nc],
                                  np.asarray(b.index)[:nc])
    np.testing.assert_array_equal(np.asarray(a.prim_ids),
                                  np.asarray(b.prim_ids))


@pytest.mark.parametrize("n,seed,clustered", [
    # One mid-size case stays in the default tier so local runs keep a
    # multi-block/pruning parity signal (advisor r2); the larger sizes
    # are slow-tier.
    (200, 0, True),
    pytest.param(500, 0, False, marks=pytest.mark.slow),
    pytest.param(3000, 1, False, marks=pytest.mark.slow),
    pytest.param(3000, 2, True, marks=pytest.mark.slow),
    pytest.param(8000, 3, False, marks=pytest.mark.slow),
])
def test_fast_matches_minitree(n, seed, clustered):
    mn, mx, cc = random_scene(n, seed, clustered)
    ref = build_minitree(jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc))
    fast = build_minitree_fast(mn, mx, cc, interpret=True)
    assert_bvh_equal(ref, fast)


@pytest.mark.slow
def test_fast_matches_minitree_no_pruning():
    mn, mx, cc = random_scene(2000, 4)
    cfg = MiniTreeConfig(enable_pruning=False)
    ref = build_minitree(jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc),
                         cfg)
    fast = build_minitree_fast(mn, mx, cc, cfg, interpret=True)
    assert_bvh_equal(ref, fast)


def test_fast_small_group_sizes():
    """Groups of size 1 and min_leaf-sized roots splice correctly."""
    mn, mx, cc = random_scene(40, 7)
    ref = build_minitree(jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc))
    fast = build_minitree_fast(mn, mx, cc, interpret=True)
    assert_bvh_equal(ref, fast)
