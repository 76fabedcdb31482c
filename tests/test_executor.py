"""Executor strategy tests (reference: executor.h)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.par.executor import ParallelExecutor, SequentialExecutor
from bvh_tpu.par.mesh import make_mesh


def test_sequential_reduce_ordered():
    ex = SequentialExecutor()
    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    out = ex.reduce(vals, lambda a, b: a + b, jnp.asarray(0.0))
    assert float(out) == 10.0


def test_sequential_for_each():
    ex = SequentialExecutor()
    out = ex.for_each(5, lambda carry, i: carry + i, jnp.asarray(0))
    assert int(out) == 10


def test_parallel_for_each():
    ex = ParallelExecutor()
    out = ex.for_each(8, lambda i: i * i)
    assert list(np.asarray(out)) == [i * i for i in range(8)]


@pytest.mark.slow
def test_parallel_reduce_mesh():
    ex = ParallelExecutor(make_mesh(8))
    vals = jnp.arange(64, dtype=jnp.float32)
    out = ex.reduce(vals, jnp.add, jnp.asarray(0.0, jnp.float32))
    assert float(out) == float(np.arange(64).sum())


@pytest.mark.parametrize("n", [1, 2, 7, 64, 129])
def test_parallel_reduce_odd_sizes(n):
    ex = ParallelExecutor()
    vals = jnp.arange(n, dtype=jnp.float32) + 1.0
    out = ex.reduce(vals, jnp.add, jnp.asarray(0.0, jnp.float32))
    assert float(out) == n * (n + 1) / 2


def test_parallel_reduce_pytree_bbox():
    """The consumer pattern: build_minitree's scene-bounds reduce
    (reference: mini_tree_builder.h:161-167)."""
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(-5, 5, (201, 3)).astype(np.float32))
    ex = ParallelExecutor()
    big = jnp.asarray(np.finfo(np.float32).max)
    mn, mx = ex.reduce(
        (c, c),
        lambda a, b: (jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])),
        (jnp.full((3,), big), jnp.full((3,), -big)),
    )
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(c).min(0))
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(c).max(0))


def test_minitree_consumes_executor():
    """build_minitree(executor=...) produces identical trees under
    either strategy (min/max joins are order-independent)."""
    from bvh_tpu.build.minitree import build_minitree

    rng = np.random.default_rng(4)
    cc = rng.uniform(0, 10, (300, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (300, 3)).astype(np.float32)
    mn, mx = jnp.asarray(cc - h), jnp.asarray(cc + h)
    cc = jnp.asarray(cc)
    a = build_minitree(mn, mx, cc, executor=SequentialExecutor())
    b = build_minitree(mn, mx, cc, executor=ParallelExecutor())
    nc = int(a.node_count)
    assert nc == int(b.node_count)
    np.testing.assert_array_equal(np.asarray(a.bounds)[:nc],
                                  np.asarray(b.bounds)[:nc])
    np.testing.assert_array_equal(np.asarray(a.index)[:nc],
                                  np.asarray(b.index)[:nc])
    np.testing.assert_array_equal(np.asarray(a.prim_ids),
                                  np.asarray(b.prim_ids))
