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
