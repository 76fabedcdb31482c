"""Executor abstraction: iteration/reduction strategies.

TPU-native counterpart of `Executor` / `SequentialExecutor` /
`ParallelExecutor` (reference: src/bvh/v2/executor.h). The reference's
executors chunk index ranges over a thread pool; here "parallel" means
vectorized on one device (XLA parallelizes internally) or sharded over
a device mesh, and "sequential" means a `lax.scan` ordering guarantee.

Consumers: `build_minitree` routes its scene-centers bbox reduction
through an executor exactly where the reference's build does
(mini_tree_builder.h:161-167 calls `executor_.reduce`); passing
`SequentialExecutor()` gives the reference's serial left-fold ordering,
`ParallelExecutor()` a tree reduction (the analogue of per-thread
partials + join). min/max joins are associative and commutative, so
both orderings produce bit-identical bboxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SequentialExecutor:
    """Ordered execution (reference: executor.h:27-39): `for_each`
    applies `fn` to indices in order via `lax.scan`; `reduce` folds
    left-to-right — bit-for-bit deterministic ordering."""

    def for_each(self, n: int, fn, init):
        """fn(carry, i) -> carry, applied for i in [0, n)."""
        def step(carry, i):
            return fn(carry, i), None

        carry, _ = jax.lax.scan(step, init, jnp.arange(n))
        return carry

    def reduce(self, values, reduce_fn, init):
        """Left fold of `reduce_fn` over the leading axis of `values`."""
        def step(carry, v):
            return reduce_fn(carry, v), None

        carry, _ = jax.lax.scan(step, init, values)
        return carry


class ParallelExecutor:
    """Data-parallel execution (reference: executor.h:42-85): `for_each`
    vmaps `fn` over indices; `reduce` uses a tree reduction (the analogue
    of per-thread partials + join). With a mesh, work shards over
    devices and the join is an all-reduce over ICI."""

    def __init__(self, mesh: Mesh | None = None, axis: str | None = None):
        self.mesh = mesh
        self.axis = axis or (mesh.axis_names[0] if mesh is not None else None)

    def for_each(self, n: int, fn):
        """fn(i) -> value; returns stacked values (order-independent
        bodies, as the reference requires of parallel loops)."""
        idx = jnp.arange(n)
        if self.mesh is not None:
            idx = jax.device_put(idx, NamedSharding(self.mesh, P(self.axis)))
        return jax.vmap(fn)(idx)

    def reduce(self, values, reduce_fn, init):
        """Tree reduction over the leading axis (the analogue of
        per-thread partials + serial join, reference: executor.h:63-84).
        `values` may be a pytree of arrays sharing a leading axis;
        `reduce_fn(a, b)` joins two pytrees. O(n) work, log2(n) steps —
        the same schedule XLA lowers a monoid reduce to."""
        if self.mesh is not None:
            values = jax.tree.map(
                lambda v: jax.device_put(
                    v, NamedSharding(self.mesh, P(self.axis))
                ),
                values,
            )
        n = jax.tree.leaves(values)[0].shape[0]
        acc = init  # odd leftovers fold into the accumulator
        while n > 1:
            if n % 2:
                acc = reduce_fn(
                    acc, jax.tree.map(lambda v: v[n - 1], values)
                )
            half = n // 2
            lo = jax.tree.map(lambda v: v[:half], values)
            hi = jax.tree.map(lambda v: v[half : 2 * half], values)
            values = reduce_fn(lo, hi)
            n = half
        return reduce_fn(acc, jax.tree.map(lambda v: v[0], values))
