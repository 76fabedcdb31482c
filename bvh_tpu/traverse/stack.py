"""Traversal stack sizing utilities.

The reference offers a fixed `SmallStack<T, Capacity>` (used with
capacity 64 everywhere, reference: stack.h:10-29,
test/simple_example.cpp:66) and a heap-backed `GrowingStack`
(stack.h:33-46). Under XLA's static shapes a growing stack cannot
exist; instead, the wavefront traversal takes a static `stack_depth`
and this module computes a sufficient bound for a given tree, so
callers can size stacks exactly instead of guessing.

For the binary traversal, a ray pushes at most one entry per tree
level on its descent path, so the tree height bounds the stack; the
wide traversal pushes at most WIDTH-1 entries per wide level.
"""

from __future__ import annotations

import jax.numpy as jnp

from bvh_tpu.core.types import Bvh
from bvh_tpu.traverse.refit import node_depths

DEFAULT_STACK_DEPTH = 64  # the reference's universal choice


def max_depth(bvh: Bvh) -> jnp.ndarray:
    """Height of the tree (root depth = 0)."""
    cap = bvh.index.shape[0]
    depths = node_depths(bvh)
    valid = jnp.arange(cap) < bvh.node_count
    return jnp.max(jnp.where(valid, depths, 0))


def required_stack_depth(bvh: Bvh, wide: bool = False) -> int:
    """A sufficient per-ray stack capacity for traversing `bvh`.

    Binary: height + 1 (one far-child push per level). Wide: each wide
    level covers up to 3 binary levels but can push up to 7 entries:
    (height/3 + 1) * 7, still typically smaller state than binary x64.
    """
    h = int(max_depth(bvh))
    if wide:
        return max(8, (h // 3 + 1) * 7)
    return max(8, h + 1)
