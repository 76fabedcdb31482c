"""Bit-exact one-hot table fetch for Pallas TPU kernels.

Per-lane dynamic gathers do not vectorize on Mosaic, so the traversal
kernels fetch table columns with a one-hot matmul: row = table @ (iota
== idx). The fetch runs every loop iteration, so its cost — which
scales with (table columns x block width x MXU passes) — dominates the
per-iteration budget of the wide-treelet kernel (measured: San-Miguel
steady render time tracks block_iters x P almost exactly, round-4
sweeps).

An f32 x f32 dot at Precision.HIGHEST costs 6 bf16 MXU passes (the
3-term operand splits, all cross products). A gather does not need a
general product: the one-hot operand is EXACTLY representable in bf16
(0.0 / 1.0), so splitting only the table into three bf16 summands

    x == hi + mid + lo,   hi = rn_bf16(x), mid = rn_bf16(x - hi),
                          lo = x - hi - mid  (exact, <= 8 bits left)

and summing three DEFAULT-precision bf16 dots reconstructs the f32
value exactly in half the passes:

- x - hi and (x - hi) - mid are exact f32 subtractions (Sterbenz: each
  remainder is within a factor 2 of the subtrahend);
- the f32 mantissa (24 bits) splits into <= 3 x 8-bit bf16 mantissas,
  so lo is exact (barring f32-subnormal remainders, |x| < ~1e-31 —
  not reachable for scene geometry);
- bf16 x {0,1} products are exact in the f32 accumulator, and the
  final hi + mid + lo sum is exact because the summands occupy
  disjoint mantissa windows of x.

Measured: 2x fetch throughput vs the HIGHEST-precision f32 dot at
identical (bit-for-bit) results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_bf16x3(table):
    """Split f32 `table` into three bf16 arrays summing to table/2
    exactly (the caller doubles the dot output, also exact).

    The half scale matters: tables use FLT_MAX as the empty-box
    sentinel (make_empty, bbox.h:40-44), and FLT_MAX overflows bf16 to
    inf, which would reconstruct as inf + (-inf) = NaN. FLT_MAX/2 is
    bf16-representable. x*0.5 and 2*x are exact for all normal f32;
    only f32 subnormals (|x| < 1.2e-38, unreachable for scene data)
    would lose their lowest bit."""
    f32 = jnp.float32
    half = table * jnp.asarray(0.5, f32)
    hi = half.astype(jnp.bfloat16)
    r = half - hi.astype(f32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(f32)).astype(jnp.bfloat16)
    return hi, mid, lo


def make_onehot_fetch_packed(table, B):
    """Return fetch(idx) over a PRE-PACKED bf16 table [rows, P] whose
    values are half-scaled (see wide_treelet.pack_kernel_table):
    one DEFAULT-precision bf16 MXU pass per fetch, output doubled
    (exact for all bf16 values: doubling only bumps the exponent).

    This is the single-pass successor of the 3x-bf16 split fetch
    below: instead of splitting f32 rows at fetch time (3 passes over
    the same columns), the table is stored already split — exact
    3-way-split rows for triangle data, byte-split rows for packed
    integer words, and conservatively-rounded single bf16 rows for
    node bounds (widening a box never loses a hit, bvh.h:124-182 —
    the leaf tests that decide results stay bit-exact)."""
    P = table.shape[1]

    def fetch(idx):
        iota = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
        oh = (iota == idx).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return d + d  # undo the half-scale (exact)

    return fetch


def make_onehot_fetch(table, B, nparts: int = 3):
    """Return fetch(idx): a bit-exact column gather of `table` [rows, P]
    at per-lane indices idx [1, B] -> [rows, B] f32.

    The bf16 split runs once (outside the traversal loop); each fetch
    costs 3 bf16 MXU passes.

    `nparts` < 3 drops split summands — INEXACT, measurement-only
    (wide_treelet._ABLATE)."""
    P = table.shape[1]
    parts = split_bf16x3(table)[:nparts]

    def fetch(idx):
        acc = None
        for p in parts:
            # regenerate the one-hot PER dot: a single one-hot consumed
            # by three dots is a multi-use value Mosaic materializes at
            # [P, B] in scoped VMEM (measured: +6 MB at 384x8192, OOM);
            # per-dot it fuses into each dot's operand stream
            iota = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
            oh = (iota == idx).astype(jnp.bfloat16)
            d = jax.lax.dot_general(
                p, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc + acc  # undo the half-scale split (exact)

    return fetch
