"""Scalar and bit utilities on jnp arrays.

TPU-native counterparts of the reference's scalar helpers
(reference: src/bvh/v2/utils.h). All functions are elementwise over
arrays (the SoA analogue of the reference's per-scalar templates) and
are shape-polymorphic, so they work both at the JAX level and inside
Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Width-matched unsigned integer types for bit-level float manipulation
# (reference: utils.h:16-25 `UnsignedIntType<Bits>`).
_UINT_FOR_FLOAT = {
    jnp.dtype(jnp.float32): jnp.uint32,
    jnp.dtype(jnp.float64): jnp.uint64,
    jnp.dtype(jnp.float16): jnp.uint16,
    jnp.dtype(jnp.bfloat16): jnp.uint16,
}


def uint_type_for(dtype) -> jnp.dtype:
    """Unsigned int type with the same bit width as the given float dtype."""
    return jnp.dtype(_UINT_FOR_FLOAT[jnp.dtype(dtype)])


def robust_min(a, b):
    """NaN-swallowing minimum: returns `b` when `a` is NaN.

    Matches `a < b ? a : b` (reference: utils.h:40-41). Note this is NOT
    jnp.minimum, which propagates NaNs from either side.
    """
    return jnp.where(a < b, a, b)


def robust_max(a, b):
    """NaN-swallowing maximum: returns `b` when `a` is NaN
    (reference: utils.h:42-43)."""
    return jnp.where(a > b, a, b)


def add_ulp_magnitude(x, ulps: int):
    """Add `ulps` units-in-the-last-place to the magnitude of ``x``.

    Non-finite values pass through unchanged. Used by the robust (Ize)
    traversal to pad the inverse ray direction
    (reference: utils.h:46-55, ray.h:45-48).
    """
    x = jnp.asarray(x)
    ui = uint_type_for(x.dtype)
    bumped = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, ui) + jnp.asarray(ulps, ui), x.dtype
    )
    return jnp.where(jnp.isfinite(x), bumped, x)


def signbit(x):
    """jnp.signbit, with a bitcast-free float64 path.

    XLA:TPU's x64-rewriting pass has no f64->s64 bitcast lowering, so
    jnp.signbit / jnp.copysign on f64 fail to compile there. The sign
    of a nonzero value comes from comparison; the sign of +-0.0 from
    the sign of 1/x (+-inf). NaN reports False (octant of a NaN
    direction is unspecified, as in the reference)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        return jnp.where(x != 0, x < 0,
                         (jnp.asarray(1.0, x.dtype) / x) < 0)
    return jnp.signbit(x)


def safe_inverse(x):
    """Inverse that never returns inf: values with |x| <= eps map to
    +-max_float with the sign of x (reference: utils.h:58-63)."""
    x = jnp.asarray(x)
    finfo = jnp.finfo(x.dtype)
    big = jnp.asarray(finfo.max, x.dtype)
    return jnp.where(
        jnp.abs(x) <= jnp.asarray(finfo.eps, x.dtype),
        jnp.where(signbit(x), -big, big),
        jnp.asarray(1.0, x.dtype) / x,
    )


def fast_mul_add(a, b, c):
    """a * b + c. XLA is free to contract this into an FMA on TPU, the same
    license the reference gives its compilers (reference: utils.h:73-81)."""
    return a * b + c


def split_bits(x, dim: int = 3):
    """Space the low bits of ``x`` with `dim - 1` zeros between them.

    Generalized Morton bit spreading (reference: utils.h:103-114 for the
    dim==3 case). ``x`` must be an unsigned integer array. For dim == 1
    this is the identity.
    """
    x = jnp.asarray(x)
    assert jnp.issubdtype(x.dtype, jnp.unsignedinteger)
    bit_count = jnp.iinfo(x.dtype).bits
    usable = bit_count // dim if dim > 1 else bit_count
    if dim == 1:
        return x
    out = jnp.zeros_like(x)
    for i in range(usable):
        out = out | ((x >> i) & jnp.asarray(1, x.dtype)) << (i * dim)
    return out


def morton_encode(coords, dim: int | None = None):
    """Morton-encode integer grid coordinates.

    ``coords``: unsigned int array of shape [..., dim]; returns [...]
    with bits interleaved x,y,z,... (x in the lowest bit), matching
    `morton_encode(x, y, z) = split(x) | split(y)<<1 | split(z)<<2`
    (reference: utils.h:117-120) and generalizing to any dim.
    """
    coords = jnp.asarray(coords)
    if dim is None:
        dim = coords.shape[-1]
    out = jnp.zeros(coords.shape[:-1], coords.dtype)
    for axis in range(dim):
        out = out | (split_bits(coords[..., axis], dim) << axis)
    return out


def scatter_max(target, indices, values):
    """Elementwise maximum-scatter: the functional counterpart of the
    reference's `atomic_max` (reference: utils.h:124-129; unused there,
    provided here for parity). Returns target with
    `target[i] = max(target[i], v)` over all (i, v) pairs — the XLA
    scatter combines duplicates, which is what the CAS loop guarantees."""
    return jnp.asarray(target).at[indices].max(values, mode="drop")


def round_up_log2(i: int) -> int:
    """Ceil(log2(i)) for Python ints (reference: utils.h:96-99)."""
    p = 0
    while (1 << p) < i:
        p += 1
    return p


def make_bitmask(bits: int) -> int:
    """Python-int bitmask with the given number of bits
    (reference: utils.h:34-37)."""
    return (1 << bits) - 1
