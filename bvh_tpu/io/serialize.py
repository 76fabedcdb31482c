"""Bit-exact BVH (de)serialization in the C++ v2 format.

Byte layout (reference: bvh.h:220-242, node.h:90-102, stream.h:10-32):

    [node_count : IndexType]
    [prim_count : IndexType]
    node_count times:
        [bounds : 2*dim scalars, interleaved min_x, max_x, ...]
        [index  : IndexType packed word]
    prim_count times:
        [prim_id : IndexType]

All values are raw native-endian bytes (the reference memcpy's scalars
through its stream interface; x86/ARM/TPU hosts are little-endian).
IndexType defaults to the node's index type: uint32 for float32 BVHs,
uint64 for float64 (reference: node.h:21, bvh.h:84-88).

Files written here round-trip bit-for-bit with files written by the C++
reference. This doubles as the checkpoint/resume subsystem
(SURVEY.md section 5.4).
"""

from __future__ import annotations

import io as _io

import jax.numpy as jnp
import numpy as np

from bvh_tpu.core.types import Bvh, index_dtype_for

_SCALAR_FOR_INDEX = {
    np.dtype(np.uint32): np.float32,
    np.dtype(np.uint64): np.float64,
}


def serialize(bvh: Bvh, stream) -> None:
    """Write `bvh` to a binary stream (reference: bvh.h:220-229)."""
    node_count = int(bvh.node_count)
    prim_count = int(bvh.prim_count)
    scalar = np.dtype(bvh.bounds.dtype)
    index_t = np.dtype(index_dtype_for(scalar))

    bounds = np.asarray(bvh.bounds[:node_count], scalar)
    index = np.asarray(bvh.index[:node_count], index_t)
    prim_ids = np.asarray(bvh.prim_ids[:prim_count], index_t)

    stream.write(np.asarray([node_count, prim_count], index_t).tobytes())
    # Interleave per-node payload: 2*dim scalars then the index word.
    # Build one structured buffer so the write is a single memcpy.
    two_dim = bounds.shape[1]
    rec = np.dtype(
        [("bounds", scalar, (two_dim,)), ("index", index_t)], align=False
    )
    packed = np.empty(node_count, rec)
    packed["bounds"] = bounds
    packed["index"] = index
    stream.write(packed.tobytes())
    stream.write(prim_ids.tobytes())


def _read_exact(stream, n: int, what: str) -> bytes:
    """Read exactly n bytes or raise EOFError (the reference's streams
    report short reads via a byte count, stream.h:12-18; here a
    truncated checkpoint is a hard, descriptive error)."""
    data = stream.read(n)
    if len(data) != n:
        raise EOFError(
            f"truncated BVH stream: expected {n} bytes for {what}, "
            f"got {len(data)}"
        )
    return data


def deserialize(stream, dim: int = 3, scalar_dtype=np.float32) -> Bvh:
    """Read a BVH from a binary stream (reference: bvh.h:231-242).

    `dim` and `scalar_dtype` select the monomorphized layout, the same
    information the C++ template parameters carry.
    """
    scalar = np.dtype(scalar_dtype)
    index_t = np.dtype(index_dtype_for(scalar))
    isz = index_t.itemsize

    header = np.frombuffer(_read_exact(stream, 2 * isz, "header"), index_t)
    node_count, prim_count = int(header[0]), int(header[1])

    two_dim = 2 * dim
    rec = np.dtype(
        [("bounds", scalar, (two_dim,)), ("index", index_t)], align=False
    )
    packed = np.frombuffer(
        _read_exact(stream, rec.itemsize * node_count, "nodes"), rec
    )
    prim_ids = np.frombuffer(
        _read_exact(stream, isz * prim_count, "prim ids"), index_t
    )

    return Bvh(
        bounds=jnp.asarray(packed["bounds"]),
        index=jnp.asarray(packed["index"]),
        prim_ids=jnp.asarray(prim_ids),
        node_count=jnp.asarray(node_count, jnp.int32),
        prim_count=jnp.asarray(prim_count, jnp.int32),
    )


def save_bvh(bvh: Bvh, path: str) -> None:
    with open(path, "wb") as f:
        serialize(bvh, f)


def load_bvh(path: str, dim: int = 3, scalar_dtype=np.float32) -> Bvh:
    with open(path, "rb") as f:
        return deserialize(f, dim=dim, scalar_dtype=scalar_dtype)


def serialize_to_bytes(bvh: Bvh) -> bytes:
    buf = _io.BytesIO()
    serialize(bvh, buf)
    return buf.getvalue()


def deserialize_from_bytes(data: bytes, dim: int = 3, scalar_dtype=np.float32) -> Bvh:
    return deserialize(_io.BytesIO(data), dim=dim, scalar_dtype=scalar_dtype)


def bvh_equal(a: Bvh, b: Bvh) -> bool:
    """Deep structural equality, the reference's test oracle
    (reference: bvh.h:30-31 defaulted operator==)."""
    na, nb = int(a.node_count), int(b.node_count)
    pa, pb = int(a.prim_count), int(b.prim_count)
    if na != nb or pa != pb:
        return False
    if not np.array_equal(np.asarray(a.bounds[:na]), np.asarray(b.bounds[:nb])):
        return False
    if not np.array_equal(np.asarray(a.index[:na]), np.asarray(b.index[:nb])):
        return False
    return np.array_equal(np.asarray(a.prim_ids[:pa]), np.asarray(b.prim_ids[:pb]))
