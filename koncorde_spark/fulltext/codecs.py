"""Posting-list codecs: delta + varint, fully vectorized in numpy.

Posting lists are docID-sorted; doc IDs are delta-encoded then
varint-packed (LEB128: 7 payload bits per byte, MSB = continuation).
Term frequencies are varint-packed directly. All encode/decode paths are
numpy array operations — no per-element Python — so they run at Arrow
batch speed inside executors.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative int64/uint64 values."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    # bytes needed per value: 1 + floor(bit_length-1 / 7)
    nb = np.ones(arr.shape, dtype=np.int64)
    for i in range(1, _MAX_VARINT_BYTES):
        nb += (arr >= (np.uint64(1) << np.uint64(7 * i))).astype(np.int64)
    starts = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for i in range(_MAX_VARINT_BYTES):
        sel = nb > i
        if not sel.any():
            break
        byte = (arr[sel] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = (nb[sel] > i + 1).astype(np.uint8) << 7
        out[starts[sel] + i] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = len(ends)
    out = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    for j in range(int(lengths.max())):
        sel = lengths > j
        idx = starts[sel] + j
        out[sel] |= (b[idx] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    if count is not None and n != count:
        raise ValueError(f"varint_decode: expected {count} values, got {n}")
    return out


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta + varint encode a strictly-increasing int64 array."""
    arr = np.asarray(sorted_ids, dtype=np.uint64)
    if arr.size == 0:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Inverse of :func:`delta_encode`; returns uint64 doc IDs."""
    deltas = varint_decode(buf, count)
    return np.cumsum(deltas, dtype=np.uint64)
