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

# LEB128 length thresholds: value >= _NB_THRESHOLDS[i] needs > i+1 bytes
_NB_THRESHOLDS = np.array(
    [1 << (7 * i) for i in range(1, _MAX_VARINT_BYTES)], dtype=np.uint64
)


def _varint_lengths(arr: np.ndarray) -> np.ndarray:
    """Bytes per value in ONE pass (binary search over 9 thresholds)
    instead of 9 full compare+add passes — the encoder is memory-bandwidth
    bound at 32-way parallelism, so passes over the array are the cost."""
    return np.searchsorted(_NB_THRESHOLDS, arr, side="right").astype(np.int64) + 1


def _pack_leb128(arr: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Scatter LEB128 bytes for values ``arr`` with per-value lengths ``nb``."""
    starts = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for i in range(_MAX_VARINT_BYTES):
        sel = nb > i
        if not sel.any():
            break
        if sel.all():
            # fast path: skip the mask gather (for 63-bit doc-id deltas the
            # first ~8 iterations select every element — masking would copy
            # the whole array each pass)
            byte = (arr >> np.uint64(7 * i)) & np.uint64(0x7F)
            cont = (nb > i + 1).astype(np.uint8) << 7
            out[starts + i] = byte.astype(np.uint8) | cont
        else:
            byte = (arr[sel] >> np.uint64(7 * i)) & np.uint64(0x7F)
            cont = (nb[sel] > i + 1).astype(np.uint8) << 7
            out[starts[sel] + i] = byte.astype(np.uint8) | cont
    return out


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative int64/uint64 values."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    nb = _varint_lengths(arr)
    return _pack_leb128(arr, nb).tobytes()


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


def varint_encode_groups(values: np.ndarray, group_offsets: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode many concatenated groups in ONE vectorized pass.

    ``group_offsets``: int64 array of length n_groups+1 delimiting groups in
    ``values``. Returns (buffer, byte_offsets) where byte_offsets[i] is the
    start byte of group i in the buffer (length n_groups+1).
    """
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.zeros(len(group_offsets), dtype=np.int64)
    nb = _varint_lengths(arr)
    out = _pack_leb128(arr, nb)
    byte_cum = np.concatenate(([0], np.cumsum(nb)))
    byte_offsets = byte_cum[group_offsets]
    return out.tobytes(), byte_offsets.astype(np.int64)


def delta_encode_groups(
    sorted_ids: np.ndarray, group_offsets: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Delta+varint encode many groups at once (deltas reset per group)."""
    arr = np.asarray(sorted_ids, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.zeros(len(group_offsets), dtype=np.int64)
    deltas = arr.copy()
    deltas[1:] = arr[1:] - arr[:-1]
    # empty groups have start == end (possibly == arr.size): rebasing only
    # the non-empty starts keeps the contract of the sibling varint codec
    starts = group_offsets[:-1]
    starts = starts[starts < group_offsets[1:]]
    deltas[starts] = arr[starts]
    return varint_encode_groups(deltas, group_offsets)


def delta_decode_groups(deltas: np.ndarray, group_offsets: np.ndarray) -> np.ndarray:
    """Inverse of per-group delta encoding over concatenated groups.

    ``deltas``: already varint-decoded concatenated group deltas (first
    element of each group is absolute). One global cumsum + a per-group
    rebase — no per-group Python.
    """
    if len(deltas) == 0:
        return np.empty(0, dtype=np.uint64)
    c = np.cumsum(deltas, dtype=np.uint64)
    starts = group_offsets[:-1]
    counts = np.diff(group_offsets)
    # empty groups may have start == len(deltas); their base is repeated
    # zero times, so clamp the index instead of crashing on it
    safe = np.minimum(starts, len(deltas) - 1)
    base = c[safe] - deltas[safe]
    return c - np.repeat(base, counts)


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


def gather_groups(
    values: np.ndarray, group_offsets: np.ndarray, order: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Permute concatenated variable-length groups by ``order`` without a
    per-group Python loop.

    ``values`` holds n_groups concatenated groups delimited by
    ``group_offsets`` (length n_groups+1); ``order`` is a permutation of
    group indices. Returns (reordered values, new group_offsets). Used to
    carry per-entry position lists through the entry-level lexsorts of the
    postings build (one np.repeat + one arange per call — the same
    bandwidth-bound discipline as the codecs above)."""
    lens = np.diff(group_offsets)
    new_lens = lens[order]
    total = int(group_offsets[-1])
    new_offsets = np.concatenate(([0], np.cumsum(new_lens)))
    if total == 0:
        return values[:0], new_offsets.astype(np.int64)
    begins = new_offsets[:-1]
    flat_idx = (
        np.repeat(group_offsets[:-1][order] - begins, new_lens) + np.arange(total)
    )
    return values[flat_idx], new_offsets.astype(np.int64)
