"""Delta + varint posting-list codec, numpy-vectorized.

Postings are stored as LEB128-style varints over delta gaps of sorted
doc_ids (and raw varints for tf values).  Both encode and decode are
vectorized: instead of a per-value Python loop, we sweep over *byte
positions* (a varint is at most 10 bytes for uint64), so the work is
O(10 numpy passes) per array regardless of length — suitable for
Arrow-batched UDFs (no per-row Python, BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10


def encode_varints(vals: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints into one byte string."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = vals.shape[0]
    if n == 0:
        return b""
    # bytes needed per value: 1 + floor(bit_length / 7) for the bits beyond 7
    nbytes = np.ones(n, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.empty(int(nbytes.sum()), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        pos = offsets[mask] + j
        chunk = (vals[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        byte = chunk.astype(np.uint8)
        byte[(nbytes[mask] - 1) > j] |= 0x80  # continuation bit
        out[pos] = byte
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string back into a uint64 array."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8)
    ends = np.nonzero((arr & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (arr[starts[mask] + j] & np.uint64(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * j)
    return vals


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta-encode a strictly-increasing doc_id array, then varint."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if doc_ids.shape[0] == 0:
        return b""
    gaps = np.empty_like(doc_ids)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    return encode_varints(gaps)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    gaps = decode_varints(buf)
    if gaps.shape[0] == 0:
        return gaps
    return np.cumsum(gaps, dtype=np.uint64)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return encode_varints(tfs)


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varints(buf)
