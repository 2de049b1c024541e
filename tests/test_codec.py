"""Varint/delta codec roundtrips — property-based over seeded random
sorted id lists, including gaps > 2^28 and values near 2^63
(FIXTURES.md §4)."""

import numpy as np

from mysql2es_spark.functions.codec import (
    decode_doc_ids,
    decode_varints,
    encode_doc_ids,
    encode_varints,
)


def test_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").shape == (0,)
    assert decode_doc_ids(encode_doc_ids(np.array([], dtype=np.uint64))).shape == (0,)


def test_small_values():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384], dtype=np.uint64)
    assert (decode_varints(encode_varints(vals)) == vals).all()


def test_single_byte_encoding_boundary():
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"


def test_property_roundtrip_varints():
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 5000))
        # mix of magnitudes, up to ~2^62
        bits = rng.integers(1, 63, size=n)
        vals = (rng.random(n) * (2.0 ** bits)).astype(np.uint64)
        out = decode_varints(encode_varints(vals))
        assert (out == vals).all(), f"trial {trial}"


def test_property_roundtrip_doc_ids_sorted_with_big_gaps():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 3000))
        gaps = rng.integers(1, 2**28, size=n).astype(np.uint64)
        # sprinkle giant gaps (> 2^28)
        gaps[rng.integers(0, n, size=max(1, n // 100))] = np.uint64(2**35)
        ids = np.cumsum(gaps, dtype=np.uint64)
        out = decode_doc_ids(encode_doc_ids(ids))
        assert (out == ids).all(), f"trial {trial}"
