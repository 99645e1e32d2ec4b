"""Varbyte + delta-gap codec roundtrip (index compression layer)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_spark.index.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_known_values():
    vals = np.array([0, 1, 127, 128, 255, 300, 2**14, 2**21 - 1, 2**40], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@given(st.lists(st.integers(min_value=0, max_value=2**55), max_size=300))
@settings(max_examples=200, deadline=None)
def test_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(a)), a)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    a = np.sort(np.array(vals, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(a)), a)


def test_postings_roundtrip():
    docs = np.sort(np.random.RandomState(7).choice(10**6, 5000, replace=False)).astype(np.uint64)
    tfs = np.random.RandomState(8).randint(1, 50, 5000).astype(np.uint64)
    d2, t2 = decode_postings(*encode_postings(docs, tfs))
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)


def test_compression_wins():
    docs = np.arange(0, 100000, 3, dtype=np.uint64)
    blob, _ = encode_postings(docs, np.ones_like(docs))
    assert len(blob) < docs.size * 2  # gaps of 3 → 1 byte each
