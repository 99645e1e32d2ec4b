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


def test_gather_candidate_positions_matches_full_decode():
    """Block-lazy position gather (decodes only candidate blocks via
    block_pos_ends byte offsets) returns exactly the positions the full
    decode would — randomized posting lists, candidate subsets of every
    density, ragged tail blocks."""
    from ee_outliers_spark.index.codec import (
        decode_position_stream, encode_position_stream,
        gather_candidate_positions, varbyte_encode_with_lengths,
    )

    rng = np.random.RandomState(42)
    for trial in range(30):
        n = rng.randint(1, 700)
        docs = np.sort(rng.choice(10**5, n, replace=False)).astype(np.int64)
        tfs = rng.randint(1, 8, n).astype(np.int64)
        flat = np.concatenate([
            np.sort(rng.choice(5000, t, replace=False)) for t in tfs
        ]).astype(np.int64)
        blob = encode_position_stream(flat, tfs)
        # build-side block_pos_ends: byte end of each 128-posting block
        gaps = flat.copy()
        gaps[1:] -= flat[:-1]
        starts = np.cumsum(tfs)[:-1]
        gaps[starts] = flat[starts]
        _, lens = varbyte_encode_with_lengths(gaps.astype(np.uint64))
        byte_cum = np.concatenate(([0], np.cumsum(lens)))
        bounds_full = np.cumsum(tfs)
        nblk = (n + 127) // 128
        block_ends = byte_cum[
            bounds_full[np.minimum(np.arange(1, nblk + 1) * 128, n) - 1]]
        full_flat, full_bounds = decode_position_stream(blob, tfs)
        for density in (1, 3, n):
            cand = docs[::density]
            vals, owner = gather_candidate_positions(
                blob, tfs, block_ends, docs, cand)
            # reference: slice the full decode per candidate
            want_vals, want_owner = [], []
            idx = np.searchsorted(docs, cand)
            for ci, i in enumerate(idx):
                lo = 0 if i == 0 else full_bounds[i - 1]
                want_vals.append(full_flat[lo:full_bounds[i]])
                want_owner.append(np.full(int(tfs[i]), ci))
            assert np.array_equal(vals, np.concatenate(want_vals))
            assert np.array_equal(owner, np.concatenate(want_owner))


def test_assemble_segment_block_pos_ends():
    """The build kernel's block_pos_ends column: each 128-posting block's
    byte slice of pos_blob decodes independently to exactly that block's
    positions (the lazy-phrase-decode contract)."""
    import pandas as pd

    from ee_outliers_spark.index.build import segment_frame

    rng = np.random.RandomState(7)
    n_docs = 600
    doc_ids = np.arange(n_docs, dtype=np.int64) * 3
    rows = []
    for d in doc_ids:
        toks = rng.choice(["a", "b", "c", "d"], rng.randint(1, 9))
        c = {}
        pos = {}
        for i, t in enumerate(toks):
            c[t] = c.get(t, 0) + 1
            pos.setdefault(t, []).append(i)
        for t in c:
            rows.append((t, int(d), c[t], pos[t]))
    tf = pd.DataFrame(rows, columns=["term", "doc_id", "tf", "poss"]) \
        .sort_values(["term", "doc_id"], kind="stable")
    dls = tf.groupby("doc_id")["tf"].sum()
    out = segment_frame(0, doc_ids, dls.reindex(doc_ids).to_numpy(np.int64),
                        tf, 0.0)
    from ee_outliers_spark.index.codec import (
        decode_position_stream, varbyte_decode)

    checked_multi = 0
    for _, r in out[out["term"].notna()].iterrows():
        tfs = varbyte_decode(bytes(r["tf_blob"])).astype(np.int64)
        full, bounds = decode_position_stream(bytes(r["pos_blob"]), tfs)
        ends = np.asarray(r["block_pos_ends"], dtype=np.int64)
        nblk = (len(tfs) + 127) // 128
        assert len(ends) == nblk
        assert ends[-1] == len(bytes(r["pos_blob"]))
        if nblk > 1:
            checked_multi += 1
        start = 0
        for b in range(nblk):
            lo, hi = b * 128, min((b + 1) * 128, len(tfs))
            flat_b, _ = decode_position_stream(
                bytes(r["pos_blob"])[start:ends[b]], tfs[lo:hi])
            lo_f = 0 if lo == 0 else bounds[lo - 1]
            assert np.array_equal(flat_b, full[lo_f:bounds[hi - 1]])
            start = int(ends[b])
    assert checked_multi >= 3  # corpus big enough to exercise multi-block
