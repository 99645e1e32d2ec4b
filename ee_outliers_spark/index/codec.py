"""Varbyte (LEB128) + delta-gap posting-list codec, fully numpy-vectorized.

Postings are stored docID-ascending; docIDs are delta-gapped then
varbyte-encoded (the classic Lucene/SPIMI layout the north_star specifies:
"termID -> delta-gapped, varbyte-compressed docID+tf postings").

Both encode and decode are O(max_bytes) numpy passes — no per-element Python
loop — so they run fast inside Arrow pandas UDFs on million-posting lists.

Format: little-endian-7-bit LEB128, high bit 1 = continuation.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # enough for uint64


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64/int64 array (non-negative) to LEB128 bytes, also
    returning the per-value byte length. Because LEB128 is per-value
    independent, any contiguous slice of values can be recovered by slicing
    the byte stream at ``cumsum(lengths)`` offsets — the segment kernel
    encodes a WHOLE segment's postings in one vectorized pass and byte-
    slices each term's blob out (identical bytes to per-term encodes)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: 1 + #{k : v ≥ 2^(7k)} — pure comparisons, no
    # copy/shift loop (posting gaps are overwhelmingly 1-2 bytes; the old
    # copy+shift pass was ~40% of segment encode time on position streams)
    nbytes = np.ones(v.shape, dtype=np.int64)
    bound = np.uint64(1 << 7)
    for _ in range(_MAX_BYTES - 1):
        above = v >= bound
        if not above.any():
            break
        nbytes += above
        if int(bound) >= (1 << 57):  # next shift would overflow uint64
            break
        bound = np.uint64(int(bound) << 7)
    total = int(nbytes.sum())
    if total == v.size:
        # every value fits one byte (no continuation bit set): the encoded
        # stream IS the values as uint8. This is the dominant case for
        # position streams (in-doc offsets < 128) and tf/gap streams on
        # web-scale text — one astype instead of the per-byte-level passes.
        return v.astype(np.uint8).tobytes(), nbytes
    out = np.zeros(total, dtype=np.uint8)
    # position of first byte of each value
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for i in range(_MAX_BYTES):
        sel = nbytes > i  # values that have an i-th byte
        if not sel.any():
            break
        pos = starts[sel] + i
        chunk = (v[sel] >> np.uint64(7 * i)) & np.uint64(0x7F)
        # continuation bit on every byte except the value's last
        cont = (nbytes[sel] - 1 > i).astype(np.uint8) << 7
        out[pos] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64/int64 array (non-negative) to LEB128 bytes."""
    return varbyte_encode_with_lengths(values)[0]


def varbyte_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # group id of each byte, position within its group
    group_id = np.cumsum(is_end) - is_end  # 0-based group of each byte
    pos = np.arange(b.size) - starts[group_id]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly/weakly ascending ids → first value + gaps."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_position_stream(flat_positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Token positions for one posting list → varbyte blob.

    ``flat_positions`` is the concatenation, in docID order, of each doc's
    ascending token positions; ``tfs`` gives the per-doc counts (the split
    boundaries — a posting's tf IS its position count, so no extra length
    prefix is stored). Within each doc positions are delta-gapped with the
    first stored absolute (the Lucene .prx layout)."""
    flat = np.asarray(flat_positions, dtype=np.int64)
    if flat.size == 0:
        return b""
    gaps = flat.copy()
    gaps[1:] -= flat[:-1]
    starts = np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]
    gaps[starts] = flat[starts]  # doc boundaries: absolute, not cross-doc gap
    return varbyte_encode(gaps.astype(np.uint64))


def decode_position_stream(pos_blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_position_stream`.

    Returns ``(flat_absolute_positions, bounds)`` where ``bounds =
    cumsum(tfs)`` — doc *i*'s positions are ``flat[bounds[i-1]:bounds[i]]``.
    Fully vectorized: one global cumsum, then each doc's segment is re-based
    by subtracting the running total at its boundary."""
    tfs = np.asarray(tfs, dtype=np.int64)
    bounds = np.cumsum(tfs)
    flat = varbyte_decode(pos_blob).astype(np.int64)
    if flat.size == 0:
        return flat, bounds
    cs = np.cumsum(flat)
    doc_base = np.concatenate(([0], cs[bounds[:-1] - 1]))
    return cs - np.repeat(doc_base, tfs), bounds


def gather_candidate_positions(
    pos_blob: bytes, tfs: np.ndarray, block_ends: np.ndarray,
    docs: np.ndarray, cand: np.ndarray, block: int = 128,
) -> tuple[np.ndarray, np.ndarray]:
    """Positions of ``cand`` docs only, decoding ONLY the ``block``-posting
    blocks that contain them (every posting's first position is stored
    absolute, so block-aligned byte slices decode independently — the
    reason :func:`encode_position_stream` restarts at posting boundaries).

    ``docs``/``tfs`` are the full posting list's docIDs and position
    counts; ``block_ends`` the per-block byte END offsets within
    ``pos_blob`` (build-side ``block_pos_ends``); ``cand`` an ascending
    subset of ``docs``. Returns ``(vals, owner)`` — exactly the shape of
    the query layer's ragged gather: concatenated ascending positions per
    candidate plus each value's candidate index. Work is O(touched blocks),
    not O(total positions): a rare∧common phrase decodes a handful of
    blocks out of thousands."""
    tfs = np.asarray(tfs, dtype=np.int64)
    idx = np.searchsorted(docs, cand)
    if idx.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    blk = idx // block
    need = np.unique(blk)
    ends = np.asarray(block_ends, dtype=np.int64)
    n = len(tfs)
    if len(need) == len(ends):
        # every block touched — decode the whole stream in one pass
        flat, bounds = decode_position_stream(pos_blob, tfs)
        local = idx
    else:
        starts_b = np.concatenate(([0], ends[:-1]))
        seg_lens = ends[need] - starts_b[need]
        total_b = int(seg_lens.sum())
        sb = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
        byte_idx = (np.repeat(starts_b[need] - sb, seg_lens)
                    + np.arange(total_b, dtype=np.int64))
        blob = np.frombuffer(pos_blob, dtype=np.uint8)[byte_idx]
        # postings of the needed blocks (ragged tail block included)
        pb = np.minimum((need + 1) * block, n) - need * block
        post_base = np.concatenate(([0], np.cumsum(pb)))
        pidx = (np.repeat(need * block - post_base[:-1], pb)
                + np.arange(int(post_base[-1]), dtype=np.int64))
        flat, bounds = decode_position_stream(blob.tobytes(), tfs[pidx])
        r = np.searchsorted(need, blk)
        local = idx - need[r] * block + post_base[r]
    hi = bounds[local]
    cnt = tfs[idx]
    lo = hi - cnt
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    shift = np.repeat(lo - np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
    vals = flat[np.arange(total, dtype=np.int64) + shift]
    owner = np.repeat(np.arange(len(cand), dtype=np.int64), cnt)
    return vals.astype(np.int64), owner


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(docIDs ascending, term frequencies) → (varbyte(delta(docIDs)), varbyte(tfs))."""
    return varbyte_encode(delta_encode(doc_ids)), varbyte_encode(tfs)


def decode_postings(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(varbyte_decode(doc_blob)), varbyte_decode(tf_blob)
