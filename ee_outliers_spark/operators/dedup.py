"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (ee-outliers never dedups) — added as first-class engine
operators per the build brief. All are shuffle-conscious:

- ``exact_dedup``      — hash-groupBy on a content digest; one shuffle on the
                         digest (no skew: digests are uniform).
- ``ngram_jaccard_pairs`` — exact n-gram (token shingle) Jaccard: pairs are
                         generated ONLY for docs sharing a shingle (inverted
                         index on shingles — never all-pairs), then scored
                         exactly. Head shingles are capped (stop-shingle
                         removal) to defuse the quadratic blowup, the same
                         trick as head-term skew in the text index.
- ``minhash_lsh_pairs``— MinHash signatures (num_perm seeded xxhash64 mins,
                         all JVM-side) → LSH banding → bucket self-join →
                         candidate pairs with estimated Jaccard. The scale
                         path: candidate generation cost is bands×docs.
- ``simhash``          — 64-bit SimHash fingerprint per doc (Arrow pandas
                         UDF over the token array; md5-derived token hashes
                         so the fingerprint is platform-stable).
- ``embedding_neardup_pairs`` — cosine near-duplicates over an embedding
                         column, bucketed by a partition key to avoid
                         all-pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..tokenizer import tokens_col


# --- exact dedup --------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """One representative (min id) per exact content digest.
    Returns (digest, rep_id, n_dupes)."""
    return (
        df.select(
            F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("digest"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("digest")
        .agg(
            F.min("_id").alias("rep_id"),
            F.count("*").cast("long").alias("n_dupes"),
        )
    )


# --- token shingles (shared by jaccard + minhash) ------------------------------

def shingles_col(text_col: str, k: int):
    """Array of token k-grams joined by a single space — JVM-side HOFs."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    return F.when(F.size(toks) >= k, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct token k-grams, computed via a shingle
    inverted index (docs sharing no shingle are never paired).

    ``max_shingle_df`` drops head shingles appearing in more docs than the cap
    *from pair generation only* (exactness of the Jaccard denominator is kept
    via per-doc shingle counts). Pass None to disable (exactness of recall
    guaranteed, quadratic risk accepted — fine under the threshold≥0.5 regime
    where near-dup docs share rare shingles too).
    """
    sh = df.select(
        F.col(id_col).alias("_id"), shingles_col(text_col, k).alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sh.select("_id", F.size("sh").alias("n"))
    inv = sh.select("_id", F.explode("sh").alias("g"))
    if max_shingle_df is not None:
        good = inv.groupBy("g").agg(F.count("*").alias("df_")).where(
            F.col("df_") <= max_shingle_df
        )
        inv = inv.join(good.select("g"), "g")
    a = inv.alias("a")
    b = inv.alias("b")
    shared = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .agg(F.count("*").cast("long").alias("shared"))
    )
    sa = sizes.select(F.col("_id").alias("id1"), F.col("n").alias("n1"))
    sb = sizes.select(F.col("_id").alias("id2"), F.col("n").alias("n2"))
    out = (
        shared.join(sa, "id1")
        .join(sb, "id2")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id1", "id2", "jaccard")


# --- MinHash + LSH --------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_perm: int = 64
) -> DataFrame:
    """(id, sig array<long>) — per permutation i, min over shingles of
    xxhash64(shingle, seed=i). Entirely JVM-side: explode + 64 min-aggs with
    map-side partial aggregation (one shuffle, vocabulary-free)."""
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles_col(text_col, k)).alias("g")
    )
    mins = sh.groupBy("_id").agg(
        *[F.min(F.xxhash64(F.col("g"), F.lit(i))).alias(f"h{i}") for i in range(num_perm)]
    )
    return mins.select(
        F.col("_id").alias(id_col),
        F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via LSH banding + estimated Jaccard from signature
    agreement. (id1, id2, est_jaccard). Scale: the self-join key is
    (band, band-hash) — collisions only for near-dups, so the join output is
    ~linear in true near-dup pairs."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_perm)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.element_at("sig", b * rows + r + 1).cast("string")
                           for r in range(rows)]
                ),
                F.lit(1000 + b),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        F.col(id_col).alias("_id"), F.col("sig"),
        F.posexplode(band_arr).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a.sig").alias("sig1"),
            F.col("b.sig").alias("sig2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig1", "sig2", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(num_perm))
    return cand.select("id1", "id2", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )


# --- SimHash ---------------------------------------------------------------------

def _simhash_tokens(tokens: list[str] | np.ndarray) -> int:
    """64-bit SimHash with md5-derived token hashes (platform-stable)."""
    votes = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        bits = (np.uint64(h) >> shifts) & np.uint64(1)
        votes += np.where(bits == 1, 1, -1)
    fp = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return fp - (1 << 64) if fp >= (1 << 63) else fp  # two's-complement int64


@F.pandas_udf(LongType())
def _simhash_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(lambda ts: _simhash_tokens(ts if ts is not None else []))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long). Narrow map — Arrow batches, no shuffle."""
    return df.select(
        F.col(id_col),
        _simhash_udf(tokens_col(text_col)).alias("simhash"),
    )


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ d, using 4×16-bit chunk
    banding (pigeonhole: distance ≤3 ⇒ some 16-bit chunk equal) — the
    standard scalable SimHash join, never all-pairs."""
    fps = simhash(df, id_col, text_col).select(
        F.col(id_col).alias("_id"), "simhash"
    )
    chunks = fps.select(
        "_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                for c in range(4)
            ])
        ).alias("chunk_no", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_no") == F.col("b.chunk_no"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id1"), F.col("b._id").alias("id2"),
            F.col("a.simhash").alias("f1"), F.col("b.simhash").alias("f2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    ham = F.bit_count(F.col("f1").bitwiseXOR(F.col("f2")))
    return cand.select("id1", "id2", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# --- embedding near-dup ------------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine ≥ τ pairs within buckets (e.g. a cluster/label/LSH bucket).
    (id1, id2, cosine). Bucketing keeps the self-join from going all-pairs."""
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(bucket_col).alias("_b"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    norm = F.sqrt(F.aggregate("_v", F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("_n", norm).where(F.col("_n") > 0)
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(
        b, (F.col("a._b") == F.col("b._b")) & (F.col("a._id") < F.col("b._id"))
    ).select(
        F.col("a._id").alias("id1"),
        F.col("b._id").alias("id2"),
        (dot / (F.col("a._n") * F.col("b._n"))).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)
