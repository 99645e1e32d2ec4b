"""Per-corpus index cache: build the SPIMI segments ONCE per (sf_dir,
format-version) and share them across every gated query in the process —
index-per-query was round 1's wrong shape (an engine whose index is rebuilt
on each query is not an index engine).

The on-disk layout is ``$TMPDIR/eos_index_cache/v{FORMAT}_{corpus-key}``;
``build_segments`` is already resumable, so a warm cache costs one manifest
read + stats refresh, and a second driver process reuses the first's build.
The in-process dict makes repeated queries() calls free.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from .build import IndexPaths, build_segments

#: bump when the segment schema / codec / tokenizer changes — stale on-disk
#: caches from an older code version must not be reused
FORMAT_VERSION = 3

_CACHE: dict[str, IndexPaths | str] = {}


def lsh_index(
    spark: SparkSession,
    sf_dir: str,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 8,
    seed: int = 42,
) -> str:
    """LSH (t, code, id) bucket table for a corpus, built once per sf_dir
    and shared by every ANN query (round 1 recomputed 128 plane dot products
    per row per query — an API without an index behind it)."""
    key = f"lsh::{os.path.abspath(sf_dir)}::{table}::{n_bits}x{n_tables}"
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    safe = key.strip("/").replace("/", "_").replace(":", "_")
    out = os.path.join(
        tempfile.gettempdir(), "eos_index_cache", f"v{FORMAT_VERSION}_{safe}"
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        from ..operators.similarity import build_lsh_index

        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        build_lsh_index(df, id_col, vec_col, out, dim=dim,
                        n_bits=n_bits, n_tables=n_tables, seed=seed)
    _CACHE[key] = out
    return out


def corpus_index(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    doc_col: str = "doc_id",
    text_col: str = "text",
    num_segments: int = 16,
) -> IndexPaths:
    key = f"{os.path.abspath(sf_dir)}::{table}"
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    safe = key.strip("/").replace("/", "_").replace(":", "_")
    out = os.path.join(
        tempfile.gettempdir(), "eos_index_cache", f"v{FORMAT_VERSION}_{safe}"
    )
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    paths = build_segments(
        spark, df, doc_col, text_col, out, num_segments=num_segments
    )
    _CACHE[key] = paths
    return paths
