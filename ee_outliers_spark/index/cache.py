"""Per-corpus index cache: build the SPIMI segments ONCE per (corpus
fingerprint, build params, format-version) and share them across every gated
query in the process — index-per-query was round 1's wrong shape (an engine
whose index is rebuilt on each query is not an index engine).

The on-disk layout is ``$TMPDIR/eos_index_cache/v{FORMAT}_{key}`` where the
key folds in a fingerprint of the source parquet files (sizes + mtimes) and
every build parameter — changed data or changed params can never silently
reuse a stale index. Builds claim their cache slot atomically: build into a
private temp dir, ``os.rename`` into place; two concurrent builders race the
rename and the loser discards its copy, so manifests/parquet never interleave.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

from .build import IndexPaths, build_segments

#: bump when the segment schema / codec / tokenizer / hash family changes —
#: stale on-disk caches from an older code version must not be reused
#: (v4: pos_blob positional postings + live_segments commit point;
#:  v5: LSH planes switched to md5-derived ±1 signs)
FORMAT_VERSION = 5

_CACHE: dict[str, IndexPaths | str] = {}


def _corpus_fingerprint(table_path: str) -> str:
    """Cheap content fingerprint of a parquet table: relative file names,
    sizes, mtimes. Any rewrite of the data changes the digest."""
    h = hashlib.sha256()
    if os.path.isdir(table_path):
        for root, _dirs, files in sorted(os.walk(table_path)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                h.update(f"{os.path.relpath(p, table_path)}:"
                         f"{st.st_size}:{st.st_mtime_ns};".encode())
    elif os.path.exists(table_path):
        st = os.stat(table_path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def _slot(key: str) -> str:
    digest = hashlib.sha256(key.encode()).hexdigest()[:24]
    return os.path.join(
        tempfile.gettempdir(), "eos_index_cache", f"v{FORMAT_VERSION}_{digest}"
    )


def _claim(tmp: str, final: str) -> None:
    """Atomically promote a finished private build to the shared slot; a
    concurrent winner's copy is kept and ours discarded."""
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


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
    """LSH (t, code, id) bucket table for a corpus, built once per (corpus
    fingerprint, all hash params) and shared by every ANN query."""
    table_path = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    key = (f"lsh::{table_path}::{_corpus_fingerprint(table_path)}"
           f"::{id_col}::{vec_col}::d{dim}b{n_bits}t{n_tables}s{seed}")
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    out = _slot(key)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from ..operators.similarity import build_lsh_index

        df = spark.read.parquet(table_path)
        tmp = f"{out}.build{os.getpid()}"
        build_lsh_index(df, id_col, vec_col, tmp, dim=dim,
                        n_bits=n_bits, n_tables=n_tables, seed=seed)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _claim(tmp, out)
    _CACHE[key] = out
    return out


def corpus_index(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    doc_col: str = "doc_id",
    text_col: str = "text",
    num_segments: int = 16,
    positions: bool = True,
) -> IndexPaths:
    """Shared positional SPIMI index for a corpus (positions on by default:
    the gate/product path must answer quoted phrases off the index)."""
    table_path = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    key = (f"spimi::{table_path}::{_corpus_fingerprint(table_path)}"
           f"::{doc_col}::{text_col}::n{num_segments}p{int(positions)}")
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    out = _slot(key)
    df = spark.read.parquet(table_path)
    if not os.path.exists(os.path.join(out, "stats.json")):
        tmp = f"{out}.build{os.getpid()}"
        build_segments(spark, df, doc_col, text_col, tmp,
                       num_segments=num_segments, positions=positions,
                       resume=False)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _claim(tmp, out)
    paths = build_segments(  # warm slot: resume short-circuits to a no-op
        spark, df, doc_col, text_col, out,
        num_segments=num_segments, positions=positions,
    )
    _CACHE[key] = paths
    return paths


def ivf_index(
    spark: SparkSession,
    sf_dir: str,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
) -> tuple[str, list[list[float]]]:
    """IVF inverted file (cell-partitioned parquet) for a corpus, built once
    per (corpus fingerprint, params); returns (index path, centroids)."""
    from ..operators.similarity import build_ivf_index, seed_centroids

    table_path = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    key = (f"ivf::{table_path}::{_corpus_fingerprint(table_path)}"
           f"::{id_col}::{vec_col}::c{n_cells}")
    df = spark.read.parquet(table_path)
    cents = seed_centroids(df, id_col, vec_col, n_cells)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit, cents
    out = _slot(key)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        tmp = f"{out}.build{os.getpid()}"
        build_ivf_index(df, id_col, vec_col, tmp, cents)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _claim(tmp, out)
    _CACHE[key] = out
    return out, cents
