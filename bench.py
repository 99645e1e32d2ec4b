"""Benchmark harness (driver-run per round; also the local feedback loop).

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]:
  - SPIMI index build (docs/sec — the north-star throughput metric)
  - BM25 top-k via block-max WAND segments and via the DataFrame path
    (per-query latency; reference query set shapes: rare, head, conj, disj,
    phrase)
  - analyzer layer (terms/metrics/sudden_appearance)
  - pipeline ops (minhash-LSH dedup, ANN)

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ..., ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ee_outliers_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from ee_outliers_spark.index.build import (
        build_doc_lengths, build_postings, build_segments, corpus_stats,
    )
    from ee_outliers_spark.index.query import bm25_topk_df, bm25_topk_wand, phrase_topk_df
    from ee_outliers_spark.operators.dedup import minhash_lsh_pairs
    from ee_outliers_spark.operators.metrics_analyzer import metrics_outliers
    from ee_outliers_spark.operators.similarity import cosine_topk
    from ee_outliers_spark.operators.terms import terms_outliers
    import ee_outliers_spark.entrypoints as ep

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs_total = docs.count()  # warm-up + size

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # --- index build (SPIMI segments) ---------------------------------------
    idx_dir = tempfile.mkdtemp(prefix="bench_index_")
    try:
        paths = timed(
            "index_build",
            lambda: build_segments(
                spark, docs, "doc_id", "text", idx_dir,
                num_segments=cpus, resume=False,
            ),
        )
        docs_per_sec = round(n_docs_total / timings["index_build"], 1)

        # --- BM25 via block-max WAND over segments ---------------------------
        wand_queries = {
            "wand_rare": (["vector"], 10, "or"),
            "wand_head": (["the"], 10, "or"),
            "wand_conj": (["customer", "window", "batch"], 10, "and"),
            "wand_disj": (["customer", "window", "batch", "stream"], 10, "or"),
            "wand_head_rare": (["the", "vector"], 10, "and"),
        }
        for name, (terms, k, mode) in wand_queries.items():
            timed(name, lambda t=terms, k=k, m=mode: bm25_topk_wand(
                spark, paths, t, k, m).collect())
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # --- BM25 DataFrame path (naive postings, built once, cached) ------------
    postings = build_postings(docs, "doc_id", "text").cache()
    doclen = build_doc_lengths(docs, "doc_id", "text").cache()
    n, avgdl = corpus_stats(doclen)
    postings.count()
    timed("df_conj", lambda: bm25_topk_df(
        postings, doclen, n, avgdl, ["customer", "window", "batch"], 10, "and"
    ).collect())
    timed("df_phrase", lambda: phrase_topk_df(
        docs, "doc_id", "text", doclen, n, avgdl, "key order", 10).collect())

    # --- filter context + text profiling (index-backed / codegen paths) ------
    timed("querystring_filter", lambda: ep.querystring_filter(spark, sf_dir).count())
    timed("range_filter", lambda: ep.range_filter(spark, sf_dir).count())
    timed("text_profile", lambda: ep.text_profile_q(spark, sf_dir).count())
    timed("token_count_bpe", lambda: ep.token_count_bpe_q(spark, sf_dir).count())

    # --- incremental append (streaming ingestion path, ST5) -------------------
    from ee_outliers_spark.index.build import build_segments
    from ee_outliers_spark.streaming.daemon import append_segments
    from pyspark.sql import functions as F  # noqa: N812

    inc_dir = tempfile.mkdtemp(prefix="bench_inc_")
    try:
        build_segments(spark, docs, "doc_id", "text", inc_dir,
                       num_segments=cpus, resume=False)
        from ee_outliers_spark.index.build import IndexPaths
        new_docs = docs.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        ).limit(1000)
        timed("index_append_1k", lambda: append_segments(
            spark, new_docs, IndexPaths(inc_dir), num_segments=4))
    finally:
        shutil.rmtree(inc_dir, ignore_errors=True)

    # --- analyzers ------------------------------------------------------------
    timed("terms_within", lambda: terms_outliers(
        events, ["user_id"], "event_type", "within_aggregator", "mad", 1.0, "high"
    ).count())
    timed("metrics_length", lambda: metrics_outliers(
        docs, ["source"], "text", "length", "mad", 2.0, "high").count())
    timed("sudden_appearance", lambda: ep.sudden_appearance_q(spark, sf_dir).count())

    # --- pipeline ops ----------------------------------------------------------
    timed("dedup_minhash", lambda: minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_perm=64, bands=16, threshold=0.5
    ).count())
    timed("ann_cosine", lambda: cosine_topk(
        emb, "vec_id", "embedding", ep.ANN_QUERY, 10).collect())

    # --- indexed LSH ANN: build once, probe buckets, rerank candidates -------
    from ee_outliers_spark.operators.similarity import (
        build_lsh_index, lsh_candidates, lsh_topk_indexed,
    )

    lsh_dir = tempfile.mkdtemp(prefix="bench_lsh_")
    try:
        qv = ep._lsh_query_vec(spark, sf_dir)
        timed("lsh_index_build", lambda: build_lsh_index(
            emb, "vec_id", "embedding", lsh_dir, dim=len(qv)))
        timed("ann_lsh", lambda: lsh_topk_indexed(
            spark, emb, "vec_id", "embedding", lsh_dir, qv, 10).collect())
        lsh_candidate_frac = round(
            lsh_candidates(spark, lsh_dir, qv).count() / emb.count(), 4
        )
    finally:
        shutil.rmtree(lsh_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "index-build + BM25 topk + analyzer suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs_total,
        "docs_per_sec_index_build": docs_per_sec,
        "lsh_candidate_frac": lsh_candidate_frac,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
