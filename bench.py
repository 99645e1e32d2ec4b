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
    from ee_outliers_spark.index.query import (
        bm25_topk_df, bm25_topk_wand, phrase_topk_wand,
    )
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

    # p50/p95 latency protocol (BASELINE.md metric table): each headline
    # query is timed over LAT_REPS warm repetitions; queries[name] stays the
    # first (cold-plan) invocation for round-over-round comparability.
    LAT_REPS = int(os.environ.get("SPARK_GRAFT_LAT_REPS", "20"))
    latency: dict[str, dict] = {}

    def timed_with_latency(name, fn):
        out = timed(name, fn)
        samples = []
        for _ in range(LAT_REPS):
            t0 = time.monotonic()
            fn()
            samples.append((time.monotonic() - t0) * 1000.0)
        samples.sort()
        latency[name] = {
            "p50_ms": round(samples[len(samples) // 2], 1),
            "p95_ms": round(samples[min(len(samples) - 1,
                                        int(len(samples) * 0.95))], 1),
            "reps": LAT_REPS,
        }
        return out

    WAND_QUERIES = {
        "wand_rare": (["vector"], 10, "or"),
        "wand_head": (["the"], 10, "or"),
        "wand_conj": (["customer", "window", "batch"], 10, "and"),
        "wand_disj": (["customer", "window", "batch", "stream"], 10, "or"),
        "wand_head_rare": (["the", "vector"], 10, "and"),
    }

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
        for name, (terms, k, mode) in WAND_QUERIES.items():
            timed_with_latency(name, lambda t=terms, k=k, m=mode: bm25_topk_wand(
                spark, paths, t, k, m).collect())
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # --- positional index + index-backed phrase query ------------------------
    pos_dir = tempfile.mkdtemp(prefix="bench_index_pos_")
    try:
        pos_paths = timed(
            "index_build_pos",
            lambda: build_segments(
                spark, docs, "doc_id", "text", pos_dir,
                num_segments=cpus, resume=False, positions=True,
            ),
        )
        timed_with_latency("wand_phrase", lambda: phrase_topk_wand(
            spark, pos_paths, "key order", 10).collect())
    finally:
        shutil.rmtree(pos_dir, ignore_errors=True)

    # --- BM25 DataFrame path (naive postings, built once, cached) ------------
    postings = build_postings(docs, "doc_id", "text").cache()
    doclen = build_doc_lengths(docs, "doc_id", "text").cache()
    n, avgdl = corpus_stats(doclen)
    postings.count()
    timed("df_conj", lambda: bm25_topk_df(
        postings, doclen, n, avgdl, ["customer", "window", "batch"], 10, "and"
    ).collect())

    # --- filter context + text profiling (index-backed / codegen paths) ------
    from ee_outliers_spark.index.cache import corpus_index
    corpus_index(spark, sf_dir)  # warm the shared index: time queries, not builds
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

    # --- load-bearing scale block: same queries on a 600k-doc corpus ---------
    # sf0.1 is 5k docs — sub-second queries there measure overhead, not work.
    # The headline WAND suite re-runs once against the deterministic 120×
    # expansion (same Zipf skew, ~600k docs) so latencies reflect real
    # posting-list sizes. Skippable via SPARK_GRAFT_BIG_MULT=0.
    big_mult = int(os.environ.get("SPARK_GRAFT_BIG_MULT", "120"))
    big_block = {}
    if big_mult > 0:
        from pyspark.sql import functions as F  # noqa: N812

        rep_ids = spark.range(big_mult).select(F.col("id").alias("rep"))
        big = docs.crossJoin(rep_ids).select(
            (F.col("doc_id") * big_mult + F.col("rep")).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.col("text"), 4)).alias("text"),
        ).repartition(cpus * 4).cache()
        n_big = big.count()
        big_timings: dict[str, float] = {}
        big_latency: dict[str, dict] = {}

        def btimed(name, fn, reps=0):
            t0 = time.monotonic()
            out = fn()
            big_timings[name] = round(time.monotonic() - t0, 3)
            samples = []
            for _ in range(reps):
                s0 = time.monotonic()
                fn()
                samples.append((time.monotonic() - s0) * 1000.0)
            if samples:
                samples.sort()
                big_latency[name] = {
                    "p50_ms": round(samples[len(samples) // 2], 1),
                    "p95_ms": round(samples[min(len(samples) - 1,
                                                int(len(samples) * 0.95))], 1),
                    "reps": reps,
                }
            return out

        big_dir = tempfile.mkdtemp(prefix="bench_big_idx_")
        try:
            bpaths = btimed("index_build", lambda: build_segments(
                spark, big, "doc_id", "text", big_dir,
                num_segments=cpus * 4, resume=False))
            for name, (terms, k, mode) in WAND_QUERIES.items():
                btimed(name, lambda t=terms, k=k, m=mode: bm25_topk_wand(
                    spark, bpaths, t, k, m).collect(), reps=LAT_REPS)
        finally:
            shutil.rmtree(big_dir, ignore_errors=True)
        # positional build at scale: the positions shuffle is O(total
        # tokens) — the load-bearing cost/benefit number for index-backed
        # phrases (phrase + sloppy-phrase + wildcard latencies below)
        big_pos_dir = tempfile.mkdtemp(prefix="bench_big_pos_")
        try:
            bpos = btimed("index_build_pos", lambda: build_segments(
                spark, big, "doc_id", "text", big_pos_dir,
                num_segments=cpus * 4, resume=False, positions=True))
            btimed("wand_phrase", lambda: phrase_topk_wand(
                spark, bpos, "key order", 10).collect(), reps=LAT_REPS)
            from ee_outliers_spark.index.query import querystring_topk
            btimed("qs_slop_phrase", lambda: querystring_topk(
                spark, bpos, '"order key"~2', 10).collect(), reps=LAT_REPS)
            btimed("qs_wildcard", lambda: querystring_topk(
                spark, bpos, "cust* window", 10).collect(), reps=LAT_REPS)
            # filter context at scale: the reference's primary query shape
            # (es_query_filter) over the 600k corpus, fully index-backed
            from ee_outliers_spark.index.filter import indexed_filter
            from ee_outliers_spark.queryparser import parse_query_string
            fq = parse_query_string(
                'window AND (cust* OR batch) AND NOT "batch batch"')
            btimed("qs_filter", lambda: indexed_filter(
                spark, bpos, big, "doc_id", "text", fq,
                ["doc_id", "text"]).count(), reps=LAT_REPS)
        finally:
            shutil.rmtree(big_pos_dir, ignore_errors=True)
        big.unpersist()
        big_block = {
            "n_docs_600k": n_big,
            "docs_per_sec_index_build_600k": round(
                n_big / big_timings["index_build"], 1),
            "docs_per_sec_index_build_pos_600k": round(
                n_big / big_timings["index_build_pos"], 1),
            "queries_600k": big_timings,
            "latency_600k": big_latency,
        }

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "index-build + BM25 topk + analyzer suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "latency": latency,
        "sf": sf,
        "n_docs": n_docs_total,
        "docs_per_sec_index_build": docs_per_sec,
        "lsh_candidate_frac": lsh_candidate_frac,
        "cpus": cpus,
        **big_block,
    }))


if __name__ == "__main__":
    main()
