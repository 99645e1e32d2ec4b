"""Incremental index maintenance: append_segments keeps rank-identity as the
corpus (and avgdl) drifts; Structured Streaming AvailableNow ingestion is
exactly-once across restarts."""

import math
import os

import pytest
from pyspark.sql import functions as F

from ee_outliers_spark.index.build import build_segments
from ee_outliers_spark.index.query import bm25_topk_wand
from ee_outliers_spark.oracle import OracleIndex
from ee_outliers_spark.streaming.daemon import append_segments, stream_index_updates


def _check(spark, paths, docs_dict, terms, mode="or", k=15):
    oracle = OracleIndex(docs_dict)
    got = bm25_topk_wand(spark, paths, terms, k, mode).collect()
    want = oracle.topk(terms, k, mode)
    assert [int(r["doc_id"]) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["score"], s, rel_tol=1e-6)


def test_append_preserves_rank_identity(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_incr"))
    first = documents.where(F.col("doc_id") < 250)
    second = documents.where(F.col("doc_id") >= 250)
    paths = build_segments(spark, first, "doc_id", "text", out, num_segments=4)
    new_ids = append_segments(spark, second, paths, num_segments=4)
    assert new_ids and min(new_ids) >= 4
    full = {int(r["doc_id"]): r["text"]
            for r in documents.select("doc_id", "text").collect()}
    _check(spark, paths, full, ["customer", "window"], "or")
    _check(spark, paths, full, ["the", "vector"], "and")


def test_stream_availablenow_exactly_once(spark, documents, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    in_dir = str(root / "incoming")
    ckpt = str(root / "ckpt")
    out = str(root / "index")
    os.makedirs(in_dir)

    first = documents.where(F.col("doc_id") < 250)
    second = documents.where(F.col("doc_id") >= 250)
    paths = build_segments(spark, first, "doc_id", "text", out, num_segments=4)

    second.select("doc_id", "text").coalesce(1).write.mode("append").parquet(in_dir)
    stream_index_updates(spark, in_dir, paths, ckpt, num_segments=2)
    # replay with no new files: checkpoint must prevent re-indexing
    stream_index_updates(spark, in_dir, paths, ckpt, num_segments=2)

    full = {int(r["doc_id"]): r["text"]
            for r in documents.select("doc_id", "text").collect()}
    _check(spark, paths, full, ["customer", "window"], "or")

    # the index covers each doc exactly once (no duplicate ingestion):
    # doclen sidecar rows sum to the corpus size
    segs = spark.read.parquet(paths.segments)
    n = segs.where(F.col("term").isNull()).agg(F.sum("n_docs")).collect()[0][0]
    assert n == len(full)


def test_daemon_tick_sees_streamed_appends_through_index(
        spark, documents, tmp_path_factory):
    """The live-pipeline composition (reference daemon over a growing ES
    corpus, app/outliers.py:103-198): tick 1 runs an indexed analyzer over
    the initial corpus; new docs land in the incoming dir and
    stream_index_updates ingests them as fresh segments (AvailableNow,
    exactly-once); tick 2 re-runs the SAME AnalyzerSpec against the SAME
    IndexPaths and flags the new matching docs — the index was appended to,
    never rebuilt, and the filter runs off its posting lists."""
    from ee_outliers_spark.config import AnalyzerSpec, run_analyzer

    root = tmp_path_factory.mktemp("live")
    corpus_dir = str(root / "corpus")
    in_dir = str(root / "incoming")
    ckpt = str(root / "ckpt")
    idx = str(root / "index")
    os.makedirs(in_dir)

    first = documents.where(F.col("doc_id") < 250)
    first.write.mode("overwrite").parquet(corpus_dir)
    paths = build_segments(spark, first, "doc_id", "text", idx,
                           num_segments=4, positions=True)
    manifest_lines_t1 = sum(1 for _ in open(paths.manifest))

    spec = AnalyzerSpec(name="live", model_type="simplequery",
                        es_query_filter="customer AND window")

    def tick():
        df = spark.read.parquet(corpus_dir)
        return {int(r["doc_id"]) for r in run_analyzer(
            df, spec, index=paths).select("doc_id").collect()}

    flagged_t1 = tick()

    # new docs arrive: appended to the corpus snapshot AND the incoming dir
    second = documents.where(F.col("doc_id") >= 250)
    second.write.mode("append").parquet(corpus_dir)
    second.select("doc_id", "text").coalesce(1).write.mode(
        "append").parquet(in_dir)
    stream_index_updates(spark, in_dir, paths, ckpt, num_segments=2)

    flagged_t2 = tick()

    want = {int(r["doc_id"]) for r in documents.where(
        F.lower("text").rlike("(^|[^a-z0-9])customer($|[^a-z0-9])")
        & F.lower("text").rlike("(^|[^a-z0-9])window($|[^a-z0-9])")
    ).select("doc_id").collect()}
    assert flagged_t2 == want
    assert flagged_t1 == {d for d in want if d < 250}
    new_hits = {d for d in want if d >= 250}
    assert new_hits and new_hits <= flagged_t2 - flagged_t1
    # appended, not rebuilt: the tick-1 manifest lines are a strict prefix
    manifest_lines_t2 = sum(1 for _ in open(paths.manifest))
    assert manifest_lines_t2 > manifest_lines_t1
