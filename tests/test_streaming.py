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
