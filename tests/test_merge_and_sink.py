"""LSM segment merge preserves rank-identity; outlier sink merge semantics."""

import datetime as dt
import math

from ee_outliers_spark.index.build import build_segments
from ee_outliers_spark.index.merge import merge_segments
from ee_outliers_spark.index.query import bm25_topk_wand
from ee_outliers_spark.oracle import OracleIndex
from ee_outliers_spark.sources.results import OutlierStore, with_outlier_tags


def test_merge_preserves_rank_identity(spark, documents, docs_dict, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_merge"))
    paths = build_segments(spark, documents, "doc_id", "text", out, num_segments=8)
    merge_segments(spark, paths, fanin=4)
    segs = spark.read.parquet(paths.segments)
    assert segs.select("seg_id").distinct().count() == 2
    oracle = OracleIndex(docs_dict)
    for terms, mode in [(["customer", "window"], "or"), (["the", "vector"], "and")]:
        got = bm25_topk_wand(spark, paths, terms, 15, mode).collect()
        want = oracle.topk(terms, 15, mode)
        assert [int(r["doc_id"]) for r in got] == [d for d, _ in want]
        for r, (_, s) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-6)


def test_outlier_store_merge(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("results") / "outliers.parquet")
    store = OutlierStore(spark, path)
    ts = dt.datetime(2024, 1, 2)
    rows = [("d1", "m1", "terms", "r", "s", "{}", ts),
            ("d2", "m1", "terms", "r", "s", "{}", ts)]
    df = spark.createDataFrame(
        rows,
        "doc_key string, model_name string, model_type string, reason string,"
        " summary string, observations string, detected_ts timestamp",
    )
    assert store.upsert(df) == 2
    assert store.upsert(df) == 0  # idempotent
    rows2 = [("d2", "m2", "terms", "r", "s", "{}", ts)]
    df2 = spark.createDataFrame(rows2, df.schema)
    assert store.upsert(df2) == 1
    assert store.read().count() == 3

    events = spark.createDataFrame(
        [(k,) for k in ["d1", "d2", "d3"]], "doc_id string")
    enr = {r["doc_id"]: (list(r["tags"]), list(r["outlier_model_names"]))
           for r in with_outlier_tags(events, store.read(), "doc_id").collect()}
    assert enr["d1"] == (["outlier"], ["m1"])
    assert enr["d2"] == (["outlier"], ["m1", "m2"])
    assert enr["d3"] == ([], [])

    store.wipe_model("m1")
    assert store.read().count() == 1
    store.housekeep_whitelist(spark.createDataFrame([("d2",)], "doc_key string"))
    assert store.read().count() == 0
