"""Decompose the 600k->2.4M query-latency growth: segment-COUNT overhead
(more applyInPandas task groups) vs posting VOLUME (more decoded bytes).
Builds the 2.4M corpus at auto segments (~148) AND at the 600k count (64),
then times the probe queries on both — same data, same cores, only the
segment count differs.

Usage: python scripts/segcount_probe.py [mult=480]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mult = int(sys.argv[1]) if len(sys.argv) > 1 else 480
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from ee_outliers_spark.index.build import build_segments  # noqa: E402
from ee_outliers_spark.index.filter import matching_ids  # noqa: E402
from ee_outliers_spark.index.query import (  # noqa: E402
    bm25_topk_wand, phrase_topk_wand)
from ee_outliers_spark.queryparser import parse_query_string  # noqa: E402
from ee_outliers_spark.session import get_spark  # noqa: E402

spark = get_spark("segcount", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
rep_ids = spark.range(mult).select(F.col("id").alias("rep"))
big = docs.crossJoin(rep_ids).select(
    (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
    F.concat_ws(" ", F.array_repeat(F.col("text"), 4)).alias("text"),
).repartition(CPUS * 4).cache()
n = big.count()
fq = parse_query_string('window AND (cust* OR batch) AND NOT "batch batch"')


def lat(fn, reps=12):
    fn()
    samples = []
    for _ in range(reps):
        s = time.monotonic()
        fn()
        samples.append(time.monotonic() - s)
    samples.sort()
    return round(samples[len(samples) // 2], 3)


out = {"n_docs": n, "cpus": CPUS}
for nseg in (None, 64):
    idx = tempfile.mkdtemp(prefix=f"segcount_{nseg}_")
    try:
        t0 = time.monotonic()
        paths = build_segments(spark, big, "doc_id", "text", idx,
                               num_segments=nseg, resume=False,
                               positions=True)
        from ee_outliers_spark.index.build import load_stats
        st = load_stats(paths)
        key = f"segs_{st.get('num_segments')}"
        out[key] = {
            "build_s": round(time.monotonic() - t0, 3),
            "qs_count": lat(lambda: matching_ids(spark, paths, fq).count()),
            "wand_conj": lat(lambda: bm25_topk_wand(
                spark, paths, ["customer", "window", "batch"], 10,
                "and").collect()),
            "wand_phrase": lat(lambda: phrase_topk_wand(
                spark, paths, "key order", 10).collect()),
        }
    finally:
        shutil.rmtree(idx, ignore_errors=True)
print("SEGCOUNT " + json.dumps(out))
