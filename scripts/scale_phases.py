"""Phase breakdown of the SPIMI build at one core count (pinned externally
via taskset): tokenize+shuffle+pack vs parquet write vs manifest/stats.

Usage: taskset -c 0-N python scripts/scale_phases.py N [mult] [textrep]
Prints one JSON line with per-phase seconds.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
mult = int(sys.argv[2]) if len(sys.argv) > 2 else 240
textrep = int(sys.argv[3]) if len(sys.argv) > 3 else 16
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from ee_outliers_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark("phases-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(sf_dir + "/documents.parquet")
rep_ids = spark.range(mult).select(F.col("id").alias("rep"))
big = docs.crossJoin(rep_ids).select(
    (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
    F.concat_ws(" ", F.array_repeat(F.col("text"), textrep)).alias("text"))
big = big.repartition(128).cache()
n = big.count()


def _noop(key, pdf):
    import pandas as pd
    return pd.DataFrame({"n": [len(pdf)]})


warm = big.withColumn("seg_id", (F.col("doc_id") % 128).cast("int"))
for _ in range(2):
    warm.groupBy("seg_id").applyInPandas(_noop, "n long").count()

from ee_outliers_spark.index.build import (  # noqa: E402
    SEGMENT_SCHEMA, IndexPaths, _pair_stream, _pairs_segment_frame,
    _routed_by_segment, refresh_stats_and_termstats, write_manifest,
)

timings = {}
out = tempfile.mkdtemp(prefix="phase_idx_")
paths = IndexPaths(out)
try:
    base = big
    t0 = time.monotonic()
    pairs = _pair_stream(base, 128)
    seg_df = _routed_by_segment(pairs, 128).applyInPandas(
        _pairs_segment_frame, schema=SEGMENT_SCHEMA).persist()
    seg_df.count()
    timings["tokenize_shuffle_pack"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    seg_df.write.mode("overwrite").partitionBy("seg_id").parquet(paths.segments)
    timings["parquet_write"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    write_manifest(spark, paths, list(range(128)), {"k": "phase"}, 0.0,
                   segs=seg_df)
    timings["manifest"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    refresh_stats_and_termstats(spark, paths, 128, segs=seg_df)
    timings["stats_termstats"] = round(time.monotonic() - t0, 3)
    seg_df.unpersist()
finally:
    shutil.rmtree(out, ignore_errors=True)

timings["total"] = round(sum(timings.values()), 3)
print(json.dumps({"cpus": cpus, "n_docs": n, "phases": timings}))
