"""Interleaved POSITIONAL build A/B in ONE warm JVM: POSITIONAL_KERNEL
sides (text = route raw text + Python in-worker inversion; textroute =
route raw text + post-shuffle JVM posexplode/collect_list aggregation;
pairs = two-exchange positional pair shuffle). Side order alternates per
round to cancel host drift.

Usage: python scripts/pos_stream_ab.py CPUS MULT TEXTREP ROUNDS [SIDE_A SIDE_B]
"""
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
mult = int(sys.argv[2]) if len(sys.argv) > 2 else 120
textrep = int(sys.argv[3]) if len(sys.argv) > 3 else 4
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
SIDES = (sys.argv[5], sys.argv[6]) if len(sys.argv) > 6 else (
    "text", "textroute")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from ee_outliers_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark("posab-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(sf_dir + "/documents.parquet")
rep_ids = spark.range(mult).select(F.col("id").alias("rep"))
big = docs.crossJoin(rep_ids).select(
    (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
    F.concat_ws(" ", F.array_repeat(F.col("text"), textrep)).alias("text"))
big = big.repartition(cpus * 4).cache()
n = big.count()


def _noop(key, pdf):
    import pandas as pd
    return pd.DataFrame({"n": [len(pdf)]})


warm = big.withColumn("seg_id", (F.col("doc_id") % 128).cast("int"))
for _ in range(2):
    warm.groupBy("seg_id").applyInPandas(_noop, "n long").count()

import ee_outliers_spark.index.build as B  # noqa: E402

times = {SIDES[0]: [], SIDES[1]: []}
for r in range(rounds):
    order = SIDES if r % 2 == 0 else SIDES[::-1]
    for side in order:
        B.POSITIONAL_KERNEL = side
        out = tempfile.mkdtemp(prefix="posab_")
        try:
            t0 = time.monotonic()
            B.build_segments(spark, big, "doc_id", "text", out,
                             num_segments=None, resume=False,
                             positions=True)
            times[side].append(round(time.monotonic() - t0, 3))
        finally:
            shutil.rmtree(out, ignore_errors=True)
        print(json.dumps({"round": r, "side": side,
                          "secs": times[side][-1]}), flush=True)

print(json.dumps({
    "cpus": cpus, "n_docs": n, "textrep": textrep, "rounds": rounds,
    "times": times,
    "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
}))
