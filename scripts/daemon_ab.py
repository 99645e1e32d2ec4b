"""Fresh-JVM A/B of the worker-daemon preimport: time the FIRST Arrow
stage (a 32-segment applyInPandas over the sf-dir docs — the shape of the
bench's cold index_build kernel) with SPARK_GRAFT_WORKER_DAEMON on/off.
Each measurement is its own subprocess (fresh JVM + fresh python pool);
sides interleave to cancel host drift.

Usage: python scripts/daemon_ab.py ROUNDS [CPUS]
"""
import json
import os
import statistics
import subprocess
import sys

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from ee_outliers_spark.session import get_spark
from pyspark.sql import functions as F
t0 = time.monotonic()
spark = get_spark("dab", master="local[%(cpus)d]", shuffle_partitions=%(cpus)d)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()
t1 = time.monotonic()
import pandas as pd
def k(key, pdf):
    return pd.DataFrame({"n": [len(pdf)], "g": [int(key[0])]})
big = docs.repartition(%(cpus)d).withColumn(
    "g", (F.col("doc_id") %% 32).cast("int"))
t2 = time.monotonic()
big.groupBy("g").applyInPandas(k, "n long, g long").collect()
t3 = time.monotonic()
big.groupBy("g").applyInPandas(k, "n long, g long").collect()
t4 = time.monotonic()
print("RESULT " + __import__("json").dumps({
    "session_count": round(t1-t0,3), "first_arrow": round(t3-t2,3),
    "warm_arrow": round(t4-t3,3)}))
"""

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
times = {"on": [], "off": []}
detail = {"on": [], "off": []}
for r in range(ROUNDS):
    order = ("on", "off") if r % 2 == 0 else ("off", "on")
    for side in order:
        env = dict(os.environ)
        env["SPARK_GRAFT_WORKER_DAEMON"] = "1" if side == "on" else "0"
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": repo, "cpus": CPUS}],
            env=env, capture_output=True, text=True, timeout=600)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        rec = json.loads(line[0][7:]) if line else {"first_arrow": -1}
        times[side].append(rec["first_arrow"])
        detail[side].append(rec)
        print(json.dumps({"round": r, "side": side, **rec}), flush=True)

print(json.dumps({"median_first_arrow": {
    k: round(statistics.median(v), 3) for k, v in times.items()}}))
