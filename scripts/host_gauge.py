"""Host-health gauge: times a fixed tiny Spark workload (session start, a
codegen agg, a 32-task applyInPandas stage, a shuffle) so benchmark
campaigns can record the host's state alongside their numbers. The absolute
campaign numbers on this sandbox are only meaningful next to this gauge —
round 5 recorded same-code build swings of 34→80 s from host co-tenancy.

Usage: python scripts/host_gauge.py   # prints one JSON line
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "0")

# fault-path probe: wall time to pre-touch a 4g bare JVM — the number that
# swings ~70× between quiet and memory-pressured hypervisor windows
# (measured round 6: 8g cost 7.6 s in one window, 225 s for 16g minutes
# later). Campaigns should record this next to their results.
import subprocess  # noqa: E402

_t = time.monotonic()
try:
    _p = subprocess.run(["java", "-Xms4g", "-Xmx4g", "-XX:+AlwaysPreTouch",
                         "-version"], capture_output=True)
    PRETOUCH_4G_S = (round(time.monotonic() - _t, 3)
                     if _p.returncode == 0 else None)
except FileNotFoundError:
    PRETOUCH_4G_S = None  # no java on PATH: degrade, don't crash the gauge

t_start = time.monotonic()
from ee_outliers_spark.session import get_spark  # noqa: E402

spark = get_spark("host-gauge", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
out = {"cpus": CPUS, "pretouch_4g_s": PRETOUCH_4G_S,
       "session_start_s": round(time.monotonic() - t_start, 3)}

from pyspark.sql import functions as F  # noqa: E402

df = spark.range(1_000_000).select(
    F.col("id"), (F.col("id") % 32).cast("int").alias("k"))

t = time.monotonic()
df.agg(F.sum("id")).collect()
out["codegen_agg_s"] = round(time.monotonic() - t, 3)


def _noop(key, pdf):
    import pandas as pd
    return pd.DataFrame({"n": [len(pdf)]})


t = time.monotonic()
df.groupBy("k").applyInPandas(_noop, "n long").collect()
out["arrow_stage_cold_s"] = round(time.monotonic() - t, 3)
t = time.monotonic()
df.groupBy("k").applyInPandas(_noop, "n long").collect()
out["arrow_stage_warm_s"] = round(time.monotonic() - t, 3)

t = time.monotonic()
df.repartition(CPUS, "k").groupBy("k").agg(F.count("*")).collect()
out["shuffle_s"] = round(time.monotonic() - t, 3)

r = os.times()
out["user_s"] = round(r.user + r.children_user, 1)
out["sys_s"] = round(r.system + r.children_system, 1)
print("HOSTGAUGE " + json.dumps(out))
spark.stop()
