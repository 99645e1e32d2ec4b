"""Wave-alignment A/B (round-6 verdict #5: the r6 'pre/post wave-align'
summaries were byte-identical — one measurement, two labels; this records
the two-armed version).

At 2.4M docs the pre-wavealign auto segment count was ceil(need/...) = 147
(4.59 waves of 32); wave-aligned rounding gives 128 (4 exact waves). The
BUILD stage pays the ragged last wave (queries no longer do: round-7 packs
query kernels into `cores` tasks regardless of segment count). This probe
interleaves fresh-JVM builds at num_segments=147 vs 128, REPS per side,
and writes per-invocation JSON + a summary to
bench_evidence/wave_align_r7/.

Usage:
    python scripts/wave_align_probe.py            # orchestrator
    python scripts/wave_align_probe.py --worker N # one build at N segments
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_WAVE_REPS", "3"))
MULT = int(os.environ.get("SPARK_GRAFT_WAVE_MULT", "480"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "bench_evidence", "wave_align_r7")


def worker(nseg: int) -> None:
    import shutil

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    from pyspark.sql import functions as F  # noqa: N812

    from ee_outliers_spark.index.build import build_segments
    from ee_outliers_spark.session import get_spark

    spark = get_spark(f"wave-{nseg}", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep_ids = spark.range(MULT).select(F.col("id").alias("rep"))
    big = docs.crossJoin(rep_ids).select(
        (F.col("doc_id") * MULT + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.col("text"), 4)).alias("text"),
    ).repartition(CPUS * 4).cache()
    n = big.count()
    # warm the python worker pool so both sides pay it outside the timing
    spark.range(64).groupBy((F.col("id") % 64).alias("g")).applyInPandas(
        lambda k, p: p[["id"]], schema="id long").count()
    idx = tempfile.mkdtemp(prefix=f"wave_{nseg}_")
    try:
        t0 = time.monotonic()
        build_segments(spark, big, "doc_id", "text", idx,
                       num_segments=nseg, resume=False)
        secs = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({"nseg": nseg, "n_docs": n, "cpus": CPUS,
                      "build_secs": secs,
                      "docs_per_sec": round(n / secs, 1)}))
    spark.stop()


def orchestrate() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    sides = {147: [], 128: []}  # unaligned (pre-wavealign ceil) vs aligned
    log = open(os.path.join(OUT_DIR, "campaign.log"), "w")
    for i in range(REPS):
        # alternate side order per round: monotone host drift within a
        # round otherwise biases whichever side always runs second
        order = (147, 128) if i % 2 == 0 else (128, 147)
        for nseg in order:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(nseg)],
                capture_output=True, text=True, timeout=1200)
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
            log.write(f"=== inv {i + 1} nseg={nseg}: {line}\n")
            log.flush()
            if p.returncode == 0 and line:
                sides[nseg].append(json.loads(line))
    summary = {
        str(nseg): {
            "median_build_secs": round(statistics.median(
                r["build_secs"] for r in rs), 3) if rs else None,
            "invocations": rs,
        }
        for nseg, rs in sides.items()
    }
    if sides[147] and sides[128]:
        summary["aligned_over_unaligned"] = round(
            statistics.median(r["build_secs"] for r in sides[128])
            / statistics.median(r["build_secs"] for r in sides[147]), 3)
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log.close()
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        orchestrate()
