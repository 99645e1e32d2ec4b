"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion (BASELINE.json: ">=0.8 throughput scaling efficiency from N to 4N
executors").

No real multi-node cluster exists in this sandbox, so per the sandbox
protocol (BASELINE.md) the SAME index-build job runs at two local
parallelism levels (default local[8] vs local[32] — N and 4N cores) on the
SAME input, in separate JVMs (fresh SparkSession each; JVM startup excluded
from the timed region). Efficiency = (thr_4N / thr_N) / 4.

The input corpus is the sf documents table deterministically expanded
``--multiplier`` times (doc_id' = doc_id * multiplier + i — unique ids, same
Zipf token skew) so the build is long enough to amortize fixed overheads,
mirroring per-executor work at the 10^12 design point.

Usage: python scaling_bench.py [--low 8] [--high 32] [--multiplier 48]
Writes results into BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
# 1.2M docs x text rep 16 caches ~11 GB deserialized; heap sized to that
# working set (see session.py: pre-touching an oversized heap costs minutes
# of kernel time under hypervisor memory pressure and stalls the guest)
os.environ.setdefault("SPARK_DRIVER_MEM", "28g")
cpus = {cpus}
mult = {mult}
n_reps = {reps}
textrep = {textrep}
sf_dir = {sf_dir!r}
from ee_outliers_spark.session import get_spark
from pyspark.sql import functions as F
# shuffle partitions scale with the "cluster size" (cores), as any real
# deployment tunes them; AQE coalesces at runtime either way
spark = get_spark("scale-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(sf_dir + "/documents.parquet")
rep_ids = spark.range(mult).select(F.col("id").alias("rep"))
big = docs.crossJoin(rep_ids).select(
    (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
    F.concat_ws(" ", F.array_repeat(F.col("text"), textrep)).alias("text"))
big = big.repartition(128).cache()
n = big.count()  # materialize input before timing (exclude gen cost)
# Warm the execution stack (JIT, python worker pool, page cache) with two
# no-op python stages over the same input: executors at the 10^12 design
# point are long-lived, so steady-state throughput is the honest metric —
# cold-JVM warmup (~80s here, identical at any core count) is not.
def _noop(key, pdf):
    import pandas as pd
    return pd.DataFrame({{"n": [len(pdf)]}})
warm = big.withColumn("seg_id", (F.col("doc_id") % 128).cast("int"))
for _ in range(2):
    # warm the same stage shape as the build (groupBy + applyInPandas)
    warm.groupBy("seg_id").applyInPandas(_noop, "n long").count()
from ee_outliers_spark.index.build import build_segments
times = []
for r in range(n_reps):
    out = tempfile.mkdtemp(prefix="scale_idx_")
    try:
        t0 = time.monotonic()
        # IDENTICAL job at both parallelism levels: fixed segment count
        # (128), only the core count varies — the cluster-size analog.
        build_segments(spark, big, "doc_id", "text", out,
                       num_segments=128, resume=False)
        times.append(time.monotonic() - t0)
    finally:
        shutil.rmtree(out, ignore_errors=True)
dt = min(times)
print(json.dumps({{"cpus": cpus, "n_docs": n, "secs": round(dt, 3),
                   "all_secs": [round(t, 3) for t in times],
                   "mult": mult, "textrep": textrep,
                   "docs_per_sec": round(n / dt, 1)}}))
"""


def run_one(cpus: int, mult: int, textrep: int, sf_dir: str, repo: str,
            reps: int = 2) -> dict:
    code = WORKER.format(repo=repo, cpus=cpus, mult=mult, textrep=textrep,
                         sf_dir=sf_dir, reps=reps)
    # pin the whole JVM+python-worker tree to N cores: local[N] limits task
    # slots only, while GC/JIT/shuffle threads would otherwise freeload on
    # all machine cores — taskset makes N cores mean N cores, like a real
    # N-core executor host
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-4000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--multiplier", type=int, default=240)
    ap.add_argument("--textrep", type=int, default=16,
                    help="text length multiplier (Common-Crawl pages are "
                         "10-100x longer than the synthetic docs; realistic "
                         "per-task work is what the efficiency criterion "
                         "measures)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2,
                    help="timed repetitions per core count; best taken")
    ap.add_argument("--single", type=int, default=None,
                    help="run ONE core count and print its JSON (for "
                         "driving the two phases under separate timeouts)")
    ap.add_argument("--from-json", nargs=2, default=None,
                    metavar=("LOW_JSONS", "HIGH_JSONS"),
                    help="combine --single outputs into BENCH.md; each side "
                         "is a comma-separated list of JSON files (one per "
                         "fresh-JVM invocation); the side's throughput is "
                         "the MEDIAN of per-invocation bests")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.abspath(__file__))

    if args.single is not None:
        print(json.dumps(run_one(args.single, args.multiplier, args.textrep,
                                 args.sf_dir, repo, args.reps)))
        return
    if args.from_json:
        los = [json.load(open(p)) for p in args.from_json[0].split(",")]
        his = [json.load(open(p)) for p in args.from_json[1].split(",")]
    else:
        los = [run_one(args.low, args.multiplier, args.textrep, args.sf_dir,
                       repo, args.reps)]
        his = [run_one(args.high, args.multiplier, args.textrep, args.sf_dir,
                       repo, args.reps)]
    import statistics
    lo_thr = statistics.median(r["docs_per_sec"] for r in los)
    hi_thr = statistics.median(r["docs_per_sec"] for r in his)
    lo, hi = los[0], his[0]
    args.low, args.high = lo["cpus"], hi["cpus"]
    # report the parameters the runs actually used (present in new JSONs)
    args.multiplier = lo.get("mult", args.multiplier)
    args.textrep = lo.get("textrep", args.textrep)
    ratio = hi_thr / lo_thr
    eff = ratio / (args.high / args.low)
    result = {
        "low_cpus": args.low, "high_cpus": args.high,
        "low_docs_per_sec": lo_thr, "high_docs_per_sec": hi_thr,
        "low_invocations": los, "high_invocations": his,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "criterion": ">=0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    def side_rows(rs):
        return "<br>".join(
            f"inv{i+1}: {r['secs']}s (reps {r.get('all_secs', [r['secs']])})"
            for i, r in enumerate(rs))

    section = f"""
## Scaling evidence (sandbox protocol, {args.low}→{args.high} cores)

Same SPIMI index-build job, same input ({lo['n_docs']:,} docs = sf corpus
×{args.multiplier}, text ×{args.textrep}); {len(los)}/{len(his)} fresh-JVM
invocations per side, each invocation runs the timed build {args.reps}× and
keeps the best (steady-state); side throughput = median over invocations:

| cores | median docs/sec | per-invocation best build secs |
|---|---|---|
| {args.low} | {lo_thr:,} | {side_rows(los)} |
| {args.high} | {hi_thr:,} | {side_rows(his)} |

speedup ×{result['speedup']} over a ×{args.high // args.low} core increase →
**scaling efficiency {result['scaling_efficiency']}** (criterion ≥0.8:
{'PASS' if result['pass'] else 'FAIL'}).
"""
    bench_md = os.path.join(repo, "BENCH.md")
    prev = ""
    if os.path.exists(bench_md):
        prev = open(bench_md).read()
        # drop any previous scaling section
        prev = prev.split("\n## Scaling evidence")[0]
    with open(bench_md, "w") as fh:
        fh.write(prev.rstrip() + "\n" + section)


if __name__ == "__main__":
    main()
