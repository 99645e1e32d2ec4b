"""Corpus-scale probe (round-4 verdict #5): the same queries at 600k and
2.4M docs, medians of N fresh-JVM invocations per scale, to evidence that
the postings-only filter/count and WAND paths grow SUBLINEARLY in corpus
size (the zero-doc-shuffle claim). Writes one JSON line per invocation to
the campaign log and a summary JSON.

Usage:
    python scripts/scale_probe.py              # orchestrator (3 reps/scale)
    python scripts/scale_probe.py --worker M   # one invocation at mult=M
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
MULTS = [int(x) for x in
         os.environ.get("SPARK_GRAFT_SCALE_MULTS", "120,480").split(",")]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_evidence",
    os.environ.get("SPARK_GRAFT_PROBE_OUT", "scale_probe_r6"))


def worker(mult: int) -> None:
    # 2.4M-doc corpus caches ~6 GB + positional build frames; see session.py
    # for why the heap is sized to the working set, not the box
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    from pyspark.sql import functions as F  # noqa: N812

    from ee_outliers_spark.index.build import build_segments
    from ee_outliers_spark.index.filter import indexed_filter, matching_ids
    from ee_outliers_spark.index.query import bm25_topk_wand, phrase_topk_wand
    from ee_outliers_spark.queryparser import parse_query_string
    from ee_outliers_spark.session import get_spark

    spark = get_spark("scale-probe", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep_ids = spark.range(mult).select(F.col("id").alias("rep"))
    big = docs.crossJoin(rep_ids).select(
        (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.col("text"), 4)).alias("text"),
    ).repartition(CPUS * 4).cache()
    n = big.count()

    out: dict = {"mult": mult, "n_docs": n}
    idx = tempfile.mkdtemp(prefix=f"scale_probe_{mult}_")
    try:
        t0 = time.monotonic()
        paths = build_segments(spark, big, "doc_id", "text", idx,
                               num_segments=None, resume=False,
                               positions=True)
        out["index_build_pos_s"] = round(time.monotonic() - t0, 3)
        out["docs_per_sec"] = round(n / out["index_build_pos_s"], 1)

        fq = parse_query_string(
            'window AND (cust* OR batch) AND NOT "batch batch"')

        def lat(fn, reps=12):
            fn()  # warm plan
            samples = []
            for _ in range(reps):
                s = time.monotonic()
                fn()
                samples.append(time.monotonic() - s)
            samples.sort()
            return {"p50_s": round(samples[len(samples) // 2], 3),
                    "min_s": round(samples[0], 3)}

        out["qs_count"] = lat(lambda: matching_ids(
            spark, paths, fq, count_only=True).agg(
            {"cnt": "sum"}).collect())
        out["qs_filter"] = lat(lambda: indexed_filter(
            spark, paths, big, "doc_id", "text", fq,
            ["doc_id", "text"]).count())
        out["wand_head"] = lat(lambda: bm25_topk_wand(
            spark, paths, ["the"], 10, "or").collect())
        out["wand_conj"] = lat(lambda: bm25_topk_wand(
            spark, paths, ["customer", "window", "batch"], 10,
            "and").collect())
        out["wand_phrase"] = lat(lambda: phrase_topk_wand(
            spark, paths, "key order", 10).collect())
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    print("SCALEPROBE " + json.dumps(out))


def orchestrate() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    log = os.path.join(OUT_DIR, "campaign.log")
    runs: list[dict] = []
    with open(log, "a") as fh:
        for rep in range(REPS):
            for mult in MULTS:  # interleaved: host noise hits both scales
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     str(mult)],
                    capture_output=True, text=True, timeout=3000)
                line = next((ln for ln in p.stdout.splitlines()
                             if ln.startswith("SCALEPROBE ")), None)
                fh.write(f"rep={rep} mult={mult} "
                         f"{line or 'FAILED: ' + p.stderr[-400:]}\n")
                fh.flush()
                if line:
                    runs.append(json.loads(line[len("SCALEPROBE "):]))

    summary: dict = {"reps": REPS, "mults": MULTS, "queries": {}}
    for mult in MULTS:
        sel = [r for r in runs if r["mult"] == mult]
        if not sel:
            continue
        m: dict = {"n_docs": sel[0]["n_docs"],
                   "index_build_pos_s": round(statistics.median(
                       r["index_build_pos_s"] for r in sel), 3),
                   "docs_per_sec": round(statistics.median(
                       r["docs_per_sec"] for r in sel), 1)}
        for q in ("qs_count", "qs_filter", "wand_head", "wand_conj",
                  "wand_phrase"):
            m[q + "_p50_s"] = round(statistics.median(
                r[q]["p50_s"] for r in sel), 3)
        summary["queries"][str(mult)] = m
    if len(MULTS) == 2 and all(str(m) in summary["queries"] for m in MULTS):
        lo, hi = (summary["queries"][str(m)] for m in MULTS)
        scale = hi["n_docs"] / lo["n_docs"]
        summary["corpus_ratio"] = round(scale, 2)
        summary["query_time_ratios"] = {
            q: round(hi[q + "_p50_s"] / max(lo[q + "_p50_s"], 1e-9), 2)
            for q in ("qs_count", "qs_filter", "wand_head", "wand_conj",
                      "wand_phrase")}
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        orchestrate()
