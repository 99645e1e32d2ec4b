"""Index build: SPIMI per-partition segments + a naive exploded-postings path.

Replaces the indexing work the reference delegates to Elasticsearch/Lucene
(every query in /root/reference/app/helpers/es.py:664-710 walks an ES
inverted index; here we build that index with Spark jobs).

Two representations:

1. **Naive postings** (``build_postings``): (term, doc_id, tf) rows via
   explode + groupBy. Pure DataFrame, used as the differential oracle for the
   compressed path and for the DataFrame BM25 scorer.

2. **SPIMI segments** (``build_segments``): docs are assigned to segments by
   ``doc_id % num_segments`` (deterministic → resumable), each segment built
   *inside one task* with zero token shuffle (the SPIMI trick: partition-local
   inversion). Output rows: one per (seg_id, term) with delta-gap + varbyte
   compressed docIDs, varbyte tfs, and block-max metadata (per 128-posting
   block: last docID + max BM25 impact), ready for block-max WAND.

Scale design (10^12 docs):
- token inversion never shuffles: ``mapInPandas`` per partition (SPIMI);
  the only shuffles are the doc→segment repartition (column-pruned to
  (doc_id, tokens-source column)) and the tiny term-stats aggregation.
- head-term skew ("the", stopwords) cannot blow up a reducer because postings
  for a term are built per-segment — a term's global posting list is never
  materialized on one node; segments bound memory (the SPIMI memory budget =
  corpus_size / num_segments).
- resumability: segments land in ``segments.parquet/seg_id=K/`` directories;
  a manifest records lineage + postings/sec per segment; re-running skips
  completed seg_ids (north_rule: "resumable from checkpoint with
  per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import tokenize_py, tokens_col
from .codec import varbyte_encode

BLOCK = 128
K1 = 1.2
B = 0.75

SEGMENT_SCHEMA = (
    "seg_id int, term string, df_local long, n_postings long, "
    "doc_blob binary, tf_blob binary, "
    "block_last_doc array<long>, block_max_impact array<double>, "
    "build_secs double"
)

DOCLEN_SEG_SCHEMA = "seg_id int, doc_ids binary, dls binary, n_docs long"


# --------------------------------------------------------------------------
# naive path (differential oracle + DataFrame BM25 input)
# --------------------------------------------------------------------------

def build_postings(df: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf) — map-side partial agg keeps the shuffle small."""
    toks = df.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))


def build_doc_lengths(df: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    """(doc_id, dl) — narrow map, no shuffle."""
    return df.select(
        F.col(doc_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("dl"),
    )


def corpus_stats(doclen: DataFrame) -> tuple[int, float]:
    row = doclen.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df) global document frequency — small (vocabulary-sized)."""
    return postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))


# --------------------------------------------------------------------------
# SPIMI segment build
# --------------------------------------------------------------------------

def _impact(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """Per-posting BM25 impact (idf excluded — applied at query time):
    tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)). Monotone in tf, exact float64."""
    tf = tf.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))


def _segment_rows(pdfs: Iterator[pd.DataFrame], avgdl: float) -> Iterator[pd.DataFrame]:
    """SPIMI kernel: consume one partition's docs, emit one row per term."""
    t0 = time.monotonic()
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    part = pd.concat(frames, ignore_index=True)
    seg_id = int(part["seg_id"].iloc[0])
    # tokenize (oracle-identical) and invert
    doc_ids: list[int] = []
    terms: list[str] = []
    dl_map: dict[int, int] = {}
    for d, txt in zip(part["doc_id"].to_numpy(), part["text"]):
        toks = tokenize_py(txt)
        dl_map[int(d)] = len(toks)
        doc_ids.extend([int(d)] * len(toks))
        terms.extend(toks)
    if not terms:
        return
    tok = pd.DataFrame({"doc_id": np.asarray(doc_ids, dtype=np.int64), "term": terms})
    tf = (
        tok.groupby(["term", "doc_id"], sort=True)
        .size()
        .rename("tf")
        .reset_index()
    )  # sorted by (term, doc_id) → postings already docID-ascending per term
    out_rows = []
    dl_arr_all = np.array(
        [dl_map[d] for d in tf["doc_id"].to_numpy()], dtype=np.int64
    )
    impacts_all = _impact(tf["tf"].to_numpy(), dl_arr_all, avgdl)
    elapsed = time.monotonic() - t0
    for term, grp_idx in tf.groupby("term", sort=True).indices.items():
        docs = tf["doc_id"].to_numpy()[grp_idx].astype(np.uint64)
        tfs = tf["tf"].to_numpy()[grp_idx].astype(np.uint64)
        imps = impacts_all[grp_idx]
        doc_blob = varbyte_encode(np.diff(docs, prepend=np.uint64(0)))
        tf_blob = varbyte_encode(tfs)
        # block-max metadata
        nblk = (len(docs) + BLOCK - 1) // BLOCK
        blast = [int(docs[min((i + 1) * BLOCK, len(docs)) - 1]) for i in range(nblk)]
        bmax = [float(imps[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(nblk)]
        out_rows.append(
            (seg_id, term, len(docs), len(docs), doc_blob, tf_blob, blast, bmax, elapsed)
        )
    yield pd.DataFrame(
        out_rows,
        columns=[
            "seg_id", "term", "df_local", "n_postings", "doc_blob", "tf_blob",
            "block_last_doc", "block_max_impact", "build_secs",
        ],
    )


def _doclen_seg_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    part = pd.concat(frames, ignore_index=True).sort_values("doc_id")
    seg_id = int(part["seg_id"].iloc[0])
    docs = part["doc_id"].to_numpy().astype(np.uint64)
    dls = part["dl"].to_numpy().astype(np.uint64)
    yield pd.DataFrame(
        [(seg_id, varbyte_encode(np.diff(docs, prepend=np.uint64(0))),
          varbyte_encode(dls), len(docs))],
        columns=["seg_id", "doc_ids", "dls", "n_docs"],
    )


@dataclass
class IndexPaths:
    root: str

    @property
    def segments(self) -> str: return os.path.join(self.root, "segments.parquet")
    @property
    def doclen(self) -> str: return os.path.join(self.root, "doclen.parquet")
    @property
    def doclen_seg(self) -> str: return os.path.join(self.root, "doclen_seg.parquet")
    @property
    def termstats(self) -> str: return os.path.join(self.root, "termstats.parquet")
    @property
    def stats(self) -> str: return os.path.join(self.root, "stats.json")
    @property
    def manifest(self) -> str: return os.path.join(self.root, "manifest.jsonl")


def build_segments(
    spark: SparkSession,
    df: DataFrame,
    doc_col: str,
    text_col: str,
    out_dir: str,
    num_segments: int = 32,
    resume: bool = True,
) -> IndexPaths:
    """Full SPIMI index build with checkpointed, resumable segments.

    Lineage + postings/sec per segment land in ``manifest.jsonl``
    (north_rule: per-partition checkpoints, lineage, metrics).
    """
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    base = df.select(
        F.col(doc_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    # pass 1: doc lengths + global stats (needed for impact precompute)
    doclen = base.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("dl")
    )
    doclen.write.mode("overwrite").parquet(paths.doclen)
    doclen = spark.read.parquet(paths.doclen)
    n_docs, avgdl = corpus_stats(doclen)
    with open(paths.stats, "w") as fh:
        json.dump({"n_docs": n_docs, "avgdl": avgdl, "k1": K1, "b": B,
                   "block": BLOCK, "num_segments": num_segments}, fh)

    done: set[int] = set()
    if resume and os.path.exists(paths.manifest):
        with open(paths.manifest) as fh:
            done = {json.loads(line)["seg_id"] for line in fh if line.strip()}

    todo = [s for s in range(num_segments) if s not in done]
    if todo:
        seg = base.withColumn(
            "seg_id", (F.col("doc_id") % num_segments).cast("int")
        ).where(F.col("seg_id").isin(todo))
        # one Spark partition per segment → each SPIMI kernel owns a segment
        seg = seg.repartition(len(todo), "seg_id")
        t0 = time.monotonic()
        seg_df = seg.mapInPandas(
            lambda it: _segment_rows(it, avgdl), schema=SEGMENT_SCHEMA
        )
        mode = "append" if done else "overwrite"
        seg_df.write.mode(mode).partitionBy("seg_id").parquet(paths.segments)
        wall = time.monotonic() - t0

        dlseg = (
            spark.read.parquet(paths.doclen)
            .withColumn("seg_id", (F.col("doc_id") % num_segments).cast("int"))
            .where(F.col("seg_id").isin(todo))
            .repartition(len(todo), "seg_id")
            .mapInPandas(_doclen_seg_rows, schema=DOCLEN_SEG_SCHEMA)
        )
        dlseg.write.mode(mode).partitionBy("seg_id").parquet(paths.doclen_seg)

        # manifest: lineage + throughput per segment
        seg_stats = (
            spark.read.parquet(paths.segments)
            .where(F.col("seg_id").isin(todo))
            .groupBy("seg_id")
            .agg(
                F.sum("n_postings").alias("postings"),
                F.count("*").alias("terms"),
                F.max("build_secs").alias("build_secs"),
            )
            .collect()
        )
        with open(paths.manifest, "a") as fh:
            for r in seg_stats:
                rec = {
                    "seg_id": int(r["seg_id"]),
                    "postings": int(r["postings"]),
                    "terms": int(r["terms"]),
                    "build_secs": float(r["build_secs"]),
                    "postings_per_sec": float(r["postings"]) / max(r["build_secs"], 1e-9),
                    "lineage": {"source": str(df.schema.simpleString()),
                                "doc_col": doc_col, "text_col": text_col,
                                "num_segments": num_segments},
                    "wall_secs_batch": wall,
                }
                fh.write(json.dumps(rec) + "\n")

    # global term stats from segment rows (vocabulary-sized aggregation)
    segs = spark.read.parquet(paths.segments)
    ts = segs.groupBy("term").agg(F.sum("df_local").cast("long").alias("df"))
    ts.write.mode("overwrite").parquet(paths.termstats)
    return paths
