"""LSM-style segment merge (≈ Lucene tiered segment merging — the piece of ES
physical execution named in SURVEY §4 / the north_star's "log-structured merge
of partition-local segments into a global index").

Segments are doc-disjoint, so merging ``fanin`` segments is, per term, a
merge-sort of posting arrays followed by re-encoding (delta-gap varbyte +
fresh block metadata), and a concat+sort of the doclen sidecars. One output
segment is built inside one task via applyInPandas over the single segment
table (term rows + sidecar rows travel together), so task memory =
merged-segment size — the same bounded budget as the SPIMI build.

Why merge at all at scale: builds at 10^12 docs produce thousands of small
segments (one per build partition / incremental batch); query cost has a
per-segment constant (cursor setup, per-segment heaps), so periodic merges
keep the segment count logarithmic in corpus size, exactly like an LSM tree.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import (
    SEGMENT_SCHEMA, IndexPaths, refresh_stats_and_termstats, segment_frame,
)
from .codec import varbyte_decode


def _merge_group(pdf: pd.DataFrame, new_seg: int) -> pd.DataFrame:
    t0 = time.monotonic()
    dl_rows = pdf[pdf["term"].isna()]
    term_rows = pdf[pdf["term"].notna()]
    # merged doclen sidecar
    dl_docs_parts, dl_vals_parts = [], []
    for _, row in dl_rows.iterrows():
        dl_docs_parts.append(
            np.cumsum(varbyte_decode(bytes(row["doc_blob"]))).astype(np.int64))
        dl_vals_parts.append(varbyte_decode(bytes(row["tf_blob"])).astype(np.int64))
    dl_docs = np.concatenate(dl_docs_parts) if dl_docs_parts else np.empty(0, np.int64)
    dl_vals = np.concatenate(dl_vals_parts) if dl_vals_parts else np.empty(0, np.int64)
    order = np.argsort(dl_docs, kind="stable")
    dl_docs, dl_vals = dl_docs[order], dl_vals[order]

    # merged (term, doc_id, tf) frame — doc-disjoint inputs ⇒ plain concat+sort
    frames = []
    for _, row in term_rows.iterrows():
        docs = np.cumsum(varbyte_decode(bytes(row["doc_blob"]))).astype(np.int64)
        tfs = varbyte_decode(bytes(row["tf_blob"])).astype(np.int64)
        frames.append(pd.DataFrame(
            {"term": row["term"], "doc_id": docs, "tf": tfs}))
    tf = (
        pd.concat(frames, ignore_index=True).sort_values(["term", "doc_id"])
        if frames else pd.DataFrame({"term": [], "doc_id": [], "tf": []})
    )
    return segment_frame(new_seg, dl_docs, dl_vals, tf, time.monotonic() - t0)


def merge_segments(spark: SparkSession, paths: IndexPaths, fanin: int = 4) -> None:
    """Merge every ``fanin`` consecutive seg_ids into one; rewrites
    segments.parquet in place (atomic via temp dir + rename)."""
    segs = spark.read.parquet(paths.segments).withColumn(
        "new_seg", (F.col("seg_id") / fanin).cast("int")
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_group(pdf, int(key[0]))

    merged = segs.groupBy("new_seg").applyInPandas(run, schema=SEGMENT_SCHEMA)

    tmp_seg = paths.segments + ".merge_tmp"
    merged.write.mode("overwrite").partitionBy("seg_id").parquet(tmp_seg)
    shutil.rmtree(paths.segments)
    os.rename(tmp_seg, paths.segments)
    refresh_stats_and_termstats(spark, paths)
