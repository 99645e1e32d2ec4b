"""Corpus table layout: time-partitioned, url-sorted web_pages storage.

The design-point input (BASELINE.json input_hint) is a Common-Crawl-style
Iceberg table ``(url, warc_ts, html, text, lang)``. This sandbox has no
Iceberg runtime jars, so the same physical layout runs on plain parquet:

- ``PARTITIONED BY (days(warc_ts))`` → ``partitionBy(crawl_date)`` — every
  rolling-history scan (ref ST2, es.py:93-108: re-scan now−7d..now each run)
  prunes to the touched day directories before any row is read;
- Iceberg's sort order (url) → ``sortWithinPartitions(url)`` — parquet
  row-group min/max on url make per-site slices and url point-lookups skip
  row groups.

At 10^12 docs the daily partitions are the unit of incremental indexing:
``streaming/daemon.append_segments`` consumes exactly one day's partitions
and the manifest records the partition values as lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_web_pages(pages: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the web_pages table day-partitioned by warc_ts, url-sorted
    within partitions (see module docstring for the Iceberg mapping)."""
    (
        pages.withColumn("crawl_date", F.to_date("warc_ts"))
        .repartition("crawl_date")
        .sortWithinPartitions("url")
        .write.mode(mode)
        .partitionBy("crawl_date")
        .parquet(path)
    )


def read_web_pages(
    spark: SparkSession,
    path: str,
    ts_from=None,
    ts_to=None,
) -> DataFrame:
    """Read back with optional time bounds — the crawl_date predicate is a
    PARTITION filter (pruned before listing row groups), the warc_ts bounds
    an ordinary pushed filter inside the touched days."""
    df = spark.read.parquet(path)
    if ts_from is not None:
        df = df.where(
            (F.col("crawl_date") >= F.to_date(F.lit(ts_from)))
            & (F.col("warc_ts") >= F.lit(ts_from))
        )
    if ts_to is not None:
        df = df.where(
            (F.col("crawl_date") <= F.to_date(F.lit(ts_to)))
            & (F.col("warc_ts") <= F.lit(ts_to))
        )
    return df
