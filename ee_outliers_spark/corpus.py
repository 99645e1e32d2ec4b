"""Common-Crawl-style ``web_pages`` corpus (BASELINE.json input_hint):

    (url string, warc_ts timestamp, html binary, text string, lang string)

Synthesised deterministically from the driver's ``documents`` parquet table —
no external data, no wall clock, no randomness (seeded by ``doc_id``). The
``html`` column is a deterministic rendering of ``text``; the engine's
text-extraction pandas UDF must recover ``text`` **byte-identically per url**
(BASELINE.json north_rule; checked in tests/test_corpus.py).

This mirrors the reference's deterministic synthetic document generator
(/root/reference/app/tests/unit_tests/utils/dummy_documents_generate.py:34-285)
re-targeted at web pages, and its scroll-scan source
(app/helpers/es.py:110-141) becomes a plain distributed parquet/Iceberg scan.

Scale note: generation is JVM-side (format_string/replace — whole-stage
codegen); extraction is an Arrow-vectorized pandas UDF (the only place Python
is genuinely needed: real HTML parsing). At 10^12 docs both are
embarrassingly parallel map operators — no shuffle.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: epoch of 2024-01-01T00:00:00Z — all timestamps derive from doc_id, never now()
_BASE_EPOCH = 1704067200
#: spread warc_ts over 14 days so time-range pruning has structure
_DAYS = 14


def _escape(col):
    # html-escape &, <, > (JVM-side; codegen-friendly)
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic web_pages table derived from {sf_dir}/documents.parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    # day bucket + pseudo-second-of-day, both pure functions of doc_id
    ts = F.timestamp_seconds(
        F.lit(_BASE_EPOCH)
        + (F.col("doc_id") % _DAYS) * 86400
        + (F.col("doc_id") * 7919) % 86400
    )
    body = _escape(F.coalesce(F.col("text"), F.lit("")))
    html_str = F.format_string(
        '<html><head><meta charset="utf-8"><title>doc %s</title></head>'
        '<body><nav>boilerplate nav</nav><p id="main">%s</p>'
        "<footer>boilerplate footer</footer></body></html>",
        F.col("doc_id").cast("string"),
        body,
    )
    return docs.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# --- extraction: html binary → visible text (Arrow pandas UDF) ---------------

_MAIN_RE = re.compile(r'<p id="main">(.*?)</p>', re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def _extract_one(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    s = raw.decode("utf-8", errors="replace")
    m = _MAIN_RE.search(s)
    payload = m.group(1) if m else _TAG_RE.sub(" ", s)
    return _htmlmod.unescape(payload)


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Visible-text extraction. Deterministic pure function of the bytes —
    byte-identical per url across runs and cluster sizes. A real deployment
    swaps _extract_one's body for a proper HTML parser; the Spark-side
    contract (binary → string, Arrow batches, no per-row Python API) stays."""
    return html.map(_extract_one)


def extracted(pages: DataFrame) -> DataFrame:
    """web_pages with text re-derived from html (invariant: == text)."""
    return pages.withColumn("extracted_text", extract_text("html"))
