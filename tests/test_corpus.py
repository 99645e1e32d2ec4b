"""web_pages synthesis + the byte-identical text-extraction invariant
(BASELINE.json input_hint / north_rule)."""

from ee_outliers_spark.corpus import extracted, web_pages
from pyspark.sql import functions as F


def test_schema(spark, sf_dir):
    pages = web_pages(spark, sf_dir)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types["html"] == "binary"
    assert types["warc_ts"] == "timestamp"


def test_urls_unique_and_deterministic(spark, sf_dir):
    pages = web_pages(spark, sf_dir).cache()
    n = pages.count()
    assert pages.select("url").distinct().count() == n
    # deterministic: re-derivation is identical
    again = web_pages(spark, sf_dir)
    assert pages.exceptAll(again).count() == 0


def test_byte_identical_extraction(spark, sf_dir):
    pages = web_pages(spark, sf_dir)
    bad = extracted(pages).where(
        ~F.col("extracted_text").eqNullSafe(F.col("text"))
    )
    assert bad.count() == 0


def test_extraction_handles_markup_in_text(spark):
    rows = [
        (1, "a <b>bold</b> claim & more", "en", "srcX"),
        (2, "", "en", "srcX"),
        (3, None, "en", "srcX"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    # reuse the generator pipeline on a crafted frame
    import ee_outliers_spark.corpus as c
    from pyspark.sql import functions as F

    url = F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    body = c._escape(F.coalesce(F.col("text"), F.lit("")))
    html_str = F.format_string(
        '<html><body><p id="main">%s</p></body></html>', body)
    pages = df.select(url.alias("url"), F.encode(html_str, "utf-8").alias("html"),
                      F.col("text"))
    out = {r["url"]: r["e"] for r in pages.select(
        "url", "text", c.extract_text("html").alias("e")).collect()}
    assert out["u1"] == "a <b>bold</b> claim & more"
    assert out["u2"] == ""
    assert out["u3"] == ""  # null text renders as empty page


def test_web_pages_partitioned_layout(spark, sf_dir, tmp_path):
    """Day-partitioned, url-sorted storage: a time-bounded read prunes to
    the touched day partitions (fewer input files than the full scan)."""
    import datetime as dt
    import os

    from ee_outliers_spark.corpus import web_pages
    from ee_outliers_spark.sources.tables import read_web_pages, write_web_pages

    out = str(tmp_path / "web_pages")
    pages = web_pages(spark, sf_dir)
    write_web_pages(pages, out)
    dirs = [d for d in os.listdir(out) if d.startswith("crawl_date=")]
    assert len(dirs) == 14  # doc_id % 14 day buckets

    full = read_web_pages(spark, out)
    assert full.count() == pages.count()

    lo = dt.datetime(2024, 1, 2)
    hi = dt.datetime(2024, 1, 4, 23, 59, 59)
    sliced = read_web_pages(spark, out, ts_from=lo, ts_to=hi)
    rows = sliced.select("warc_ts").collect()
    assert rows and all(lo <= r["warc_ts"] <= hi for r in rows)

    def n_files_read(df):
        return df.select(F.input_file_name()).distinct().count()

    assert n_files_read(sliced) < n_files_read(full)  # pruning is real
    assert n_files_read(sliced) <= 3  # exactly the touched day dirs
