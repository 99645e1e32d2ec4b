"""Registry backing __spark_entry__.py: one (Spark query, DuckDB oracle SQL)
pair per implemented operator from SURVEY.md §2.

Column-name discipline: every computed column is aliased identically on both
sides (the driver sorts columns by name and hashes values). Float score
columns are excluded from gated outputs where summation-order could flip a
hash; ranks and ids carry the correctness signal, and scores are asserted to
1e-6 in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .index.build import build_doc_lengths, build_postings, corpus_stats
from .index.query import bm25_topk_df, phrase_topk_df
from .queryparser import parse_query_string, to_duckdb_sql, to_spark_predicate
from .tokenizer import tokenize_py, tokens_sql

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
O: dict[str, str] = {}

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def register(name: str, sql: str | None = None):
    def deco(fn):
        Q[name] = fn
        if sql is not None:
            O[name] = sql
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------
# BM25 top-k (SURVEY §2.6 T-BM25, §2.2 F2) — naive-postings DataFrame executor
# --------------------------------------------------------------------------

def _bm25_spark(spark, sf_dir, terms: list[str], k: int, mode: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    doclen = build_doc_lengths(docs, "doc_id", "text")
    n, avgdl = corpus_stats(doclen)
    top = bm25_topk_df(postings, doclen, n, avgdl, terms, k, mode)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def _bm25_sql(terms: list[str], k: int, mode: str) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    and_filter = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    return f"""
WITH dl AS (
  SELECT doc_id, len({tokens_sql('text')}) AS dl FROM documents
),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
toks AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
  {and_filter}
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


@register("bm25_topk_or", _bm25_sql(["customer", "window", "batch"], 20, "or"))
def bm25_topk_or(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["customer", "window", "batch"], 20, "or")


@register("bm25_topk_and", _bm25_sql(["customer", "window", "batch"], 20, "and"))
def bm25_topk_and(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["customer", "window", "batch"], 20, "and")


@register("bm25_topk_head_rare", _bm25_sql(["the", "vector"], 50, "and"))
def bm25_topk_head_rare(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["the", "vector"], 50, "and")


@register("bm25_topk_zero_hit", _bm25_sql(["zzzqqqxxx"], 10, "or"))
def bm25_topk_zero_hit(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["zzzqqqxxx"], 10, "or")


# --- phrase query (ref F2 quoted phrases; Lucene PhraseQuery tf) -------------

def _phrase_sql(phrase: str, k: int) -> str:
    toks = tokenize_py(phrase)
    m = len(toks)
    conj = " AND ".join(f"t[i+{j}] = '{tok}'" for j, tok in enumerate(toks))
    return f"""
WITH toksarr AS (
  SELECT doc_id, {tokens_sql('text')} AS t FROM documents
),
dl AS (SELECT doc_id, len(t) AS dl FROM toksarr),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
hits AS (
  SELECT doc_id,
         len(list_filter(generate_series(1, len(t) - {m - 1}), i -> {conj})) AS tf
  FROM toksarr WHERE len(t) >= {m}
),
matched AS (SELECT * FROM hits WHERE tf > 0),
dfp AS (SELECT count(*) AS df FROM matched),
scores AS (
  SELECT m.doc_id,
         ln(1 + (stats.n - dfp.df + 0.5)/(dfp.df + 0.5))
         * m.tf * 2.2 / (m.tf + 1.2*(0.25 + 0.75*dl.dl/stats.avgdl)) AS score
  FROM matched m JOIN dl USING (doc_id) CROSS JOIN stats CROSS JOIN dfp
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


@register("bm25_phrase", _phrase_sql("key order", 20))
def bm25_phrase(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    doclen = build_doc_lengths(docs, "doc_id", "text")
    n, avgdl = corpus_stats(doclen)
    top = phrase_topk_df(docs, "doc_id", "text", doclen, n, avgdl, "key order", 20)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --------------------------------------------------------------------------
# query_string boolean filter (ref F1-F7; simplequery scan path §3.2)
# --------------------------------------------------------------------------

_QS = 'window AND (lang:en OR lang:de) AND NOT "batch batch" AND _exists_:source'


def _qs_sql(qs: str) -> str:
    node = parse_query_string(qs)
    pred = to_duckdb_sql(node, "text", DOC_COLS)
    return f"SELECT doc_id FROM documents WHERE {pred} ORDER BY doc_id"


@register("querystring_filter", _qs_sql(_QS))
def querystring_filter(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    node = parse_query_string(_QS)
    return (
        docs.where(to_spark_predicate(node, "text", DOC_COLS))
        .select("doc_id")
        .orderBy("doc_id")
    )


# --- count + scan combo (ref S2/S3 es.py:143-180) -----------------------------

@register(
    "count_matches",
    f"SELECT CAST(count(*) AS BIGINT) AS n_matches FROM documents "
    f"WHERE {to_duckdb_sql(parse_query_string('window AND lang:en'), 'text', DOC_COLS)}",
)
def count_matches(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    node = parse_query_string("window AND lang:en")
    return docs.where(to_spark_predicate(node, "text", DOC_COLS)).agg(
        F.count("*").cast("long").alias("n_matches")
    )


# --------------------------------------------------------------------------
# index-statistics queries (term dictionary / doc lengths)
# --------------------------------------------------------------------------

@register(
    "term_df_top20",
    f"""
WITH toks AS (SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents),
tf AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT 20
""",
)
def term_df_top20(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    return (
        postings.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


@register(
    "doclen_stats",
    f"""
WITH dl AS (SELECT doc_id, len({tokens_sql('text')}) AS dl FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dl) AS BIGINT) AS total_tokens,
       CAST(max(dl) AS BIGINT) AS max_dl,
       CAST(min(dl) AS BIGINT) AS min_dl
FROM dl
""",
)
def doclen_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    dl = build_doc_lengths(docs, "doc_id", "text")
    return dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.max("dl").cast("long").alias("max_dl"),
        F.min("dl").cast("long").alias("min_dl"),
    )


# --------------------------------------------------------------------------
# public surface consumed by __spark_entry__
# --------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_spark(spark, sf_dir, ["customer", "window", "batch"], 20, "and")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q)


def oracle_sql() -> dict[str, str]:
    return dict(O)
