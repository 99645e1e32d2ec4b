"""Index-backed filter context: positive/negated single-token text predicates
resolve against the SPIMI posting lists instead of regex-scanning the corpus.

The reference's filter context is an ES bool query — every ``term`` clause is
a posting-list lookup in Lucene (ref F1/F2, /root/reference/app/helpers/
es.py:238-250, :664-710). Round 1 compiled those clauses to ``rlike`` over
the full text column: a per-row Java regex over 100 TB. Here the plan is:

  segments.parquet scan (``term IN (...)`` pushed to parquet row groups)
    → varbyte-decode the ≤|q| matched posting lists (Arrow batch, tiny)
    → groupBy doc_id → collect_set(term)   (one shuffle, posting-sized)
    → left join docs on doc_id            (doc-keyed equi-join)
    → predicate = array_contains(matched_terms, t) per Term atom

Phrases and multi-token terms keep the regex path (positions aren't indexed);
every other atom (field equality, ranges, exists) stays a plain column
predicate that Catalyst pushes to the docs scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queryparser import And, Not, Or, Term, to_spark_predicate
from ..tokenizer import tokenize_py
from .build import IndexPaths, read_live_segments
from .codec import varbyte_decode

MATCH_COL = "_matched_terms"


def single_token_terms(node) -> list[str]:
    """Distinct single-token Term atoms anywhere in the AST (any polarity —
    the marker is the truth value 'doc contains token'; negation applies to
    the marker itself)."""
    out: list[str] = []

    def walk(n):
        if isinstance(n, Term):
            toks = tokenize_py(n.text)
            if len(toks) == 1:
                out.append(toks[0])
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                walk(p)
        elif isinstance(n, Not):
            walk(n.part)

    walk(node)
    return list(dict.fromkeys(out))


def posting_docs(spark: SparkSession, paths: IndexPaths,
                 terms: list[str]) -> DataFrame:
    """(term, doc_id) for the requested terms, decoded from the compressed
    segments. The ``term IN (...)`` filter reaches the parquet scan, so only
    |q| rows per segment are read regardless of corpus size."""
    segs = read_live_segments(spark, paths).where(
        F.col("term").isin(terms)
    ).select("term", "doc_blob")

    def decode(batches):
        for pdf in batches:
            ts, ds = [], []
            for term, blob in zip(pdf["term"], pdf["doc_blob"]):
                docs = np.cumsum(varbyte_decode(bytes(blob))).astype(np.int64)
                ts.append(np.full(len(docs), term, dtype=object))
                ds.append(docs)
            if ts:
                yield pd.DataFrame({
                    "term": np.concatenate(ts),
                    "doc_id": np.concatenate(ds),
                })

    return segs.mapInPandas(decode, schema="term string, doc_id long")


def attach_matched_terms(
    spark: SparkSession,
    paths: IndexPaths,
    docs: DataFrame,
    doc_col: str,
    terms: list[str],
) -> DataFrame:
    """docs + an array column of which query terms each doc contains
    (empty array when none — never null, so NOT composes correctly)."""
    if not terms:
        return docs.withColumn(MATCH_COL, F.array().cast("array<string>"))
    matched = (
        posting_docs(spark, paths, terms)
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias(MATCH_COL))
        .withColumnRenamed("doc_id", "__pd_doc_id")
    )
    joined = docs.join(
        matched, docs[doc_col] == F.col("__pd_doc_id"), "left"
    ).drop("__pd_doc_id")
    return joined.withColumn(
        MATCH_COL,
        F.coalesce(F.col(MATCH_COL), F.array().cast("array<string>")),
    )


def indexed_predicate(node, text_col: str, columns: list[str]) -> Column:
    """Same boolean as ``to_spark_predicate`` but single-token Term atoms
    test membership in MATCH_COL instead of regex-scanning the text."""
    markers = {
        t: F.array_contains(F.col(MATCH_COL), t)
        for t in single_token_terms(node)
    }
    return to_spark_predicate(node, text_col, columns, term_markers=markers)


def indexed_filter(
    spark: SparkSession,
    paths: IndexPaths,
    docs: DataFrame,
    doc_col: str,
    text_col: str,
    node,
    columns: list[str],
) -> DataFrame:
    """Filter docs by a parsed query AST with index-backed term atoms;
    returns the original docs columns."""
    terms = single_token_terms(node)
    marked = attach_matched_terms(spark, paths, docs, doc_col, terms)
    return marked.where(
        indexed_predicate(node, text_col, columns)
    ).drop(MATCH_COL)
