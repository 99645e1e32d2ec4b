"""Simplequery analyzer (SURVEY §3.2; /root/reference/app/analyzers/
simplequery.py:24-96): every event matching the query_string filter is an
outlier — no statistics. The filter composition mirrors es.py:664-710:

    time-range ∧ query_string ∧ ¬(already an outlier of this model)

The must_not clause (simplequery.py:45-56) excludes docs already tagged by
the same model — here an anti-join against the results table (ref J1).
Highlight (F9, es.py:567-587) returns matched term positions; see
``highlight_terms``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queryparser import (
    collect_text_terms,
    parse_query_string,
    to_spark_predicate,
)
from ..tokenizer import phrase_regex, tokenize_py


def simplequery_outliers(
    df: DataFrame,
    query_string: str,
    text_col: str = "text",
    ts_col: str | None = None,
    ts_from=None,
    ts_to=None,
    prior_results: DataFrame | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Matched docs (each one an outlier). ``prior_results`` with ``key_col``
    reproduces the must_not already-tagged exclusion as a left-anti join."""
    node = parse_query_string(query_string)
    pred = to_spark_predicate(node, text_col, df.columns)
    out = df.where(pred)
    if ts_col is not None and ts_from is not None:
        out = out.where(F.col(ts_col) >= ts_from)
    if ts_col is not None and ts_to is not None:
        out = out.where(F.col(ts_col) <= ts_to)
    if prior_results is not None:
        out = out.join(prior_results.select(key_col), key_col, "left_anti")
    return out


def highlight_terms(query_string: str, text_col: str = "text") -> Column:
    """Array of matched positive terms/phrases present in the text — the
    engine-side analog of ES highlight + the reference's
    `<value>...</value>` extraction regex (simplequery.py:83-93, ref F9/X18).
    JVM-side: one rlike per query term over the lowercased text."""
    node = parse_query_string(query_string)
    terms, phrases = collect_text_terms(node)
    frags = []
    for t in dict.fromkeys(terms):
        frags.append(
            F.when(
                F.lower(F.col(text_col)).rlike(phrase_regex([t])), F.lit(t)
            )
        )
    for p in dict.fromkeys(phrases):
        frags.append(
            F.when(
                F.lower(F.col(text_col)).rlike(phrase_regex(tokenize_py(p))),
                F.lit(p),
            )
        )
    if not frags:
        return F.array().cast("array<string>")
    arr = F.array(*frags)
    return F.filter(arr, lambda v: v.isNotNull())
