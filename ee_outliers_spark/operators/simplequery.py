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

import re as _re

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
    index=None,
) -> DataFrame:
    """Matched docs (each one an outlier). ``prior_results`` with ``key_col``
    reproduces the must_not already-tagged exclusion as a left-anti join.
    ``index`` (an IndexPaths) routes single-token text atoms through the
    posting lists instead of regex-scanning the corpus — the same plan the
    gated filter-context queries use (index/filter.py)."""
    node = parse_query_string(query_string)
    if index is not None:
        from ..index.filter import indexed_filter

        out = indexed_filter(df.sparkSession, index, df, key_col, text_col,
                             node, df.columns)
    else:
        out = df.where(to_spark_predicate(node, text_col, df.columns))
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
    for w in _positive_wildcards(node):
        from ..queryparser import _wildcard_regex

        frags.append(
            F.when(
                F.lower(F.col(text_col)).rlike(_wildcard_regex(w)), F.lit(w)
            )
        )
    for body in _positive_safe_regexps(node):
        frags.append(
            F.when(
                F.lower(F.col(text_col)).rlike(
                    f"(^|[^a-z0-9])(?:{body})($|[^a-z0-9])"),
                F.lit(f"/{body}/"),
            )
        )
    if not frags:
        return F.array().cast("array<string>")
    arr = F.array(*frags)
    return F.filter(arr, lambda v: v.isNotNull())


def _positive_wildcards(node) -> list[str]:
    """Positive Wildcard atom patterns (for highlighting; fuzzy atoms are
    skipped — their matched surface form depends on the dictionary
    expansion, which highlight evaluates per row without an index)."""
    from ..queryparser import And, Not, Or, Wildcard

    out: list[str] = []

    def walk(n, neg):
        if isinstance(n, Wildcard) and not neg:
            out.append(n.text)
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                walk(p, neg)
        elif isinstance(n, Not):
            walk(n.part, not neg)

    walk(node, False)
    return list(dict.fromkeys(out))


def _positive_safe_regexps(node) -> list[str]:
    """Positive Regexp atoms whose body is TOKEN-SAFE for raw-text
    highlighting: no `.` and no negated class, so the boundary-wrapped
    pattern can never match across a token boundary (other regexps are
    skipped, like fuzzies — predicate semantics stay exact either way;
    highlight is the presentational layer)."""
    from ..queryparser import And, Not, Or, Regexp, regexp_token_body

    out: list[str] = []

    def walk(n, neg):
        if isinstance(n, Regexp) and not neg:
            body = regexp_token_body(n.pattern)
            if "." not in body and "[^" not in body:
                out.append(body)
        elif isinstance(n, (And, Or)):
            for p in n.parts:
                walk(p, neg)
        elif isinstance(n, Not):
            walk(n.part, not neg)

    walk(node, False)
    return list(dict.fromkeys(out))


def wrap_regex(tokens: list[str]) -> str:
    """Token-boundary match regex WITHOUT lookarounds (RE2-compatible, so
    the DuckDB oracle can run the identical pattern): group 1 = leading
    boundary, group 2 = the matched value, group 3 = trailing boundary."""
    body = "[^a-zA-Z0-9]+".join(_re.escape(t) for t in tokens)
    return f"(^|[^a-zA-Z0-9])({body})($|[^a-zA-Z0-9])"


def highlight_fragment(query_string: str, text_col: str = "text") -> Column:
    """ES-style highlight fragment: the field value with every positive
    query term/phrase occurrence wrapped in ``<value>…</value>`` (the
    reference requests exactly these pre/post tags — es.py:567-587).
    Case-insensitive, token-boundary anchored like the tokenizer."""
    node = parse_query_string(query_string)
    terms, phrases = collect_text_terms(node)
    col = F.col(text_col)
    for p in dict.fromkeys(phrases):
        toks = tokenize_py(p)
        if toks:
            col = F.regexp_replace(
                col, "(?i)" + wrap_regex(toks), "$1<value>$2</value>$3"
            )
    for t in dict.fromkeys(terms):
        col = F.regexp_replace(
            col, "(?i)" + wrap_regex([t]), "$1<value>$2</value>$3"
        )
    for w in _positive_wildcards(node):
        from ..queryparser import wildcard_token_body

        body = wildcard_token_body(w)
        if body is not None:
            col = F.regexp_replace(
                col, f"(?i)(^|[^a-zA-Z0-9])({body})($|[^a-zA-Z0-9])",
                "$1<value>$2</value>$3",
            )
    for body in _positive_safe_regexps(node):
        col = F.regexp_replace(
            col, f"(?i)(^|[^a-zA-Z0-9])((?:{body}))($|[^a-zA-Z0-9])",
            "$1<value>$2</value>$3",
        )
    return col


def extract_matched_values(fragment_col) -> Column:
    """Values between ``<value>`` tags — parity with the reference's
    extraction regex (app/analyzers/simplequery.py:83-93)."""
    c = fragment_col if isinstance(fragment_col, Column) else F.col(fragment_col)
    return F.regexp_extract_all(c, F.lit("(?s)<value>(.*?)</value>"), 1)
