"""Deterministic analyzer (tokenizer) shared by the index build, the query
side, the pure-Python oracle, and the DuckDB SQL oracle.

The reference tokenizes by splitting on configured separators
(/root/reference/app/helpers/utils.py:522-534 ``split_text_by_separator``;
word2vec default separators, app/analyzers/ml_models/word2vec.py:160-171).
Elasticsearch's ``standard`` analyzer lowercases and splits on
non-alphanumerics. Our canonical analyzer:

    lowercase, tokens = maximal runs of [a-z0-9]

The three implementations below are semantically identical on any input
(ASCII and non-ASCII: any char outside [a-z0-9] after lowercasing is a
separator in all three).  This identity is what makes rank-identity of BM25
results against both oracles meaningful, and is covered by
tests/test_tokenizer.py (hypothesis property test).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pure-Python (oracle) ----------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_py(text: str | None) -> list[str]:
    """Oracle tokenizer. None → []."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


# --- Spark expression (JVM-side, whole-stage codegen) ------------------------

SEP_REGEX = "[^a-z0-9]+"


def tokens_col(col: Column | str) -> Column:
    """Array<string> of tokens — stays inside codegen (split + filter HOF),
    no Python UDF in the hot path. Null text → empty array (= tokenize_py)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    return F.filter(F.split(F.lower(c), SEP_REGEX), lambda t: t != F.lit(""))


# --- DuckDB SQL fragment (correctness oracle) --------------------------------

def tokens_sql(expr: str) -> str:
    """SQL producing the same token array in DuckDB (null → empty array)."""
    return (
        f"list_filter(regexp_split_to_array(lower(coalesce({expr}, '')),"
        f" '[^a-z0-9]+'), t -> t <> '')"
    )


def phrase_regex(tokens: list[str]) -> str:
    """Regex matching the token sequence as a phrase in lowercased text:
    tokens separated by runs of non-alphanumerics, with boundaries so that
    'cat' does not match inside 'concatenate'. Same regex runs in Java
    (Spark), RE2 (DuckDB) and Python ``re``."""
    body = "[^a-z0-9]+".join(re.escape(t) for t in tokens)
    return f"(^|[^a-z0-9])({body})($|[^a-z0-9])"
