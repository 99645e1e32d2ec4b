"""query_string grammar (ref F2) — parse shapes + predicate agreement between
the Spark compilation, the DuckDB compilation and the pure-Python oracle."""

import duckdb
import pytest

from ee_outliers_spark.queryparser import (
    And, Exists, FieldEq, Not, Or, Phrase, Term,
    collect_text_terms, parse_query_string,
    to_duckdb_sql, to_python_predicate, to_spark_predicate,
)

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_shapes():
    n = parse_query_string('tags AND "power shell" AND (a:b OR c:"d e") -bad')
    assert isinstance(n, And) or isinstance(n, Or)
    assert isinstance(parse_query_string("hello"), Term)
    assert isinstance(parse_query_string('"hello world"'), Phrase)
    assert isinstance(parse_query_string("lang:en"), FieldEq)
    assert isinstance(parse_query_string("_exists_:lang"), Exists)
    assert isinstance(parse_query_string("-spam"), Not)
    assert isinstance(parse_query_string("NOT spam"), Not)


def test_keyword_suffix_and_case():
    n = parse_query_string("LANG.keyword:en")
    sql = to_duckdb_sql(n, "text", COLS)
    assert sql == "lang = 'en'"


def test_adjacency_is_or():
    n = parse_query_string("alpha beta")
    assert isinstance(n, Or)


def test_collect_text_terms():
    n = parse_query_string('fast AND "key order" AND lang:en -slow')
    terms, phrases = collect_text_terms(n)
    assert terms == ["fast"]
    assert phrases == ["key order"]


QUERIES = [
    "fast",
    '"key order"',
    "fast AND slow",
    "fast OR zebra",
    "fast -slow",
    "fast AND (lang:en OR lang:de)",
    "_exists_:lang AND fast",
    "n_chars:128",
    'source:"src0" AND fast',
    "NOT (fast OR slow)",
    "the AND batch AND stream",
    "zebraqqq",  # zero matches
]


@pytest.mark.parametrize("q", QUERIES)
def test_three_way_predicate_agreement(q, spark, documents, sf_dir):
    node = parse_query_string(q)
    spark_ids = sorted(
        r[0] for r in documents.where(
            to_spark_predicate(node, "text", COLS)
        ).select("doc_id").collect()
    )
    sql = to_duckdb_sql(node, "text", COLS)
    duck_ids = sorted(
        r[0] for r in duckdb.sql(
            f"select doc_id from '{sf_dir}/documents.parquet' where {sql}"
        ).fetchall()
    )
    pred = to_python_predicate(node, "text", COLS)
    rows = [r.asDict() for r in documents.collect()]
    py_ids = sorted(r["doc_id"] for r in rows if pred(r))
    assert spark_ids == duck_ids == py_ids
