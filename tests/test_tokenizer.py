"""Tokenizer identity across the three implementations (Python / Spark / SQL)
— the foundation of rank-identity (SURVEY §7.1 step 1)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_spark.tokenizer import tokenize_py, tokens_col, tokens_sql


def test_basic():
    assert tokenize_py("The Fast FOX, fox-2!") == ["the", "fast", "fox", "fox", "2"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("  \t\n ") == []


def test_unicode_separators():
    assert tokenize_py("naïve café…ok") == ["na", "ve", "caf", "ok"]


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_python_vs_duckdb(s):
    got = duckdb.sql(
        f"select {tokens_sql('?')} ", params=[s]
    ).fetchone()[0]
    assert list(got) == tokenize_py(s)


def test_python_vs_spark(spark):
    samples = [
        "The Fast FOX, fox-2!", "", "a", "naïve café…ok", "UPPER lower 123",
        "x" * 500, "a-b_c d.e", "日本語 text mixed ASCII", "  spaced   out  ",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [list(r[0]) for r in df.select(tokens_col("text")).collect()]
    assert got == [tokenize_py(s) for s in samples]
