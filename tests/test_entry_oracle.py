"""Mimics the driver's correctness gate: run every __spark_entry__.queries()
entry and its oracle_sql() on the same parquet tables, compare row sets
(order-insensitive, column-name aligned)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    df = qs[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = _norm([tuple(r) for r in df.collect()], spark_cols)
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = _norm(res.fetchall(), duck_cols)
    assert sorted(spark_cols) == sorted(duck_cols), "column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert spark_rows == duck_rows


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "rank"]
