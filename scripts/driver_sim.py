"""Driver simulation: runs the __spark_entry__ contract exactly as the round
driver does — entry() smoke at sf0.001, every queries() entry at sf0.01, and
a DuckDB-oracle diff (columns sorted by name, rows sorted stringified).

Usage: python scripts/driver_sim.py [--only q1,q2] [--sf-dir DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def compare(spark_df, duck_rows, duck_cols):
    cols = sorted(spark_df.columns)
    srows = [tuple(str(r[c]) for c in cols) for r in spark_df.collect()]
    order = [duck_cols.index(c) for c in sorted(duck_cols)]
    drows = [tuple(str(r[i]) for i in order) for r in duck_rows]
    schema_match = sorted(duck_cols) == cols
    return {
        "rows_match": len(srows) == len(drows),
        "schema_match": schema_match,
        "hash_match": sorted(srows) == sorted(drows),
        "spark_rows": len(srows),
        "oracle_rows": len(drows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-entry", action="store_true")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as E
    from ee_outliers_spark.session import get_spark

    spark = get_spark("driver-sim", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_entry:
        t0 = time.monotonic()
        rows = E.entry(spark).collect()
        print(f"entry(): {len(rows)} rows in {time.monotonic()-t0:.1f}s",
              flush=True)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    results, bad = {}, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, args.sf_dir)
            if name in oracles:
                cur = con.execute(oracles[name])
                duck_cols = [d[0] for d in cur.description]
                duck_rows = cur.fetchall()
                res = compare(df, duck_rows, duck_cols)
            else:
                res = {"spark_rows": df.count(), "err": "no_oracle"}
        except Exception as e:  # noqa: BLE001
            res = {"err": f"{type(e).__name__}: {e}"}
        res["secs"] = round(time.monotonic() - t0, 1)
        results[name] = res
        ok = res.get("hash_match", res.get("err") == "no_oracle")
        if not ok:
            bad.append(name)
        print(f"{name}: {json.dumps(res)}", flush=True)

    print(json.dumps({"n": len(results), "failures": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
