#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output) THE WAY THE DRIVER
DOES — pyarrow -> pandas, so DECIMAL columns surface as decimal.Decimal
objects and stringify at full declared scale ('2.50'), NOT through DuckDB
(which would normalize both sides to float64 and hide repr mismatches).
Runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
views over the <sfDir> parquet tables, sorts columns by name, and compares
row-by-row on stringified values.
"""
import datetime
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Nulls arrive as None (object cols), NaT (datetime64), NaN (float):
    # one canonical token. Dates vs datetimes likewise unify (pandas reads
    # Spark date32 as datetime.date but DuckDB DATE as datetime64[ns] —
    # the driver's compare treats these as equal, r01 fn_date was green).
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if pd.isna(v) else repr(v)
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
        return "NULL" if pd.isna(v) else pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    # decimal.Decimal stringifies at FULL DECLARED SCALE here ('2.50') —
    # exactly the driver's strict view that float64 repr never equals.
    return str(v)


def read_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = read_spark(out_dir, name)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        g = sorted(tuple(norm(v) for v in r) for r in got.itertuples(index=False))
        w = sorted(tuple(norm(v) for v in r) for r in want.itertuples(index=False))
        if g == w:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"row {diffs[0][0]}\n  spark={diffs[0][1]}\n  duck ={diffs[0][2]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
