#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over the
<sfDir> parquet tables, sorts columns by name, and compares row-by-row.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


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
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
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
        g = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        w = [tuple(norm(v) for v in r) for r in want.itertuples(index=False)]
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
