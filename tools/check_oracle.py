#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, loads the Spark parquet result and
runs the matching oracle_sql.json statement in DuckDB over the testdata
tables, then compares: column name set, row count, and values (columns
sorted by name, rows sorted, exact equality; floats compared exactly to
catch rounding-parity bugs).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, rows_only = [], [], []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            failed.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            failed.append((name, f"oracle sql failed: {e}"))
            continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            failed.append((name, f"columns differ: spark={g_cols} oracle={e_cols}"))
            continue
        if len(got) != len(exp):
            failed.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got[g_cols].itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp[e_cols].itertuples(index=False))
        if g != e:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
            failed.append((name, f"values differ, first diff row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}"))
            continue
        passed.append((name, len(got)))
    for name in sorted(set(d.strip() for d in __import__('os').listdir(out_dir)
                           if not d.endswith('.json')) - set(oracle)):
        rows_only.append(name)
    print(f"== PASS ({len(passed)}):")
    for n, r in passed:
        print(f"  {n}  ({r} rows)")
    if rows_only:
        print(f"== ROWS-ONLY (no oracle, {len(rows_only)}): {', '.join(rows_only)}")
    if failed:
        print(f"== FAIL ({len(failed)}):")
        for n, msg in failed:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print("ALL ORACLE CHECKS PASSED")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
