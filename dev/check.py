#!/usr/bin/env python3
"""Dev replica of the driver's correctness gate: run Verify's oracle_sql.json
in DuckDB over the same parquet tables and compare to the Spark outputs.
Usage: python3 dev/check.py [sfDir] [outDir]
"""
import glob
import json
import math
import os
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    spark_dirs = [d for d in sorted(os.listdir(OUT)) if os.path.isdir(f"{OUT}/{d}")]
    for name in spark_dirs:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        sdf = con.sql(f"SELECT * FROM '{files[0]}'").df()
        if name not in oracle:
            results[name] = f"ROWS_ONLY ({len(sdf)} rows)"
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        scols, srows = norm_rows(sdf)
        ocols, orows = norm_rows(odf)
        if scols != ocols:
            results[name] = f"SCHEMA_MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            # check dtype-level mismatch vs value mismatch
            results[name] = f"VALUE_MISMATCH n={sum(1 for a, b in zip(srows, orows) if a != b)} first={diffs[:1]}"
        else:
            results[name] = f"OK ({len(srows)} rows)"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_ro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok} OK, {n_ro} rows-only, {len(results) - n_ok - n_ro} failing, {len(results)} total")
    missing = [q for q in oracle if q not in results]
    if missing:
        print("oracle entries with no spark output:", missing)


if __name__ == "__main__":
    main()
