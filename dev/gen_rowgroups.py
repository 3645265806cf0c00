#!/usr/bin/env python3
"""Re-chunk a parquet test dataset into bounded row groups.

The driver-generated /root/testdata/sf* files carry ONE row group per
file, so every Spark scan is a single task regardless of table size — a
fixed ~0.2 s single-task floor that compresses per-query bench deltas and
makes the sf0.1 -> sf1 decade factor partly a task-count artifact
(SCALING.md "Benchmark floor note"). This derives a value-identical copy
with row groups capped at the given row count (row order preserved:
single-threaded read, one COPY per table), so scans parallelize the way
they would on production-written files.

Bench-only data: correctness still gates on the driver's sf0.01 parquet.
Usage: python3 dev/gen_rowgroups.py <srcdir> <outdir> [rows_per_group]
  e.g. python3 dev/gen_rowgroups.py /root/testdata/sf0.1 /tmp/graft-sf0.1-rg 65536
"""
import glob
import os
import sys

import duckdb

SRC = sys.argv[1]
OUT = sys.argv[2]
ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 65536


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 1")  # preserve row order exactly
    for src in sorted(glob.glob(f"{SRC}/*.parquet")):
        name = os.path.basename(src)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}')) TO '{OUT}/{name}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROWS})")
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}')").fetchone()[0]
        groups = con.execute(
            "SELECT count(DISTINCT row_group_id) FROM parquet_metadata(?)",
            [f"{OUT}/{name}"]).fetchone()[0]
        print(f"{name}: {rows} rows across {groups} row groups")


if __name__ == "__main__":
    main()
