#!/usr/bin/env python3
"""Generate an sf1 bench dataset (10x sf0.1) for scale-trend measurement.

The driver ships sf{0.001,0.01,0.1}; the scaling question ("does this
operator's cost flatten per-row at 10x the data?") needs one more decade.
Each fact table is 10 copies of sf0.1 with entity keys offset per copy
(so key cardinality also grows 10x — a funnel/retention/concurrency user
base of 10x users, not 10x events per user); dimension tables (region,
nation) keep their fixed TPC-H cardinality. Deterministic, no RNG.

Bench-only data: correctness still gates on the driver's sf0.01 + DuckDB.
Usage: python3 dev/gen_sf1.py [outdir] [copies] [table,table,...]
  (defaults /tmp/graft-sf1, 10, all tables; copies=100 builds an
  sf10-equivalent, copies=1000 an sf100 — key strides leave headroom for
  up to ~1000 copies before collision. The optional table filter builds
  just the named fact tables plus the as-is dims, for single-query
  scale sweeps where a 23 GB full fixture is waste.)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

# per-table key columns to offset by copy_index * stride (stride = a round
# power of ten above the sf0.1 max key, keeping ids disjoint and readable)
OFFSETS = {
    "events":    {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
    "lineitem":  {"l_orderkey": 10_000_000},
    "orders":    {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer":  {"c_custkey": 1_000_000},
    "part":      {"p_partkey": 1_000_000},
    "supplier":  {"s_suppkey": 100_000},
}
ASIS = ["region", "nation"]


def main():
    import os
    import shutil
    if ONLY is not None:
        unknown = ONLY - set(OFFSETS) - set(ASIS)
        if unknown:
            # a typo here would silently leave stale fixture data in the
            # outdir that a subsequent sweep would measure
            sys.exit(f"unknown table(s) in filter: {sorted(unknown)}; "
                     f"valid: {sorted(set(OFFSETS) | set(ASIS))}")
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # a 1000-copy fixture unrolls into a 1000-way UNION ALL; the default
    # parser depth limit rejects it
    con.execute("SET max_expression_depth TO 250000")
    # chunk size: a COPY of a giant UNION ALL does not stream (a 1000-copy
    # lineitem buffered >60 GB before writing a byte); above one chunk the
    # output becomes a parquet DIRECTORY of per-chunk files, which Spark
    # reads identically and keeps generator memory bounded
    CHUNK = 50
    for table, offs in OFFSETS.items():
        if ONLY is not None and table not in ONLY:
            continue
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]

        def union_of(lo, hi):
            parts = []
            for i in range(lo, hi):
                sel = ", ".join(
                    f"{c} + {i * offs[c]} AS {c}" if c in offs else c for c in cols)
                parts.append(f"SELECT {sel} FROM read_parquet('{src}')")
            return " UNION ALL ".join(parts)

        if COPIES <= CHUNK:
            # a prior chunked fixture at this path is a DIRECTORY; COPY to
            # a single file needs it gone (crossing the threshold downward)
            if os.path.isdir(f"{OUT}/{table}.parquet"):
                shutil.rmtree(f"{OUT}/{table}.parquet")
            con.execute(f"COPY ({union_of(0, COPIES)}) "
                        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        else:
            # clear stale chunks: re-running with fewer copies into the same
            # outdir must not leave old chunk files silently inflating the
            # fixture (read_parquet('*.parquet') would count them all); a
            # prior single-FILE fixture at the path blocks makedirs when
            # crossing the threshold upward
            d = f"{OUT}/{table}.parquet"
            if os.path.isfile(d):
                os.remove(d)
            if os.path.isdir(d):
                for f in os.listdir(d):
                    if f.startswith("chunk_") and f.endswith(".parquet"):
                        os.remove(os.path.join(d, f))
            os.makedirs(d, exist_ok=True)
            for lo in range(0, COPIES, CHUNK):
                hi = min(lo + CHUNK, COPIES)
                con.execute(
                    f"COPY ({union_of(lo, hi)}) TO "
                    f"'{OUT}/{table}.parquet/chunk_{lo:05d}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet"
            + ("/*.parquet" if COPIES > CHUNK else "") + "')").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)
    for table in ASIS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: copied as-is")


if __name__ == "__main__":
    main()
