#!/usr/bin/env python3
"""Scale-sweep datasets for the quadratic-candidate operator family.

`gen_sf1.py` replicates sf0.1 with key offsets but keeps VALUES identical
across copies — fine for aggregation/graph sweeps, degenerate for the
similarity/skyline family: 100 bit-identical copies of every document (or
every (size, price) point) make the OUTPUT grow quadratically in copies,
so the measured trend is the fixture's answer size, not the operator
(SCALING.md round-11 noted exactly this for q40/q142 and excluded them).

This generator keeps the copy structure (same strides as gen_sf1.py) but
salts values so duplicate density per row stays CONSTANT across decades:

- documents (q101 edit join, q142 prefix join, q189 sorted-neighborhood):
  copy i > 0 gets (a) a 6-char copy tag prepended — any two tags differ in
  >= 3 positions, so cross-copy 16-char edit keys sit beyond the join's
  k=2 — and (b) six of the ~30 vocabulary words renamed with a copy
  suffix. Word renaming is a BIJECTION on the shingle vocabulary: within-
  copy pairwise Jaccard is exactly preserved (the planted near-dup pairs
  survive per copy), while cross-copy Jaccard of originally-identical
  texts drops to ~(1-f)/(1+f) with f = 1-(24/30)^2 ≈ 0.36 → ≈ 0.47,
  far under q142's 0.8 threshold. Copy 0 stays byte-identical to sf0.1.
  n_chars is recomputed from the salted text.
- part (q162/q178 skyline): p_retailprice gets a deterministic per-row
  jitter keyed on the (already copy-offset) p_partkey, so scaled data is
  new independent points — the frontier grows like real data's O(log N),
  not 100 stacked identical layers whose post-prune refine would be a
  fixture artifact.
- embeddings (q135 batch-vs-index semdedup): copied as-is (vec_id offsets
  only) — the fixed 100-vector batch against a 10x/100x index is already
  the honest shape, and identical index vectors only pad cells.

Bench-only data; correctness still gates on the driver's sf0.01 + DuckDB.
Usage: python3 dev/gen_sweep.py [outdir] [copies]
  (defaults /tmp/graft-sw1, 10; run with copies=1 for the sf0.1-scale
  baseline decade and copies=100 for sf10)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sw1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

RENAMED = ["spark", "window", "merge", "table", "column", "vector"]


def tag(i):
    """6-char copy tag; any two distinct tags differ in >= 3 chars (each
    base-26 'digit' is repeated 3x), keeping cross-copy edit keys > k=2."""
    return chr(97 + i // 26) * 3 + chr(97 + i % 26) * 3


def doc_select(i):
    if i == 0:
        return f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet')"
    t = "text"
    for w in RENAMED:
        # word-boundary-safe: the vocab is space-separated single words
        t = f"replace({t}, '{w}', '{w}_{tag(i)}')"
    t = f"'{tag(i)} ' || {t}"
    return (f"SELECT doc_id + {i * 100_000} AS doc_id, {t} AS text, lang, "
            f"source, length({t}) AS n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')")


def part_select(i):
    # per-row deterministic jitter on the copy-offset key: scaled points
    # are independent, not stacked identical layers
    key = f"p_partkey + {i * 1_000_000}"
    return (f"SELECT {key} AS p_partkey, p_name, p_brand, p_type, p_size, "
            f"p_retailprice + (({key}) * 7919 % 997) / 100.0 AS p_retailprice "
            f"FROM read_parquet('{SRC}/part.parquet')")


def emb_select(i):
    return (f"SELECT vec_id + {i * 100_000} AS vec_id, embedding "
            f"FROM read_parquet('{SRC}/embeddings.parquet')")


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, sel in [("documents", doc_select), ("part", part_select),
                       ("embeddings", emb_select)]:
        union = " UNION ALL ".join(sel(i) for i in range(COPIES))
        con.execute(f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
