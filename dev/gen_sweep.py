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
  every copy i renames the fixture's closed 31-word vocabulary with a
  copy-unique suffix (word -> word_tag(i)) and prepends a 5-char codeword
  from a [5,2] MDS code over GF(31). The rename is a BIJECTION from the
  base vocabulary to copy i's vocabulary, so within-copy pairwise
  (word-level shingle) similarity is preserved exactly — the planted
  near-dup pairs survive per copy — while the GLOBAL shingle vocabulary
  grows linearly in copies, exactly like a real corpus: cross-copy shingle
  sets are disjoint STRINGS, so q142's prefix buckets stay copy-local and
  candidate volume stays linear. (Two rejected designs, kept here as a
  warning: suffix-only collapsed q101's 16-char key space ~470x because
  longer words mean fewer words per key window; an affine vocab
  PERMUTATION preserved key entropy but kept the global shingle vocabulary
  CLOSED, so q142's buckets mixed all copies and candidates grew
  quadratically. The fixture knob that matters at scale is which
  vocabulary grows with N.) The codeword (pairwise Hamming >= 4, far over
  the join's k=2) gives cross-copy edit keys guaranteed distance and
  restores per-copy key diversity; all copies are salted identically in
  structure (including copy 0) so every decade is apples-to-apples.
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
Usage: python3 dev/gen_sweep.py [outdir] [copies] [table,table,...]
  (defaults /tmp/graft-sw1, 10; run with copies=1 for the sf0.1-scale
  baseline decade, copies=100 for sf10, copies=1000 for sf100. Above 50
  copies each table becomes a parquet DIRECTORY of per-chunk files —
  same layout and rationale as gen_sf1.py: a single COPY of a 1000-way
  UNION ALL buffers the whole result before writing a byte.)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sw1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
# the 2-char base-31 tag and the [5,2] GF(31) codeword address at most
# 31^2 copies; a longer tag would change word lengths and break
# cross-decade comparability, so the cap is hard (use 960 for the
# "sf100" decade — a 9.6x step; normalize factors by the actual ratio)
assert COPIES <= 961, f"copies={COPIES} exceeds the 31^2 tag space"

# the fixture corpus's closed vocabulary (dev-time check:
# SELECT DISTINCT unnest(string_split(text,' ')) over sf0.1 = these 31)
VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast the row agg key query a scan batch dup").split()
P = len(VOCAB)  # 31, prime


ALPHA = "0123456789abcdefghijklmnopqrstu"  # 31 symbols


def tag(i):
    """2-char copy tag (base-31)."""
    return ALPHA[i // P] + ALPHA[i % P]


def codeword(i):
    """[5,2] MDS codeword over GF(31) for copy i = (x, y): symbols
    (x, x+y, x+2y, x+3y, x+4y) mod 31 — the degree-<=1 polynomial x+ky
    evaluated at k = 0..4, so any two distinct codewords differ in >= 4
    of 5 positions, far beyond the edit join's k=2."""
    x, y = i % P, i // P
    return "".join(ALPHA[(x + k * y) % P] for k in range(5))


def doc_select(i):
    cases = " ".join(f"WHEN '{w}' THEN '{w}_{tag(i)}'" for w in VOCAB)
    t = ("array_to_string(list_transform(string_split(text, ' '), "
         f"w -> CASE w {cases} ELSE w END), ' ')")
    t = f"'{codeword(i)} ' || {t}"
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


def orders_select(i):
    # graph decade (q199/q201): customers and orders are copy-offset (the
    # customer side of the bipartite graph grows linearly in copies) while
    # l_suppkey stays SHARED across copies, so supplier hub in-degree grows
    # x copies — the honest skew shape for a growing corpus, unlike
    # gen_sf1's disjoint-copy graphs. Strides leave headroom: o_orderkey
    # max 6e5 + 960*1e7 < 1e10; o_custkey max 1.5e4 + 960*1e6 < 1e9, far
    # under custSuppGraph's 1e12 supplier-node offset guard.
    return (f"SELECT * REPLACE (o_orderkey + {i * 10_000_000} AS o_orderkey, "
            f"o_custkey + {i * 1_000_000} AS o_custkey) "
            f"FROM read_parquet('{SRC}/orders.parquet')")


def lineitem_select(i):
    # l_suppkey deliberately NOT offset — see orders_select
    return (f"SELECT * REPLACE (l_orderkey + {i * 10_000_000} AS l_orderkey) "
            f"FROM read_parquet('{SRC}/lineitem.parquet')")


def main():
    import shutil
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # a 1000-copy fixture unrolls into a 1000-way UNION ALL; the default
    # parser depth limit rejects it (same as gen_sf1.py)
    con.execute("SET max_expression_depth TO 250000")
    CHUNK = 50
    all_tables = [("documents", doc_select), ("part", part_select),
                  ("embeddings", emb_select), ("orders", orders_select),
                  ("lineitem", lineitem_select)]
    # optional 3rd arg: comma-separated table filter (like gen_sf1.py) —
    # orders/lineitem are OFF by default (graph-sweep-only; the similarity
    # sweeps symlink them from sf0.1)
    want = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["documents", "part", "embeddings"])
    unknown = set(want) - {t for t, _ in all_tables}
    assert not unknown, f"unknown table(s) {sorted(unknown)}; " \
        f"choose from {[t for t, _ in all_tables]}"
    for table, sel in [(t, f) for t, f in all_tables if t in want]:
        path = f"{OUT}/{table}.parquet"
        if COPIES <= CHUNK:
            # a prior chunked fixture at this path is a DIRECTORY; COPY to
            # a single file needs it gone
            if os.path.isdir(path):
                shutil.rmtree(path)
            union = " UNION ALL ".join(sel(i) for i in range(COPIES))
            con.execute(f"COPY ({union}) TO '{path}' (FORMAT PARQUET)")
        else:
            # chunked: bounded generator memory; clear stale chunks and a
            # conflicting single-file fixture (threshold crossings)
            if os.path.isfile(path):
                os.remove(path)
            if os.path.isdir(path):
                for f in os.listdir(path):
                    if f.startswith("chunk_") and f.endswith(".parquet"):
                        os.remove(os.path.join(path, f))
            os.makedirs(path, exist_ok=True)
            for lo in range(0, COPIES, CHUNK):
                hi = min(lo + CHUNK, COPIES)
                union = " UNION ALL ".join(sel(i) for i in range(lo, hi))
                con.execute(f"COPY ({union}) TO "
                            f"'{path}/chunk_{lo:05d}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}"
            + ("/*.parquet" if COPIES > CHUNK else "") + "')").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
