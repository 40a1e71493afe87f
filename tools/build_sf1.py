#!/usr/bin/env python3
"""Build the /tmp/sf1 10x key-shifted scale-up of /root/testdata/sf0.1.

The driver generates testdata only up to sf0.1 (read-only tree); the
empirical big-decade slope gate (Bench's SPARK_GRAFT_SF1_DIR block)
needs a ~10x larger input. Each table is UNION ALL'd `copies` times
with every KEY domain offset by i*1e8 per copy — referential integrity
holds within each copy, fixed vocabularies/dims stay fixed (the same
linear-scaling shape as the generator), region/nation copy once.

Documents get one extra treatment (round 8): copy i > 0 rewrites every
text token with an INJECTIVE per-copy renaming (prefix `c<i>`). A
token renaming preserves word-shingle Jaccard exactly WITHIN a copy and
zeroes it ACROSS copies, so the near-dup pair density scales exactly
linearly with the corpus (10x docs -> 10x near-dup pairs) — without it,
every doc had 9 exact clones and candidate pairs grew ~100x, which made
the near-dup dedup family's slope measure the scale-up's artifact, not
the algorithm. Results at sf1 are still only for TIMING (the judged
result sets live at the driver SFs).

Usage: python3 tools/build_sf1.py [src] [dst] [key_offset]

Second decade (round 9): the same script stacks — build /tmp/sf10 FROM
/tmp/sf1 with a larger per-copy key offset so the shifted key domains
cannot collide with sf1's (which already span ~10*1e8):

    python3 tools/build_sf1.py /tmp/sf1 /tmp/sf10 10000000000

The token renaming composes injectively (copy j of an sf1 copy-i doc
carries c<j>-prefixed c<i>-tokens), so near-dup density stays linear
across both decades.
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
OFF = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000_000
copies = 10

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def scale(table, keyed_cols, rewrite=None):
    """Union `copies` key-shifted copies of a table. `rewrite` maps
    column -> (lambda i: sql_expr) for per-copy value perturbation."""
    cols = con.execute(f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").df()
    names = list(cols.column_name)
    parts = []
    for i in range(copies):
        sel = []
        for c in names:
            if c in keyed_cols:
                sel.append(f"{c} + {i * OFF} AS {c}")
            elif rewrite and c in rewrite and i > 0:
                sel.append(f"{rewrite[c](i)} AS {c}")
            else:
                sel.append(c)
        parts.append(f"SELECT {', '.join(sel)} FROM '{src}/{table}.parquet'")
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(table, n)


# fixed dims: copy once
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

scale("customer", {"c_custkey"})
scale("supplier", {"s_suppkey"})
scale("part", {"p_partkey"})  # p_name vocab stays fixed, like the generator
scale("orders", {"o_orderkey", "o_custkey"})
scale("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
scale("events", {"event_id", "user_id"})
# injective per-copy token renaming: shingle structure preserved within
# a copy, decorrelated across copies -> near-dup density scales linearly
scale("documents", {"doc_id"}, rewrite={
    "text": lambda i: rf"regexp_replace(text, '(\S+)', 'c{i}\1', 'g')"})
scale("embeddings", {"vec_id"})
