#!/usr/bin/env python3
"""Dev-only: deterministic inflated EMBEDDING corpora for the
embedding-family scale check (SCALE.md third table). Replica k applies
a cyclic dimension SHIFT of k to every vector:

 - norm-preserving, and the coordinate distribution is shift-invariant,
   so the corpus GEOMETRY (cell structure under k-means/IVF, LSH bucket
   occupancy) is statistically unchanged — cells grow in POPULATION,
   not shape, which is exactly the regime the within-cell-quadratic
   claim must be measured in;
 - the autocorrelation of the synthetic unit vectors at lag k is ~0, so
   replica copies of the same base vector are NOT near-dups of each
   other (inflation multiplies volume, not pair density — the same
   property the shingle corpora get from token suffixing).

vec_id offsets by k*100000000, so `vec_id < 16`-style seed/query-slice
selections keep selecting base-replica vectors at every scale.

Usage: tools/gen_scale_embeddings.py [baseSfDir] [outRoot]
"""
import os
import sys

import duckdb

base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outroot = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale"

for k_factor in (1, 4, 8):
    out = f"{outroot}/x{k_factor}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
      COPY (
        SELECT vec_id + k * 100000000 AS vec_id,
               CASE WHEN embedding IS NULL THEN NULL ELSE
                 list_concat(embedding[(k % 64) + 1:],
                             embedding[1:(k % 64)]) END AS embedding,
               -- replica labels are DISTINCT (offset k*1000): each
               -- replica's classes keep the base geometry under its own
               -- shift, and the label POPULATION grows linearly — the
               -- regime a per-label audit (q157) must be measured in
               -- (sharing labels across shifted replicas would smear
               -- every class across k rotations instead)
               label + k * 1000 AS label
        FROM '{base}/embeddings.parquet', range(0, {k_factor}) r(k)
        ORDER BY vec_id
      ) TO '{out}/embeddings.parquet' (FORMAT parquet)
    """)
    n, d = con.execute(
        f"SELECT count(*), min(len(embedding)) FROM '{out}/embeddings.parquet'").fetchone()
    print(f"{out}: {n} vectors, min dim {d}")
