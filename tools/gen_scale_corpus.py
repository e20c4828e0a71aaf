#!/usr/bin/env python3
"""Dev-only: deterministic inflated corpora for the shingle/CC scale
check (SCALE.md). Each replica k suffixes every token with `~k`, so:
 - replicas are mutually shingle-disjoint (no cross-replica near-dups:
   inflation multiplies VOLUME, not pair density — the quantity a
   scaling-exponent measurement needs held fixed);
 - the within-replica near-dup structure of the base corpus is
   preserved exactly (token-level suffixing is a bijection on shingles).
The x1 corpus goes through the same transform (suffix `~0`), so sizes
differ only in volume. NOT part of the shipped engine (driver-side
python, like tools/selfcheck.py).

Usage: tools/gen_scale_corpus.py [baseSfDir] [outRoot]
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
        SELECT doc_id + k * 100000000 AS doc_id,
               CASE WHEN text IS NULL THEN NULL ELSE
                 array_to_string(list_transform(string_split_regex(text, '\\s+'),
                   t -> t || '~' || CAST(k AS VARCHAR)), ' ') END AS text,
               lang, source, n_chars
        FROM '{base}/documents.parquet', range(0, {k_factor}) r(k)
        ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT parquet)
    """)
    n = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"{out}: {n} docs")
