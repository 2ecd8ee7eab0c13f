#!/usr/bin/env python3
"""Dense-id renumber of a scaled documents table, for the watermarked
streaming near-dup (it requires doc_ids 0..n-1: ts = doc_id * step).

Usage: python3 tools/gen_densedocs.py <inDir> <outDir> [layout]

Two layouts, two complementary load shapes for the eviction window:
  adjacent  — new_id = orig_within_copy * K + copy: every doc's K
              copies are CONSECUTIVE ids, so the whole duplicate set
              lands inside the lateness window. Output ≈ the full
              near-dup pair mass — the total-overlap stress shape
              (the r17 sf10dense leg: 719x output at 100x data).
  copymajor — new_id = copy * n + orig: duplicates across copies sit
              n ids (= n*step seconds of event time) apart, far outside
              the lateness window, so the watermark EVICTS them and the
              emitted set is ~the within-copy mass per copy — the shape
              that shows state and output staying O(window), not
              O(corpus).
"""
import sys
import duckdb
import os

ind = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf10"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/sf10densecm"
layout = sys.argv[3] if len(sys.argv) > 3 else "copymajor"

os.makedirs(out, exist_ok=True)
# gen_scaledata ids are orig + copy*10000000: recover (copy, orig)
order = ("(doc_id % 10000000) * 1000 + (doc_id // 10000000)"
         if layout == "adjacent" else "doc_id")
duckdb.sql(f"""
COPY (
  SELECT row_number() OVER (ORDER BY {order}) - 1 AS doc_id,
         text, lang, source, n_chars
  FROM '{ind}/documents.parquet'
  ORDER BY 1
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = duckdb.sql(f"SELECT count(*), max(doc_id) FROM '{out}/documents.parquet'").fetchone()
print(f"{out}/documents.parquet: {n[0]} docs dense 0..{n[1]} ({layout})")
