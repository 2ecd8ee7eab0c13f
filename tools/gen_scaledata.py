#!/usr/bin/env python3
"""Generate the K-times scaled documents corpus ScaleCurve measures.

Usage: python3 tools/gen_scaledata.py [K] [baseDir] [outDir]

K independent token-remapped copies of the base documents table:
copy 0 is the original; copies 1..K-1 prefix every token boundary with
a copy tag ('cKz'), so cross-copy shingle collisions are zero while
each copy preserves the full within-copy duplicate structure (exact
dups, near-dups, containment). doc_id offsets are multiples of 10 so
the mod-10 batch/probe carves used by the incremental queries scale
with the data. This is the honest load shape for a dedup scaling
curve: a Kx corpus with Kx the dup mass.
"""
import sys
import duckdb

k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/scaledata/sf0.5"

import os
os.makedirs(out, exist_ok=True)
duckdb.sql(f"""
COPY (
  SELECT doc_id + k*10000000 AS doc_id,
         CASE WHEN k = 0 THEN text
              ELSE 'c' || k || 'z ' || replace(text, ' ', ' c' || k || 'z')
         END AS text,
         lang, source,
         CASE WHEN k = 0 THEN n_chars
              ELSE len('c' || k || 'z ' || replace(text, ' ', ' c' || k || 'z'))
         END AS n_chars
  FROM '{base}/documents.parquet', (SELECT unnest(range({k})) AS k)
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = duckdb.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"{out}/documents.parquet: {n} docs ({k} copies of {base})")

# Embeddings: K copies with vec_id offsets; copy 0 is the original,
# copies 1..K-1 get a deterministic dimension ROTATION plus per-(copy,
# dim) sign flips. That preserves each copy's full within-copy geometry
# (norms, pairwise cosines -> the same near-dup/centroid/covariance
# structure per copy) while making cross-copy cosines incoherent
# (~N(0, 1/dim), i.e. sigma = 0.125 at dim 64). Incoherent is NOT
# negligible at every threshold: with K^2 n^2 / 2 cross-copy pairs the
# N(0, 1/dim) tail above a MID threshold (0.45 = 3.6 sigma) contributes
# a quadratically-growing chance-pair population -- exactly as it would
# in a real Kx corpus of independent documents, since 0.45 is below the
# chance floor of 64-dim geometry at these pair counts. High thresholds
# (>= 0.75, i.e. 6 sigma) stay effectively collision-free. So the
# copies are the honest load at every threshold: linear true-dup mass,
# plus the chance mass any corpus of this size carries.
duckdb.sql(f"""
COPY (
  SELECT vec_id + k*10000000 AS vec_id,
         CASE WHEN k = 0 THEN embedding
              ELSE list_transform(range(len(embedding)),
                i -> CAST(embedding[((i + 7*k) % len(embedding)) + 1]
                     * (CASE WHEN (hash(k*1000003 + i) & 1) = 1
                        THEN -1 ELSE 1 END) AS FLOAT))
         END AS embedding,
         label
  FROM '{base}/embeddings.parquet', (SELECT unnest(range({k})) AS k)
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
ne = duckdb.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
print(f"{out}/embeddings.parquet: {ne} vectors ({k} copies of {base})")
