#!/usr/bin/env python3
"""Generate a CLUSTERED embeddings fixture for the ANN ladder.

Usage: python3 tools/gen_clustered.py [nVec] [outDir] [nClusters] [seed]

The testdata embeddings are isotropic gaussians (no cluster structure),
so an IVF coarse quantizer cannot beat probe-all there: every cell
boundary cuts through neighbor neighborhoods uniformly, and the honest
registered default probes every cell (see BASELINE.md "IVF sweep").
Real embedding corpora are clustered -- that is the regime IVF is FOR.
This generator produces the mixture-of-gaussians load that regime
implies:

  - nClusters centers drawn uniform on the unit sphere (seeded, so the
    fixture is reproducible byte-for-byte given numpy's stable RNG);
  - each vector = its cluster center + isotropic noise with sigma
    chosen so same-cluster cosines concentrate near 0.8 and
    cross-cluster cosines near 0 (sigma = 0.5/sqrt(dim) per axis gives
    E[cos(v, center)] ~ 1/sqrt(1+0.25) ~ 0.89);
  - schema identical to the testdata embeddings table
    (vec_id: int64, embedding: list<float32>, label: int32 = cluster),
    so every registered vector query runs on it unchanged.

AnnRecall (and any registered query) can then point at the output dir:
  sbt "runMain graft.AnnRecall /root/repo/scaledata/clustered"
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/clustered"
n_clusters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
dim = 64

rng = np.random.default_rng(seed)
centers = rng.standard_normal((n_clusters, dim))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
label = rng.integers(0, n_clusters, size=n)
noise = rng.standard_normal((n, dim)) * (0.5 / np.sqrt(dim))
emb = (centers[label] + noise).astype(np.float32)

os.makedirs(out, exist_ok=True)
table = pa.table({
    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
    "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
    "label": pa.array(label.astype(np.int32)),
})
pq.write_table(table, f"{out}/embeddings.parquet")
# sanity: report the cosine separation the fixture achieves
a, b = emb[:500], emb[500:1000]
norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)
cos = norm(a) @ norm(b).T
same = label[:500, None] == label[500:1000][None, :]
print(f"{out}/embeddings.parquet: {n} vectors, {n_clusters} clusters; "
      f"same-cluster cos ~ {cos[same].mean():.3f}, "
      f"cross ~ {cos[~same].mean():.3f}")
