#!/usr/bin/env python3
"""Planted-neighbors embedding fixture for the ANN recall metrics.

The driver corpus embeddings are near-random, so recall@10 sits at its
floor for any truncating method (q_vec_prefix_recall = 0.1 there) and a
regression is indistinguishable from noise. This fixture plants known
geometry: probe vec_id=0 has exactly ten engineered nearest neighbors
(vec_id 1..10, tiny isotropic perturbations of the probe direction),
the rest of its cluster sits measurably farther, and 24 other clusters
are near-orthogonal 64-dim directions. Exact top-10 is therefore ids
1..10 BY CONSTRUCTION, and a correct IVF/PQ/prefix search must recover
most of them — PlantedGeometrySpec asserts the sharp bounds.

Deterministic (fixed seed). Usage:
  python3 tools/make_planted_embeddings.py <outDir>
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N, DIM, K = 500, 64, 25


def main(out):
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260814)
    centers = rng.standard_normal((K, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    vecs, labels = [], []
    # cluster 0: probe + 10 planted near neighbors + 14 far members
    vecs.append(centers[0]); labels.append(0)
    for _ in range(10):
        v = centers[0] + 0.03 * rng.standard_normal(DIM)
        vecs.append(v); labels.append(0)
    for _ in range(14):
        v = centers[0] + 0.40 * rng.standard_normal(DIM)
        vecs.append(v); labels.append(0)
    # clusters 1..24: ~20 members each, moderate spread
    rest = N - len(vecs)
    for i in range(rest):
        c = 1 + (i % (K - 1))
        v = centers[c] + 0.20 * rng.standard_normal(DIM)
        vecs.append(v); labels.append(c)

    emb = np.asarray(vecs, dtype=np.float32)
    cos = (emb @ emb[0]) / (np.linalg.norm(emb, axis=1) * np.linalg.norm(emb[0]))
    top10 = np.argsort(-cos[1:])[:10] + 1
    assert sorted(top10.tolist()) == list(range(1, 11)), top10

    table = pa.table({
        "vec_id": pa.array(range(N), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(table, f"{out}/embeddings.parquet")
    print(f"wrote planted embeddings to {out}: exact top-10 of probe 0 is ids 1..10")


if __name__ == "__main__":
    main(sys.argv[1])
