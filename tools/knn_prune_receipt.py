#!/usr/bin/env python3
"""Receipt for the r19 decision NOT to add an IVF/triangle-inequality
candidate prune to the exact-kNN family (r18 verdict item #5).

An oracle-exact prune must keep every corpus vector whose distance lower
bound LB = ||q - c_j|| - r_j is <= the probe's exact kth-NN distance d_k
(normalized vectors: cosine kNN == Euclidean kNN). This script measures, on
the actual benchmark corpus, the fraction of (probe, cluster) pairs such a
prune could discard under the most favorable clustering we can build
(k-means, C configurable, 10 Lloyd iterations).

Result on /root/testdata/sf0.1/embeddings.parquet (2000 x 64, the
q_triangle_count/q_link_predict/q_knn_classify/q_mutual_knn/q_transitivity
input): the corpus is ISOTROPIC -- per-cluster radii ~0.97 on the unit
sphere vs probe->centroid distances ~1.4 and d_5 ~ 1.14, so
LB = 1.4 - 0.97 = 0.43 << d_5 for EVERY pair: prunable fraction 0.0000 at
C in {16, 64, 256}. An exact prune provably scans the full corpus anyway
and adds two extra passes (centroid build + bound computation) on top.

Usage: python3 tools/knn_prune_receipt.py [sf-dir] [C ...]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cs = [int(c) for c in sys.argv[2:]] or [16, 64, 256]

t = pq.read_table(f"{sf}/embeddings.parquet")
E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
En = E / np.linalg.norm(E, axis=1, keepdims=True)
n = len(En)
q = En[:200]  # the family's probe slice (vec_id < 200)

D = np.linalg.norm(q[:, None, :] - En[None, :, :], axis=2)
for i in range(len(q)):
    D[i, i] = np.inf  # self-pair excluded, as in Ann.knnGraph
d5 = np.sort(D, axis=1)[:, 4]
print(f"corpus {n} x {En.shape[1]}; exact k=5 NN distance: "
      f"mean {d5.mean():.3f} min {d5.min():.3f} max {d5.max():.3f}")

for C in cs:
    rng = np.random.RandomState(0)
    cent = En[rng.choice(n, C, replace=False)].copy()
    for _ in range(10):
        a = np.argmin(np.linalg.norm(En[:, None, :] - cent[None, :, :], axis=2), axis=1)
        for j in range(C):
            if (a == j).any():
                cent[j] = En[a == j].mean(0)
    asg = np.argmin(np.linalg.norm(En[:, None, :] - cent[None, :, :], axis=2), axis=1)
    r = np.array([np.linalg.norm(En[asg == j] - cent[j], axis=1).max()
                  if (asg == j).any() else 0.0 for j in range(C)])
    qc = np.linalg.norm(q[:, None, :] - cent[None, :, :], axis=2)
    lb = np.maximum(0.0, qc - r[None, :])
    prunable = (lb > d5[:, None]).mean()
    print(f"C={C:4d}: radii mean {r.mean():.3f} min {r.min():.3f}; "
          f"prunable (probe,cluster) fraction {prunable:.4f}")
