"""Similarity search over embedding columns: brute-force baseline + IVF.

- Brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (the exact baseline; used by the `ann_topk_cosine` driver query).
- IVF (inverted-file) scale path: deterministic seeded k-means (Lloyd, fixed
  iterations) trained on a sample → every vector assigned to its nearest
  centroid inside map_batches → the search probes the `nprobe` nearest
  centroid lists only. Partitioning assumption: centroid id is the shuffle /
  locality key; at cluster scale the lists are hash-partitioned datasets and
  a query touches nprobe partitions instead of all of them.

Recall vs brute force is asserted in tests (not a SQL oracle — approximate
by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def kmeans_fit(X: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd iterations; returns (k, d) float32 centroids."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, dtype=np.float32)
    idx = rng.choice(len(X), size=min(k, len(X)), replace=False)
    C = X[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(len(C)):
            m = a == j
            if m.any():
                C[j] = X[m].mean(0)
    return C


def assign_batch(df: pd.DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding") -> pd.DataFrame:
    X = np.stack(df[vec_col].to_numpy()).astype(np.float32)
    d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    df = df.copy()
    df["centroid"] = d.argmin(1).astype(np.int64)
    return df


class IVFIndex:
    """Driver-side IVF over a (small enough to gather) embedding table; the
    distributed variant keeps each `lists[j]` as one Dataset partition."""

    def __init__(self, ids: np.ndarray, X: np.ndarray, k: int = 16,
                 seed: int = 42):
        X = np.asarray(X, dtype=np.float32)
        self.centroids = kmeans_fit(X, k, seed=seed)
        d = ((X[:, None, :] - self.centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        self.lists = {}
        for j in range(len(self.centroids)):
            m = assign == j
            self.lists[j] = (np.asarray(ids)[m], X[m])

    def search(self, q: np.ndarray, topk: int = 10, nprobe: int = 4):
        q = np.asarray(q, dtype=np.float32)
        cd = ((self.centroids - q[None, :]) ** 2).sum(-1)
        probe = np.argsort(cd, kind="stable")[:nprobe]
        cand_ids, cand_sims = [], []
        qn = np.sqrt((q * q).sum())
        for j in probe:
            ids, X = self.lists[int(j)]
            if len(ids) == 0:
                continue
            norms = np.sqrt((X * X).sum(1))
            sims = (X @ q) / (np.where(norms == 0, 1, norms) * (qn or 1.0))
            cand_ids.append(ids)
            cand_sims.append(sims)
        if not cand_ids:
            return np.empty(0, dtype=np.int64), np.empty(0)
        ids = np.concatenate(cand_ids)
        sims = np.concatenate(cand_sims)
        order = np.lexsort((ids, -sims))[:topk]
        return ids[order], sims[order]


def ann_ivf_topk(sf_dir: str, topk: int = 10, nprobe: int = 4):
    """Driver query: IVF top-k for the min-vec_id query vector.

    Build path is distributed (assignment via map_batches over the Dataset);
    the gathered per-list arrays stand in for list-partitioned datasets at
    this fixture scale."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    X = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    qpos = int(np.argmin(ids))
    q = X[qpos]
    mask = np.arange(len(ids)) != qpos
    idx = IVFIndex(ids[mask], X[mask], k=16)
    got_ids, sims = idx.search(q, topk=topk, nprobe=nprobe)
    return pd.DataFrame({"vec_id": got_ids.astype(np.int64),
                         "cosine_sim": np.round(sims, 6)})
