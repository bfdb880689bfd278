"""t-digest quantile sketch (vectorized merging variant, mergeable).

The scale path for percentiles at extreme group cardinality: exact per-group
quantiles (events_value_percentiles, band_stats_by_class) hold a whole group
in one map_groups call; a t-digest instead ships O(delta) centroids per
(group × block) and merges associatively — the same partial/merge shape as
the HLL sketch (functions/hll.py) and the A5 histogram partials.

Variant implemented: Dunning's merging t-digest with the k1 scale function
k(q) = (δ/2π)·asin(2q−1), built by BINNING sorted points on floor(k(q_mid))
— one vectorized pass (sort + cumsum + reduceat), no per-point Python loop.
Binning on the scale function preserves the t-digest size/accuracy shape
(≤ ~δ centroids; relative rank error ~O(1/δ), tightest at the tails) and is
deterministic for a given multiset, independent of block partitioning order
(merges re-sort by centroid mean and re-bin on exact cumulative weights).

References: Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests" (arXiv:1902.04023); scale-function family ibid. §2.
"""

from __future__ import annotations

import numpy as np


def _kscale(q: np.ndarray, delta: float) -> np.ndarray:
    """k1 scale function; monotone [0,1] → [−δ/4, +δ/4]."""
    q = np.clip(q, 0.0, 1.0)
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)


def build(values: np.ndarray, delta: float = 200.0,
          weights: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(means, weights) centroid arrays for a value sample.

    Sort → midpoint quantiles → bin by floor(k(q)) → per-bin weighted mean.
    Also used for MERGING: pass existing centroid means as ``values`` with
    their ``weights`` (sorted-by-mean concat happens here via argsort).
    """
    v = np.asarray(values, dtype=np.float64)
    if v.size == 0:
        return (np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64))
    w = (np.ones_like(v) if weights is None
         else np.asarray(weights, dtype=np.float64))
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    total = w.sum()
    cum = np.cumsum(w)
    q_mid = (cum - 0.5 * w) / total
    bins = np.floor(_kscale(q_mid, delta)).astype(np.int64)
    # boundaries where the bin id changes → reduceat segments
    starts = np.flatnonzero(np.r_[True, bins[1:] != bins[:-1]])
    seg_w = np.add.reduceat(w, starts)
    seg_vw = np.add.reduceat(v * w, starts)
    return seg_vw / seg_w, seg_w


def merge(parts: list[tuple[np.ndarray, np.ndarray]],
          delta: float = 200.0) -> tuple[np.ndarray, np.ndarray]:
    """Merge centroid sets (associative/commutative up to re-binning)."""
    means = np.concatenate([p[0] for p in parts]) if parts else np.empty(0)
    weights = np.concatenate([p[1] for p in parts]) if parts else np.empty(0)
    return build(means, delta=delta, weights=weights)


def quantile(means: np.ndarray, weights: np.ndarray,
             q: float | np.ndarray) -> np.ndarray:
    """Interpolated quantile(s) from centroids (midpoint rule)."""
    if len(means) == 0:
        return np.full(np.shape(q) or (), np.nan)
    cum = np.cumsum(weights) - 0.5 * weights
    total = weights.sum()
    return np.interp(np.asarray(q, dtype=np.float64) * total, cum, means)
