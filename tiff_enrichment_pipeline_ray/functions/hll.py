"""HyperLogLog cardinality sketch (numpy, mergeable registers).

Approximate COUNT DISTINCT for the training-data suite (the reference only
counts exactly — create-tables.sql distinct views; this is the scale path:
at 100 TB an exact distinct is an all-to-all shuffle of every key, while HLL
ships one 2^p-byte register array per (group × block) and merges with an
elementwise max — associative, commutative, idempotent).

Standard HLL per Flajolet et al. 2007 with the small-range linear-counting
correction; deterministic (splitmix64 of the key), so results are stable
across runs/partitionings. Typical error 1.04/sqrt(2^p) ≈ 1.6% at p=12.
"""

from __future__ import annotations

import numpy as np


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 finalizer constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def registers(keys: np.ndarray, p: int = 12) -> np.ndarray:
    """(2^p,) uint8 register array for an int-like key array.

    Bit-exact rank: the tail's first-set-bit index is found via unpackbits
    (no float log2 — exact at power-of-two boundaries)."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(keys) == 0:
        return reg
    h = _splitmix64(np.asarray(keys, dtype=np.int64).astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    bits = np.unpackbits(h.byteswap().view(np.uint8).reshape(-1, 8), axis=1)
    tail = bits[:, p:]  # (n, 64-p) big-endian bit view of the tail
    nonzero = tail.any(axis=1)
    first = np.argmax(tail, axis=1)  # index of first set bit (0 if none)
    rank = np.where(nonzero, first + 1, tail.shape[1] + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear counting below 2.5·m."""
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = float(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting (small-range)
    return float(est)
