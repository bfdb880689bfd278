"""Dedup sketches: shingles, MinHash, SimHash, n-gram Jaccard (numpy).

Near-dedup primitives for the `documents` table at training-data scale
(the reference only does exact checksum dedup — create-tables.sql:253,
SURVEY §2.5 A7 — these extend it per the engine's charter):

- shingle_set: word k-shingles hashed to uint64.
- minhash_signature: P independent permutations via (a·x+b) mod prime —
  mergeable, band-able for LSH (band/bucket groupby is the shuffle).
- simhash64: 64-bit hyperplane sign sketch over shingle hashes.
- jaccard: exact set Jaccard for candidate verification.

All hashing is blake2b-seeded and deterministic across processes
(PYTHONHASHSEED-independent — never use builtin hash()).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def _hash64(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of word k-shingles (unique, sorted)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array([_hash64(s) for s in shingles], dtype=np.uint64))


def minhash_params(n_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 signature; empty shingle set → all MERSENNE."""
    n_perm = len(a)
    if len(sh) == 0:
        return np.full(n_perm, _MERSENNE, dtype=np.uint64)
    x = sh[:, None].astype(np.uint64)
    hv = (x * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def lsh_band_keys(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """Hash each band of the signature → (n_bands,) int64 bucket keys."""
    rows = len(sig) // n_bands
    keys = np.empty(n_bands, dtype=np.int64)
    for bi in range(n_bands):
        band = sig[bi * rows:(bi + 1) * rows].tobytes()
        h = hashlib.blake2b(band, digest_size=8).digest()
        keys[bi] = int.from_bytes(h, "big") >> 1
    return keys


def simhash64(sh: np.ndarray) -> np.int64:
    """64-bit sign sketch of the shingle-hash multiset."""
    if len(sh) == 0:
        return np.int64(0)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    word = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            word |= np.uint64(1) << np.uint64(i)
    return np.int64(word >> np.uint64(1))  # keep sign-safe 63 bits


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt[nz] += 1
        x = x & (x - np.uint64(1))
    return cnt


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0
