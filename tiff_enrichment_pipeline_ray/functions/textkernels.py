"""Text-analysis kernels for the training-data operators (vectorized pandas).

These power the `documents`-table pipelines (dedup, language-ID, quality
scoring, token counting, fingerprinting) that a 100 TB training-data run needs
alongside the image enrichment. Definitions are chosen to be exactly
SQL-expressible where an oracle exists (see pipelines/oracles.py), i.e. pure
integer counts / deterministic string ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "that", "it", "for")

# language → marker words (tiny deterministic n-gram-free heuristic; rows-only
# correctness — validated against the documents.lang column in tests)
_LANG_MARKERS = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " la ", " et "),
    "es": (" el ", " los ", " que "),
    "nl": (" de ", " het ", " een "),
}


def md5_hex(series: pd.Series) -> pd.Series:
    """MD5 hex digest per row — matches DuckDB's md5() for the SQL oracle."""
    return series.fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


def token_count(series: pd.Series) -> np.ndarray:
    """len(text.split(' ')) — single-space split, = DuckDB
    len(string_split(text, ' '))."""
    return series.fillna("").str.split(" ").map(len).to_numpy(dtype=np.int64)


def quality_counts(series: pd.Series) -> dict:
    """Integer quality features (all SQL-expressible):
    n_chars, n_spaces, n_periods, n_commas, n_digits, n_upper."""
    s = series.fillna("")
    return {
        "n_chars": s.str.len().to_numpy(dtype=np.int64),
        "n_spaces": s.str.count(" ").to_numpy(dtype=np.int64),
        "n_periods": s.str.count(r"\.").to_numpy(dtype=np.int64),
        "n_commas": s.str.count(",").to_numpy(dtype=np.int64),
        "n_digits": s.str.count(r"[0-9]").to_numpy(dtype=np.int64),
        "n_upper": s.str.count(r"[A-Z]").to_numpy(dtype=np.int64),
    }


def quality_score(series: pd.Series) -> np.ndarray:
    """Composite [0,1] heuristic: penalize very short docs, high digit/punct
    ratios, low stopword presence. Deterministic float64."""
    s = series.fillna("")
    n = s.str.len().to_numpy(dtype=np.float64)
    words = token_count(s).astype(np.float64)
    digits = s.str.count(r"[0-9]").to_numpy(dtype=np.float64)
    low = s.str.lower()
    stop_hits = np.zeros(len(s), dtype=np.float64)
    for w in _STOPWORDS[:5]:
        stop_hits += low.str.count(rf"\b{w}\b").to_numpy(dtype=np.float64)
    len_score = np.clip(n / 200.0, 0.0, 1.0)
    digit_pen = np.clip(1.0 - 3.0 * digits / np.maximum(n, 1.0), 0.0, 1.0)
    stop_score = np.clip(stop_hits / np.maximum(words * 0.05, 1.0), 0.0, 1.0)
    return (0.4 * len_score + 0.3 * digit_pen + 0.3 * stop_score)


def lang_id(series: pd.Series) -> pd.Series:
    """Marker-word language heuristic → 'en'/'de'/'fr'/'es'/'nl'/'und'."""
    s = " " + series.fillna("").str.lower() + " "
    scores = np.zeros((len(s), len(_LANG_MARKERS)), dtype=np.int64)
    langs = list(_LANG_MARKERS)
    for j, lg in enumerate(langs):
        for marker in _LANG_MARKERS[lg]:
            scores[:, j] += s.str.count(marker).to_numpy(dtype=np.int64)
    best = scores.argmax(axis=1)
    hit = scores.max(axis=1) > 0
    out = np.where(hit, np.array(langs)[best], "und")
    return pd.Series(out, index=series.index)


def repetition_stats(series: pd.Series) -> dict:
    """Gopher-style per-doc repetition signals (exact integer counts):
    n_words (single-space split, = token_count), n_distinct (unique words),
    top_cnt (occurrences of the most frequent word). Fully vectorized: the
    batch's words are factorized once, (row, word) pair counts come from one
    np.unique, and the per-row max/nunique from reduceat over the row-sorted
    pair table. Every doc has >= 1 token (''.split(' ') == ['']), so row
    boundaries are total."""
    toks = series.fillna("").str.split(" ")
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    n = len(series)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return {"n_words": z, "n_distinct": z, "top_cnt": z}
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = np.asarray([w for t in toks for w in t], dtype=object)
    codes, uniq = pd.factorize(flat)
    key = rows * np.int64(len(uniq)) + codes
    uk, cnts = np.unique(key, return_counts=True)      # sorted → rows contiguous
    urow = uk // np.int64(len(uniq))
    starts = np.searchsorted(urow, np.arange(n, dtype=np.int64))
    n_distinct = np.diff(np.append(starts, len(urow))).astype(np.int64)
    top_cnt = np.maximum.reduceat(cnts, starts).astype(np.int64)
    return {"n_words": lens, "n_distinct": n_distinct, "top_cnt": top_cnt}


# PII patterns — shared verbatim by the DuckDB oracle (both Python re and
# RE2 give identical matches for these: character classes + bounded repeats,
# no ambiguous alternation). Redaction order is EMAIL → IP → PHONE.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(series: pd.Series):
    """(n_emails, n_phones, n_ips, cleaned) — counts are non-overlapping
    matches on the ORIGINAL text (= DuckDB len(regexp_extract_all(...)));
    cleaned applies the three redactions in fixed order EMAIL → IP → PHONE
    (= nested regexp_replace(..., 'g'))."""
    s = series.fillna("")
    n_emails = s.str.count(PII_EMAIL).to_numpy(dtype=np.int64)
    n_phones = s.str.count(PII_PHONE).to_numpy(dtype=np.int64)
    n_ips = s.str.count(PII_IP).to_numpy(dtype=np.int64)
    cleaned = (s.str.replace(PII_EMAIL, "<EMAIL>", regex=True)
                .str.replace(PII_IP, "<IP>", regex=True)
                .str.replace(PII_PHONE, "<PHONE>", regex=True))
    return n_emails, n_phones, n_ips, cleaned


def fingerprint64(series: pd.Series) -> np.ndarray:
    """Deterministic 64-bit document fingerprint: blake2b-8 of the text."""
    return series.fillna("").map(
        lambda t: int.from_bytes(hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big") >> 1
    ).to_numpy(dtype=np.int64)


def edit1_mask(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """``levenshtein(a, b) == 1``, vectorized over ASCII string pairs.

    The SymSpell verify kernel: distance exactly 1 iff (same length and
    exactly one substituted position) or (length diff 1 and deleting the
    FIRST mismatching character of the longer yields the shorter — if a
    later deletion position works, the first-mismatch one provably works
    too, so checking it alone is complete). No DP table: both cases are
    O(n·width) numpy byte comparisons over zero-padded fixed-width rows.
    Distance 0 (equal) and distance ≥ 2 return False.
    """
    n = len(sa)
    if n == 0:
        return np.zeros(0, bool)
    c = max(sa.astype("S").dtype.itemsize,
            sb.astype("S").dtype.itemsize) + 1
    A = np.frombuffer(sa.astype(f"S{c}").tobytes(), np.uint8).reshape(n, c)
    B = np.frombuffer(sb.astype(f"S{c}").tobytes(), np.uint8).reshape(n, c)
    la = (A != 0).sum(1)
    lb = (B != 0).sum(1)
    out = np.zeros(n, bool)
    same = la == lb
    if same.any():
        out[same] = (A[same] != B[same]).sum(1) == 1
    d1 = np.abs(la - lb) == 1
    if d1.any():
        swap = (lb > la)[d1]
        L = np.where(swap[:, None], B[d1], A[d1])
        S = np.where(swap[:, None], A[d1], B[d1])
        ls = np.minimum(la, lb)[d1]
        cols = np.arange(c)[None, :]
        mism = (L != S) & (cols < ls[:, None])
        k = np.where(mism.any(1), mism.argmax(1), ls)
        gidx = np.arange(c - 1)[None, :]
        gidx = gidx + (gidx >= k[:, None])
        out[d1] = (np.take_along_axis(L, gidx, axis=1)
                   == S[:, :c - 1]).all(1)
    return out


def deletion_variant_hashes(ids: np.ndarray, width: int = 32):
    """SymSpell deletion neighborhood as 64-bit keys: for each ASCII id,
    the id itself plus every single-character-deletion variant, hashed
    (wraparound polynomial over the zero-padded byte row). Vectorized per
    DELETION POSITION (≤ width slices of the whole batch), never per
    string. Returns ``(row_index, variant_hash)`` parallel arrays. Hash
    collisions only ADD candidate pairs — callers verify exactly with
    :func:`edit1_mask`, so collisions cost work, not correctness.
    """
    n = len(ids)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    arr = ids.astype(f"S{width}")
    A = np.frombuffer(arr.tobytes(), np.uint8).reshape(n, width)
    ln = (A != 0).sum(1)
    if int(ln.max()) >= width:
        raise ValueError(f"id longer than width={width}")
    pw = np.uint64(1099511628211) ** np.arange(width, dtype=np.uint64)
    hs = [(A.astype(np.uint64) * pw).sum(1, dtype=np.uint64)]
    ix = [np.arange(n, dtype=np.int64)]
    for i in range(int(ln.max())):
        rows = np.flatnonzero(ln > i)
        D = np.concatenate([A[rows][:, :i], A[rows][:, i + 1:],
                            np.zeros((len(rows), 1), np.uint8)], axis=1)
        hs.append((D.astype(np.uint64) * pw).sum(1, dtype=np.uint64))
        ix.append(rows.astype(np.int64))
    return np.concatenate(ix), np.concatenate(hs).view(np.int64)
