"""Stage 6: per-capture MicaSense processing — bucketed groupby.map_groups.

The capture-set assembly that the reference does with filename grouping +
sequential loops (main.py:268-292, processor.py:177-298) becomes ONE shuffle
keyed on a hash BUCKET of capture_id (all 5 bands of a capture land in the
same bucket; ~B groups instead of ~n_captures groups, amortizing the
per-group engine overhead), followed by a tight per-capture kernel:

  1. complete-set check (5 bands, J6 semantics: main.py:90-99) — incomplete
     sets emit a status row instead of raising;
  2. align: resample bands 1,2,4,5 onto the band-3 grid, bilinear
     (processor.py:300-359); without GPS/transform the bands stack as-is
     (identity path); clip → uint16;
  3. radiometric calibration ×10000 clip [0,65535] → uint16
     (processor.py:361-399);
  4. the 8 vegetation indices on the calibrated float32 bands with the exact
     processor.py:479-550 math, quantized (x+1)·32767.5 → uint16
     (processor.py:419) and re-encoded as png-format blobs;
  5. quality metrics: NDVI coverage fractions (indices.py:106-117).

Partitioning assumption: bucket = blake2b(capture_id) % B co-locates each
capture's bands; B is sized so a bucket's decoded pixels fit a worker heap.
Band order inside the stack is sorted band number (processor.py:325).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..config import ALL_INDICES, REFERENCE_BAND
from ..functions import codec, indices
from ..functions.raster import affine_bilinear_resample

N_CAPTURE_BUCKETS = 16


def add_capture_bucket(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bucket"] = [
        int.from_bytes(hashlib.blake2b(c.encode(), digest_size=4).digest(),
                       "big") % N_CAPTURE_BUCKETS
        for c in df["capture_id"]
    ]
    return df


def _f(v):
    """None/NA → nan float (blocks read back from spills may be object)."""
    try:
        return float(v) if v is not None else np.nan
    except (TypeError, ValueError):
        return np.nan


def _nan_row(cid, status, n_bands, ref):
    rec = {
        "capture_id": cid, "status": status, "n_bands": np.int32(n_bands),
        "lat": _f(ref.get("lat")), "lon": _f(ref.get("lon")),
        "alt_m": _f(ref.get("alt_m")), "ts_raw": ref.get("ts_raw", ""),
        "w": np.int32(ref.get("w") or 0), "h": np.int32(ref.get("h") or 0),
        "caption": ref.get("caption", "") or "",
    }
    for name in ALL_INDICES:
        rec[f"mean_{name}"] = np.nan
        rec[f"index_{name}"] = None
    rec["coverage_gt_02"] = np.nan
    rec["coverage_gt_05"] = np.nan
    return rec


def _one_capture(cid: str, cols: dict, idx: np.ndarray,
                 index_names=ALL_INDICES,
                 ndvi_variant="processor") -> dict:
    """cols: dict of column -> full numpy/object arrays; idx: row indices of
    this capture's band images (any order)."""
    bands = cols["band"][idx]
    order = np.argsort(bands, kind="stable")  # processor.py:325 sorted bands
    idx = idx[order]
    bands = bands[order]
    first = {k: cols[k][idx[0]] for k in
             ("lat", "lon", "alt_m", "ts_raw", "w", "h", "caption")}
    if list(bands) != [1, 2, 3, 4, 5]:
        return _nan_row(cid, "incomplete_set", len(idx), first)

    ref_pos = idx[2]  # band 3 after sort
    ref = {k: cols[k][ref_pos] for k in
           ("lat", "lon", "alt_m", "ts_raw", "w", "h", "caption",
            "west", "north", "px_deg", "py_deg", "has_gps")}
    decoded = []
    pre = cols.get("_px")  # pixels already decoded by the stats stage
    for i in idx:
        px = pre[i] if pre is not None else codec.decode_pixels_only(cols["bytes"][i])
        if px is None:
            return _nan_row(cid, "failed_decode", 5, first)
        decoded.append(px)
    ref_px = decoded[REFERENCE_BAND - 1]
    H, W = ref_px.shape
    have_geo = bool(ref["has_gps"]) and np.isfinite(ref["px_deg"])
    stack = np.empty((5, H, W), dtype=np.float32)
    for k, (b, px) in enumerate(zip(bands, decoded)):
        i = idx[k]
        if (b == REFERENCE_BAND or not have_geo
                or not np.isfinite(cols["px_deg"][i])):
            src = px.astype(np.float32)
            if src.shape != (H, W):
                src = affine_bilinear_resample(
                    px, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0,
                    src.shape[1] / W, src.shape[0] / H, H, W)
            stack[k] = src[:H, :W]
        else:
            stack[k] = affine_bilinear_resample(
                px,
                float(cols["west"][i]), float(cols["north"][i]),
                float(cols["px_deg"][i]), float(cols["py_deg"][i]),
                float(ref["west"]), float(ref["north"]),
                float(ref["px_deg"]), float(ref["py_deg"]),
                H, W)
    aligned_u16 = np.clip(stack, 0, 65535).astype("uint16")   # :345
    calib_f = indices.calibrate(aligned_u16.astype("float32")).astype("float32")

    rec = _nan_row(cid, "ok", 5, ref)
    ndvi_f = None
    for name in index_names:
        val = indices.compute_index(name, calib_f, ndvi_variant)
        if name == "ndvi":
            ndvi_f = val
        q = indices.quantize_index(val)
        rec[f"mean_{name}"] = float(val.mean())
        rec[f"index_{name}"] = codec.encode_image(
            q, "png", {"Index": name.upper(), "Capture Id": cid}, level=1)
    if ndvi_f is None:
        ndvi_f = indices.compute_index("ndvi", calib_f, ndvi_variant)
    cov = indices.vegetation_coverage(ndvi_f)
    rec["coverage_gt_02"] = cov["coverage_gt_02"]
    rec["coverage_gt_05"] = cov["coverage_gt_05"]
    return rec


def process_bucket(df: pd.DataFrame, index_names=ALL_INDICES,
                   ndvi_variant="processor") -> pd.DataFrame:
    """One hash bucket of captures → one row per capture (deterministic
    capture_id order)."""
    cols = {c: df[c].to_numpy() for c in df.columns}
    cids = cols["capture_id"]
    order = np.argsort(cids, kind="stable")
    sorted_ids = cids[order]
    boundaries = np.flatnonzero(
        np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]]))
    rows = []
    for s, e in zip(boundaries, np.append(boundaries[1:], len(sorted_ids))):
        idx = order[s:e]
        cid = sorted_ids[s]
        if not cid:
            continue
        rows.append(_one_capture(cid, cols, idx, index_names, ndvi_variant))
    if not rows:
        return pd.DataFrame([_nan_row("", "empty", 0, {})]).iloc[0:0]
    return pd.DataFrame(rows)


# compatibility shim for single-capture tests
def process_capture(group: pd.DataFrame, index_names=ALL_INDICES,
                    ndvi_variant="processor") -> pd.DataFrame:
    return process_bucket(group, index_names, ndvi_variant)


def split_local_complete(df: pd.DataFrame):
    """Split a block's rows into (complete-in-block captures, orphan rows).

    A capture has ≤1 row per band (image_id is unique), so a capture whose
    full band set {1..5} appears inside one block is globally complete and
    can be processed WITHOUT any shuffle; rows of captures only partially
    present in this block are orphans, shuffled by capture bucket and decided
    globally (complete vs incomplete_set). This keeps the wide `bytes`
    column out of the all-to-all exchange for co-located captures —
    SURVEY §7.4-3 (never shuffle pixels when metadata suffices).
    """
    cid = df["capture_id"].to_numpy()
    band = df["band"].to_numpy()
    order = np.argsort(cid, kind="stable")
    sc = cid[order]
    starts = np.flatnonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))
    ends = np.append(starts[1:], len(sc))
    complete_mask = np.zeros(len(df), dtype=bool)
    for s, e in zip(starts, ends):
        idx = order[s:e]
        if len(idx) == 5 and sorted(band[idx].tolist()) == [1, 2, 3, 4, 5]:
            complete_mask[idx] = True
    return df[complete_mask], df[~complete_mask]


# slim column set shipped through the capture shuffle (bytes dominate; every
# other wide column is dropped before the groupby — SURVEY §7.4-3)
CAPTURE_SHUFFLE_COLS = [
    "capture_id", "image_id", "band", "bytes", "w", "h", "decode_ok",
    "has_gps", "lat", "lon", "alt_m", "ts_raw", "caption",
    "west", "north", "px_deg", "py_deg",
]
