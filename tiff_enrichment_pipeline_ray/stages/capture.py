"""Stage 6: per-capture MicaSense processing — groupby(capture_id).map_groups.

The capture-set assembly that the reference does with filename grouping +
sequential loops (main.py:268-292, processor.py:177-298) becomes ONE shuffle
on `capture_id` followed by a vectorized per-group kernel:

  1. complete-set check (5 bands, J6 semantics: main.py:90-99) — incomplete
     sets emit a status row instead of raising;
  2. align: resample bands 1,2,4,5 onto the band-3 grid, bilinear
     (processor.py:300-359); without GPS/transform the bands stack as-is
     (identity transform path); clip → uint16;
  3. radiometric calibration ×10000 clip [0,65535] → uint16
     (processor.py:361-399);
  4. the 8 vegetation indices on the calibrated float32 bands with the exact
     processor.py:479-550 math, quantized (x+1)·32767.5 → uint16
     (processor.py:419) and re-encoded as png-format blobs;
  5. quality metrics: NDVI coverage fractions (indices.py:106-117) + per-band
     means.

Band order inside the stack is sorted band number (processor.py:325).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import ALL_INDICES, REFERENCE_BAND
from ..functions import codec, indices
from ..functions.raster import affine_bilinear_resample

_OUT_COLS = ["capture_id", "status", "n_bands", "lat", "lon", "alt_m", "ts_raw",
             "w", "h", "caption"]


def _empty_out():
    d = {c: pd.Series(dtype=o) for c, o in zip(
        _OUT_COLS, [str, str, "int32", float, float, float, str, "int32", "int32", str])}
    for name in ALL_INDICES:
        d[f"mean_{name}"] = pd.Series(dtype=float)
        d[f"index_{name}"] = pd.Series(dtype=object)
    d["coverage_gt_02"] = pd.Series(dtype=float)
    d["coverage_gt_05"] = pd.Series(dtype=float)
    return pd.DataFrame(d)


def process_capture(group: pd.DataFrame, index_names=ALL_INDICES) -> pd.DataFrame:
    """One capture group (rows = its band images) → one result row."""
    cid = group["capture_id"].iloc[0]
    if not cid:
        return _empty_out()
    g = group.sort_values("band")  # deterministic band order (processor.py:325)
    bands = g["band"].to_numpy()
    ref_rows = g[g["band"] == REFERENCE_BAND]

    def _row(status, n_bands, ref):
        rec = {
            "capture_id": cid, "status": status, "n_bands": np.int32(n_bands),
            "lat": ref.get("lat", np.nan), "lon": ref.get("lon", np.nan),
            "alt_m": ref.get("alt_m", np.nan), "ts_raw": ref.get("ts_raw", ""),
            "w": np.int32(ref.get("w", 0)), "h": np.int32(ref.get("h", 0)),
            "caption": ref.get("caption", ""),
        }
        for name in ALL_INDICES:
            rec[f"mean_{name}"] = np.nan
            rec[f"index_{name}"] = None
        rec["coverage_gt_02"] = np.nan
        rec["coverage_gt_05"] = np.nan
        return rec

    first = g.iloc[0].to_dict()
    if sorted(bands.tolist()) != [1, 2, 3, 4, 5]:
        return pd.DataFrame([_row("incomplete_set", len(g), first)])
    if not g["decode_ok"].all():
        return pd.DataFrame([_row("failed_decode", 5, first)])

    ref = ref_rows.iloc[0].to_dict()
    decoded = {}
    for _, r in g.iterrows():
        px = codec.decode_pixels_only(r["bytes"])
        if px is None:
            return pd.DataFrame([_row("failed_decode", 5, first)])
        decoded[int(r["band"])] = (px, r)

    ref_px, ref_r = decoded[REFERENCE_BAND]
    H, W = ref_px.shape
    have_geo = bool(ref_r["has_gps"]) and np.isfinite(ref_r["px_deg"])
    stack = np.zeros((5, H, W), dtype=np.float32)
    for i, b in enumerate(sorted(decoded)):
        px, r = decoded[b]
        if b == REFERENCE_BAND or not have_geo or not np.isfinite(r["px_deg"]):
            # identity path: same grid (or no georef) → direct stack
            src = px.astype(np.float32)
            if src.shape != (H, W):
                src = affine_bilinear_resample(
                    px, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0,
                    src.shape[1] / W, src.shape[0] / H, H, W)
            stack[i] = src[:H, :W]
        else:
            stack[i] = affine_bilinear_resample(
                px,
                float(r["west"]), float(r["north"]),
                float(r["px_deg"]), float(r["py_deg"]),
                float(ref_r["west"]), float(ref_r["north"]),
                float(ref_r["px_deg"]), float(ref_r["py_deg"]),
                H, W)
    aligned_u16 = np.clip(stack, 0, 65535).astype("uint16")  # processor.py:345
    calib_u16 = indices.calibrate(aligned_u16.astype("float32"))  # :381-385
    calib_f = calib_u16.astype("float32")

    rec = _row("ok", 5, ref)
    ndvi_f = None
    for name in index_names:
        val = indices.compute_index(name, calib_f)
        if name == "ndvi":
            ndvi_f = val
        q = indices.quantize_index(val)
        rec[f"mean_{name}"] = float(val.mean())
        rec[f"index_{name}"] = codec.encode_image(
            q, "png", {"Index": name.upper(), "Capture Id": cid})
    if ndvi_f is None:
        ndvi_f = indices.compute_index("ndvi", calib_f)
    cov = indices.vegetation_coverage(ndvi_f)
    rec["coverage_gt_02"] = cov["coverage_gt_02"]
    rec["coverage_gt_05"] = cov["coverage_gt_05"]
    return pd.DataFrame([rec])


# slim column set shipped through the capture shuffle (bytes dominate; every
# other wide column is dropped before the groupby — SURVEY §7.4-3)
CAPTURE_SHUFFLE_COLS = [
    "capture_id", "image_id", "band", "bytes", "w", "h", "decode_ok",
    "has_gps", "lat", "lon", "alt_m", "ts_raw", "caption",
    "west", "north", "px_deg", "py_deg",
]
