"""Geodesy + georeferencing kernels (vectorized numpy).

Re-implements, from the cited semantics (NOT copied code):
- haversine distance        — reference: src/pipeline/utils/validation.py:85-99
- meters-per-degree (WGS84 sphere, R=6371000.0)
                            — reference: micasense/core/processor.py:107-115
- GSD (ground sample distance)
                            — reference: processor.py:100-101 (gsd = sensor·alt/(f·W))
- affine transform from image center + pixel size
                            — reference: processor.py:117-133 (from_origin west/north)
- DMS / decimal GPS coordinate parser with fallback-to-0.0
                            — reference: utils/gps_utils.py:7-42
- altitude string parser    — reference: gps_utils.py:73-79
- timestamp parser          — reference: gps_utils.py:81-86 ("%Y:%m:%d %H:%M:%S")
- surface-area calculator   — reference: validation.py:68-150
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import (
    DEFAULT_FOCAL_LENGTH_MM,
    DEFAULT_SENSOR_HEIGHT_MM,
    DEFAULT_SENSOR_WIDTH_MM,
    EARTH_RADIUS_M,
)

# ---------------------------------------------------------------- haversine


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters, R=6371000.0 (validation.py:98).

    All args broadcastable numpy arrays (degrees). Returns float64 meters.
    """
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


# ------------------------------------------------------- georeference math


def meters_per_degree(lat_deg):
    """(m/deg lon, m/deg lat) at latitude, exactly processor.py:107-111."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    m_lon = (2.0 * np.pi * EARTH_RADIUS_M * np.cos(np.radians(lat))) / 360.0
    m_lat = np.full_like(lat, (2.0 * np.pi * EARTH_RADIUS_M) / 360.0)
    return m_lon, m_lat


def gsd_m(alt_m, width_px, height_px,
          focal_mm=DEFAULT_FOCAL_LENGTH_MM,
          sensor_w_mm=DEFAULT_SENSOR_WIDTH_MM,
          sensor_h_mm=DEFAULT_SENSOR_HEIGHT_MM):
    """Ground sample distance (m/px): sensor·alt/(f·dim) (processor.py:100-101)."""
    alt = np.asarray(alt_m, dtype=np.float64)
    w = np.asarray(width_px, dtype=np.float64)
    h = np.asarray(height_px, dtype=np.float64)
    return (sensor_w_mm * alt) / (focal_mm * w), (sensor_h_mm * alt) / (focal_mm * h)


def georef_transform(lat, lon, alt, width_px, height_px,
                     focal_mm=DEFAULT_FOCAL_LENGTH_MM,
                     sensor_w_mm=DEFAULT_SENSOR_WIDTH_MM,
                     sensor_h_mm=DEFAULT_SENSOR_HEIGHT_MM):
    """Vectorized affine transform from GPS center + camera params.

    Semantics of processor.py:100-133: GSD → pixel size in degrees (latitude-
    corrected longitude) → top-left corner = center − (W·px/2, −H·py/2) →
    ``from_origin(west, north, px, -py)`` i.e. the affine 6-tuple
    (a, b, c, d, e, f) = (px, 0, west, 0, -py, north) mapping
    (col,row) → (lon = c + a·col, lat = f + e·row).

    Returns dict of float64 arrays:
      px_deg, py_deg, west, north, gsd_x, gsd_y.
    """
    gsd_x, gsd_y = gsd_m(alt, width_px, height_px, focal_mm, sensor_w_mm, sensor_h_mm)
    m_lon, m_lat = meters_per_degree(lat)
    with np.errstate(divide="ignore", invalid="ignore"):
        px = gsd_x / m_lon
        py = gsd_y / m_lat
    w = np.asarray(width_px, dtype=np.float64)
    h = np.asarray(height_px, dtype=np.float64)
    west = np.asarray(lon, dtype=np.float64) - (w * px / 2.0)
    north = np.asarray(lat, dtype=np.float64) + (h * py / 2.0)
    return {"px_deg": px, "py_deg": py, "west": west, "north": north,
            "gsd_x": gsd_x, "gsd_y": gsd_y}


def surface_area_m2(west, north, px_deg, py_deg, width_px, height_px):
    """Footprint area, exact validation.py:68-150 corner semantics:
    pixel-CENTER corners (rasterio xy offset='center'), width = haversine
    along the TOP edge (corner0 → corner1), height = haversine down the EAST
    edge (corner1 → corner2), area = |w·h|.
    """
    w = np.asarray(width_px, dtype=np.float64)
    h = np.asarray(height_px, dtype=np.float64)
    # corner pixel centers: col/row offset by +0.5 (rasterio offset='center')
    lon0 = west + 0.5 * px_deg                 # corner (col=0,   row=0)
    lon1 = west + (w + 0.5) * px_deg           # corner (col=W,   row=0)
    lat_top = north - 0.5 * py_deg
    lat_bot = north - (h + 0.5) * py_deg       # corner (col=W,   row=H)
    width_m = haversine_m(lat_top, lon0, lat_top, lon1)
    height_m = haversine_m(lat_top, lon1, lat_bot, lon1)
    return np.abs(width_m * height_m)


# ------------------------------------------------------------ GPS parsers

_DMS_RE = r"^\s*([\d.]+)\s*deg\s*([\d.]+)'\s*([\d.]+)\"?\s*([NSEWnsew])"
_DEC_RE = r"^\s*([\d.]+)\s*([NSEWnsew])"
_NUM_RE = r"([-+]?[0-9]*\.?[0-9]+)"


def parse_gps_coords(series: pd.Series) -> np.ndarray:
    """Vectorized DMS/decimal GPS parser, exact gps_utils.py:7-42 semantics.

    Accepts ``52 deg 6' 28.48" N`` (DMS), ``52.1234N`` (decimal+direction),
    plain floats; anything unparseable (incl. empty/null) → 0.0, S/W negated.
    """
    s = pd.Series(series).astype("string").fillna("").reset_index(drop=True)
    out = np.zeros(len(s), dtype=np.float64)

    dms = s.str.extract(_DMS_RE)
    dms_ok = dms[0].notna().to_numpy(dtype=bool)
    if dms_ok.any():
        deg = pd.to_numeric(dms[0], errors="coerce").to_numpy(dtype=np.float64)
        mins = pd.to_numeric(dms[1], errors="coerce").to_numpy(dtype=np.float64)
        secs = pd.to_numeric(dms[2], errors="coerce").to_numpy(dtype=np.float64)
        val = deg + mins / 60.0 + secs / 3600.0
        sign = np.where(dms[3].astype("string").str.upper().isin(["S", "W"]).fillna(False).to_numpy(dtype=bool), -1.0, 1.0)
        val = np.nan_to_num(val * sign, nan=0.0)
        out[dms_ok] = val[dms_ok]

    rest = ~dms_ok
    if rest.any():
        dec = s.str.extract(_DEC_RE)
        dec_ok = rest & dec[0].notna().to_numpy(dtype=bool)
        if dec_ok.any():
            val = pd.to_numeric(dec[0], errors="coerce").to_numpy(dtype=np.float64)
            sign = np.where(dec[1].astype("string").str.upper().isin(["S", "W"]).fillna(False).to_numpy(dtype=bool), -1.0, 1.0)
            val = np.nan_to_num(val * sign, nan=0.0)
            out[dec_ok] = val[dec_ok]
        rest2 = rest & ~dec_ok
        if rest2.any():
            # plain-float fallback = the reference's float(coord_str)
            # (gps_utils.py:40-42): anything float()-parseable counts,
            # incl. scientific notation; failures → 0.0
            val = pd.to_numeric(s, errors="coerce").fillna(0.0).to_numpy(dtype=np.float64)
            out[rest2] = val[rest2]
    return out


def parse_altitude(series: pd.Series) -> np.ndarray:
    """First numeric token of e.g. ``26.9 m Above Sea Level``; NaN if absent
    (gps_utils.py:73-79)."""
    s = series.astype("string").fillna("")
    num = s.str.extract(_NUM_RE)[0]
    return pd.to_numeric(num, errors="coerce").to_numpy(dtype=np.float64)


def parse_exif_datetime(series: pd.Series) -> pd.Series:
    """``%Y:%m:%d %H:%M:%S`` → pandas datetime64[us]; failures → NaT
    (gps_utils.py:81-86; the raw-string fallback is preserved by keeping the
    original string column alongside)."""
    s = series.astype("string")
    return pd.to_datetime(s, format="%Y:%m:%d %H:%M:%S", errors="coerce")
