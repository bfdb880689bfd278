"""Single-process reference-semantics oracle (SURVEY §7.1-6).

Re-implements the reference pipeline's per-row math *directly from the cited
formulas* in plain numpy/Python — deliberately NOT sharing the engine's index
structures (no STRtree, no cell-bucketed kNN, no virtual raster), so the
pytest parity checks (tests/test_flagship.py) compare two independent
implementations row-for-row:

- DMS parsing / georef: gps_utils.py:7-42, processor.py:100-133
- land-cover PIP: scalar crossing-number loop over every polygon, min
  polygon_id tie-break (the semantics PostGIS ST_Contains + the J2 tie rule
  pin down; create-tables.sql:135-139)
- weather kNN: full haversine matrix, first-minimum tie (station_id order;
  validation.py:85-99, init-db.sql:157-170)
- elevation: direct node-center bilinear of the terrain grid
  (create-tables.sql:123-126 semantics over the FIXTURES §4 layer)
- vegetation indices + quantizer: processor.py:479-550, :419
- calibration ×10000 clip: processor.py:381-385
"""

from __future__ import annotations

import numpy as np

from .config import EARTH_RADIUS_M


def oracle_haversine_m(lat1, lon1, lat2, lon2):
    """Scalar-friendly haversine, R=6371000.0 (validation.py:98)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(lat2 - lat1)
    dl = np.radians(lon2 - lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def oracle_pip(lat: float, lon: float, rings: list, polygon_ids) -> int:
    """Crossing-number PIP over EVERY polygon (no index); smallest
    polygon_id among containers; −1 if none."""
    best = -1
    for pid, ring in zip(polygon_ids, rings):
        inside = False
        k = len(ring)
        for j in range(k):
            x0, y0 = ring[j]
            x1, y1 = ring[(j + 1) % k]
            if (y0 <= lat < y1) or (y1 <= lat < y0):
                if lon < x0 + (lat - y0) * (x1 - x0) / (y1 - y0):
                    inside = not inside
        if inside and (best < 0 or pid < best):
            best = int(pid)
    return best


def oracle_nearest_station(lat: float, lon: float, st_lat, st_lon):
    """Index of the nearest station (ties → lowest index = lowest
    station_id when the arrays are id-sorted)."""
    d = oracle_haversine_m(lat, lon, np.asarray(st_lat), np.asarray(st_lon))
    i = int(np.argmin(d))
    return i, float(d[i])


def oracle_elevation(lat: float, lon: float, lat0: float, lon0: float,
                     res: float, node_fn):
    """Node-centered bilinear; ``node_fn(r, c)`` returns the grid value."""
    fc = (lon - lon0) / res - 0.5
    fr = (lat - lat0) / res - 0.5
    c0, r0 = int(np.floor(fc)), int(np.floor(fr))
    wc, wr = fc - c0, fr - r0
    return (node_fn(r0, c0) * (1 - wr) * (1 - wc)
            + node_fn(r0, c0 + 1) * (1 - wr) * wc
            + node_fn(r0 + 1, c0) * wr * (1 - wc)
            + node_fn(r0 + 1, c0 + 1) * wr * wc)


def oracle_ndvi_quantized(nir_dn: np.ndarray, red_dn: np.ndarray) -> np.ndarray:
    """DN → calibrate ×10000 clip (processor.py:381-385) → NDVI with
    0-where-denom-0 (:479-486) → (x+1)·32767.5 clip uint16 (:419)."""
    nir = np.clip(nir_dn.astype("float32") * 10000.0, 0, 65535) \
        .astype("uint16").astype("float32")
    red = np.clip(red_dn.astype("float32") * 10000.0, 0, 65535) \
        .astype("uint16").astype("float32")
    den = nir + red
    ndvi = np.divide(nir - red, den, out=np.zeros_like(nir), where=den != 0)
    return np.clip((ndvi + 1.0) * 32767.5, 0, 65535).astype("uint16")


def oracle_dms_to_decimal(deg: float, minutes: float, seconds: float,
                          hemi: str) -> float:
    """gps_utils.py:16-22: deg + m/60 + s/3600, negated for S/W."""
    v = deg + minutes / 60.0 + seconds / 3600.0
    return -v if hemi.upper() in ("S", "W") else v


def oracle_georef(lat: float, lon: float, alt: float, width: int, height: int,
                  focal_mm=5.4, sensor_w_mm=4.8, sensor_h_mm=3.6):
    """processor.py:100-133 verbatim math: GSD → m/deg → pixel size → origin."""
    import math

    gsd_x = (sensor_w_mm * alt) / (focal_mm * width)
    gsd_y = (sensor_h_mm * alt) / (focal_mm * height)
    m_lon = (2 * math.pi * EARTH_RADIUS_M * math.cos(math.radians(lat))) / 360.0
    m_lat = (2 * math.pi * EARTH_RADIUS_M) / 360.0
    px = gsd_x / m_lon
    py = gsd_y / m_lat
    west = lon - (width * px / 2.0)
    north = lat + (height * py / 2.0)
    return {"px_deg": px, "py_deg": py, "west": west, "north": north}
