"""Raster↔vector join: elevation tile sampling (bilinear).

Replaces the reference's USGS 3DEP / SRTM elevation API enrichment (reference:
scripts/create-tables.sql:123-126 — `elevation_meters DECIMAL(8,2)` + source
enum at scripts/init-db.sql:59-65). The elevation layer is a grid of tiles
(FIXTURES.md §4); the sampler assembles them into one virtual uniform raster
(node-centered) and bilinearly interpolates at each (lat, lon).

Also provides the general affine bilinear resample used for band alignment
(reference: processor.py:300-359 — reproject each band onto the band-3 grid
with bilinear resampling; both grids are north-up WGS84 affine grids, so the
warp reduces to an affine pixel-coordinate mapping + bilinear sampling;
out-of-bounds fills 0 like rasterio's default).
"""

from __future__ import annotations

import numpy as np


class ElevationGrid:
    """Virtual uniform raster assembled from a tile table (broadcast layer).

    tiles: dict of numpy columns — tile_id, min_lon, min_lat, res_deg, nx, ny,
    data (list of float32 bytes). Tiles must share res_deg and form an
    axis-aligned grid (the synthetic layer does; asserted).
    """

    def __init__(self, tiles: dict):
        res = np.asarray(tiles["res_deg"], dtype=np.float64)
        assert len(res) > 0 and np.allclose(res, res[0]), "uniform res required"
        self.res = float(res[0])
        nx = np.asarray(tiles["nx"], dtype=np.int64)
        ny = np.asarray(tiles["ny"], dtype=np.int64)
        assert (nx == nx[0]).all() and (ny == ny[0]).all()
        self.tnx, self.tny = int(nx[0]), int(ny[0])
        min_lon = np.asarray(tiles["min_lon"], dtype=np.float64)
        min_lat = np.asarray(tiles["min_lat"], dtype=np.float64)
        self.lon0 = float(min_lon.min())
        self.lat0 = float(min_lat.min())
        tx = np.rint((min_lon - self.lon0) / (self.res * self.tnx)).astype(np.int64)
        ty = np.rint((min_lat - self.lat0) / (self.res * self.tny)).astype(np.int64)
        ncols = int(tx.max()) + 1
        nrows = int(ty.max()) + 1
        self.grid = np.full((nrows * self.tny, ncols * self.tnx), np.nan, dtype=np.float32)
        for i in range(len(tx)):
            arr = np.frombuffer(tiles["data"][i], dtype="<f4").reshape(self.tny, self.tnx)
            r0, c0 = int(ty[i]) * self.tny, int(tx[i]) * self.tnx
            self.grid[r0:r0 + self.tny, c0:c0 + self.tnx] = arr
        self.nrows, self.ncols = self.grid.shape

    def sample(self, lat, lon):
        """Bilinear sample at (lat, lon); NaN outside the covered extent.

        Grid nodes are cell centers: node (r,c) is at
        (lat0 + (r+0.5)·res, lon0 + (c+0.5)·res).
        """
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        fc = (lon - self.lon0) / self.res - 0.5
        fr = (lat - self.lat0) / self.res - 0.5
        c0 = np.floor(fc).astype(np.int64)
        r0 = np.floor(fr).astype(np.int64)
        wc = fc - c0
        wr = fr - r0
        # clamp edges (constant extrapolation half a cell beyond centers)
        c0c = np.clip(c0, 0, self.ncols - 2)
        r0c = np.clip(r0, 0, self.nrows - 2)
        inside = (fc >= -0.5) & (fc <= self.ncols - 0.5) & (fr >= -0.5) & (fr <= self.nrows - 0.5)
        wc = np.clip(np.where(c0 == c0c, wc, np.where(c0 < 0, 0.0, 1.0)), 0.0, 1.0)
        wr = np.clip(np.where(r0 == r0c, wr, np.where(r0 < 0, 0.0, 1.0)), 0.0, 1.0)
        g = self.grid
        v00 = g[r0c, c0c].astype(np.float64)
        v01 = g[r0c, c0c + 1].astype(np.float64)
        v10 = g[r0c + 1, c0c].astype(np.float64)
        v11 = g[r0c + 1, c0c + 1].astype(np.float64)
        val = (v00 * (1 - wr) * (1 - wc) + v01 * (1 - wr) * wc
               + v10 * wr * (1 - wc) + v11 * wr * wc)
        return np.where(inside, val, np.nan)


def affine_bilinear_resample(src: np.ndarray,
                             src_west: float, src_north: float,
                             src_px: float, src_py: float,
                             dst_west: float, dst_north: float,
                             dst_px: float, dst_py: float,
                             dst_h: int, dst_w: int) -> np.ndarray:
    """Resample ``src`` onto the destination north-up grid, bilinear, fill 0.

    Pixel (row, col) centers: lon = west + (col+0.5)·px,
    lat = north − (row+0.5)·py (px, py > 0 in degrees). Matches the semantics
    of rasterio.warp.reproject between two EPSG:4326 north-up grids
    (processor.py:330-343) up to resampling kernel details.
    """
    sh, sw = src.shape
    cols = np.arange(dst_w, dtype=np.float64)
    rows = np.arange(dst_h, dtype=np.float64)
    lon = dst_west + (cols + 0.5) * dst_px
    lat = dst_north - (rows + 0.5) * dst_py
    fc = (lon - src_west) / src_px - 0.5          # (w,)
    fr = (src_north - lat) / src_py - 0.5         # (h,)
    # axis-aligned affine ⇒ the mapping is SEPARABLE: interpolate rows, then
    # columns (two 1-D gathers instead of four (H,W) fancy-index gathers).
    c0 = np.floor(fc).astype(np.int64)
    r0 = np.floor(fr).astype(np.int64)
    # clamp base cell; weights relative to the CLAMPED base (constant
    # extrapolation half a pixel beyond centers)
    c0c = np.clip(c0, 0, sw - 2)
    r0c = np.clip(r0, 0, sh - 2)
    wc = np.clip(fc - c0c, 0.0, 1.0).astype(np.float32)
    wr = np.clip(fr - r0c, 0.0, 1.0).astype(np.float32)
    s = np.asarray(src, dtype=np.float32)
    rows_interp = s[r0c] * (1.0 - wr)[:, None] + s[r0c + 1] * wr[:, None]
    v = rows_interp[:, c0c] * (1.0 - wc)[None, :] \
        + rows_interp[:, c0c + 1] * wc[None, :]
    near_c = (fc >= -0.5) & (fc <= sw - 0.5)
    near_r = (fr >= -0.5) & (fr <= sh - 0.5)
    v *= near_r[:, None].astype(np.float32)
    v *= near_c[None, :].astype(np.float32)
    return v
