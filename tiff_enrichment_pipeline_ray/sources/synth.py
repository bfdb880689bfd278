"""Deterministic synthetic fixtures (FIXTURES.md): the `images` input table
(BASELINE.json input_hint shape) plus the enrichment layers (landcover
polygons, weather stations/observations, elevation tiles).

Everything is seeded pure-numpy; any shard/batch split yields identical rows
because each *group* (capture set or single TIFF) derives its own
``default_rng(seed + group_id)`` — generation order and parallelism never
change content.

Scale: n_rows ≈ IMAGES_PER_SF · sf (config.py). The images table is generated
distributed (Ray tasks over group ranges) and cached under /tmp, one parquet
file set per scale — regenerated only if the cache marker is missing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import (
    IMAGES_PER_SF,
    NL_LAT_MAX,
    NL_LAT_MIN,
    NL_LON_MAX,
    NL_LON_MIN,
)
from ..functions import codec

SEED = 42
ROWS_PER_GROUP = 2.439  # E[rows/group] given the type mix below (FIXTURES §1)
P_COMPLETE, P_INCOMPLETE = 0.3415, 0.0488  # rest = regular TIFFs
CAPTURE_DIMS = (104, 120, 136)
SMALL_DIM = 64          # trips the min-dimension validator (validation.py:179)
P_SMALL = 0.03
P_NOGPS = 0.03          # no-GPS path (processor.py:183-184)
P_CORRUPT = 0.01        # quarantined rows (main.py:244-251)
P_ZERO = 0.005          # zero-ratio validator trip (validation.py:194-196)
P_DUP = 0.02            # exact-dup rows sharing phash (create-tables.sql:253)
N_DUP_TEMPLATES = 5
P_HOTSPOT = 0.20        # skewed dense cluster (north_rule skew salting)
HOTSPOT = (52.37, 4.89, 0.05)  # lat, lon, radius_deg
CAMERA = "MicaSense RedEdge-M"
FMTS = ("raw", "png", "lossyq")

LANDCOVER_CLASSES = ("tree_cover", "shrubland", "grassland", "cropland",
                     "built_up", "bare", "snow_ice", "water", "wetland",
                     "mangroves", "moss_lichen")

IMAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


def n_images_for_sf(sf: float) -> int:
    return max(1000, int(IMAGES_PER_SF * sf))


def n_groups_for_sf(sf: float) -> int:
    return max(1, int(round(n_images_for_sf(sf) / ROWS_PER_GROUP)))


def _phash(px: np.ndarray) -> int:
    import hashlib
    h = hashlib.blake2b(np.ascontiguousarray(px, dtype="<u2").tobytes(),
                        digest_size=8).digest()
    return int.from_bytes(h, "big") >> 1


def _dms(value: float, is_lat: bool) -> str:
    hemi = ("N" if value >= 0 else "S") if is_lat else ("E" if value >= 0 else "W")
    v = abs(value)
    deg = int(v)
    mins = int((v - deg) * 60)
    secs = (v - deg - mins / 60) * 3600
    return f"{deg} deg {mins}' {secs:.4f}\" {hemi}"


def _gradient_pixels(rng, w, h, lo, hi, zero=False):
    """Smooth deterministic gradient field in [lo, hi] (uint16)."""
    if zero:
        px = np.zeros((h, w), dtype=np.uint16)
        px[0, 0] = hi  # not fully empty, just ≥50% zeros
        return px
    yy, xx = np.mgrid[0:h, 0:w]
    fx, fy = rng.uniform(0.5, 3.0, 2)
    ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
    base = (np.sin(2 * np.pi * fx * xx / w + ph1)
            + np.cos(2 * np.pi * fy * yy / h + ph2)
            + 2.0) / 4.0  # [0,1]
    return np.round(lo + base * (hi - lo)).astype(np.uint16)


def _dup_template(t: int):
    rng = np.random.default_rng(SEED * 1000 + 77 + t)
    return _gradient_pixels(rng, 128, 128, 0, 65535)


def generate_groups(group_ids: np.ndarray, seed: int = SEED) -> pa.Table:
    """Generate all image rows for the given group ids → Arrow table."""
    cols = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for g in group_ids:
        g = int(g)
        rng = np.random.default_rng(seed * 1_000_003 + g)
        u = rng.random()
        if u < P_COMPLETE:
            bands = [1, 2, 3, 4, 5]
        elif u < P_COMPLETE + P_INCOMPLETE:
            bands = sorted(rng.choice([1, 2, 3, 4, 5], size=rng.integers(1, 5),
                                      replace=False).tolist())
        else:
            bands = None  # regular TIFF

        # location: hotspot cluster or uniform NL
        if rng.random() < P_HOTSPOT:
            lat = HOTSPOT[0] + rng.normal(0, HOTSPOT[2] / 2)
            lon = HOTSPOT[1] + rng.normal(0, HOTSPOT[2] / 2)
        else:
            lat = rng.uniform(NL_LAT_MIN + 0.05, NL_LAT_MAX - 0.05)
            lon = rng.uniform(NL_LON_MIN + 0.05, NL_LON_MAX - 0.05)
        alt = rng.uniform(20.0, 120.0)
        day = int(rng.integers(1, 31))
        hh, mm, ss = (int(rng.integers(0, 24)), int(rng.integers(0, 60)),
                      int(rng.integers(0, 60)))
        ts = f"2023:06:{day:02d} {hh:02d}:{mm:02d}:{ss:02d}"
        has_gps = rng.random() >= P_NOGPS

        if bands is not None:
            dim = SMALL_DIM if rng.random() < P_SMALL else int(rng.choice(CAPTURE_DIMS))
            zero = rng.random() < P_ZERO
            for b in bands:
                # tiny per-band GPS jitter → distinct transforms → real warp work
                blat = lat + rng.normal(0, 2e-6)
                blon = lon + rng.normal(0, 2e-6)
                meta = {}
                if has_gps:
                    meta["GPS Latitude"] = _dms(blat, True)
                    meta["GPS Longitude"] = _dms(blon, False)
                    meta["GPS Altitude"] = f"{alt:.1f} m Above Sea Level"
                meta["Date/Time Original"] = ts
                meta["Camera Model Name"] = CAMERA
                meta["Band Number"] = str(b)
                px = _gradient_pixels(rng, dim, dim, 0, 6, zero=zero)
                if b == 4 and not zero:  # boost NIR so NDVI > 0 on veg-like areas
                    px = np.clip(px.astype(np.int64) + 2, 0, 6).astype(np.uint16)
                fmt = FMTS[int(rng.integers(0, 3))]
                blob = codec.encode_image(px, fmt, meta)
                if rng.random() < P_CORRUPT:
                    blob = blob[:max(8, len(blob) // 2)]
                iid = f"IMG_{g:04d}_{b}"
                cols["image_id"].append(iid)
                cols["bytes"].append(blob)
                cols["w"].append(dim)
                cols["h"].append(dim)
                cols["fmt"].append(fmt)
                cols["caption"].append(_caption(iid, g))
                cols["phash"].append(_phash(px))
        else:
            dup = rng.random() < P_DUP
            if dup:
                px = _dup_template(g % N_DUP_TEMPLATES)
            else:
                dim = SMALL_DIM if rng.random() < 0.01 else int(rng.choice((112, 128, 144)))
                px = _gradient_pixels(rng, dim, dim, 0, 65535,
                                      zero=rng.random() < P_ZERO)
            h, w = px.shape
            meta = {}
            if has_gps:
                meta["GPS Latitude"] = _dms(lat, True)
                meta["GPS Longitude"] = _dms(lon, False)
                meta["GPS Altitude"] = f"{alt:.1f} m Above Sea Level"
            meta["Date/Time Original"] = ts
            meta["Camera Model Name"] = "DJI Phantom 4"
            fmt = FMTS[int(rng.integers(0, 3))]
            blob = codec.encode_image(px, fmt, meta)
            if rng.random() < P_CORRUPT:
                blob = blob[:max(8, len(blob) // 2)]
            iid = f"TIFF_{g:06d}"
            cols["image_id"].append(iid)
            cols["bytes"].append(blob)
            cols["w"].append(w)
            cols["h"].append(h)
            cols["fmt"].append(fmt)
            cols["caption"].append(_caption(iid, g))
            cols["phash"].append(_phash(px))
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )


def _caption(image_id: str, g: int) -> str:
    return (f"Aerial multispectral frame {image_id} recorded over plot "
            f"{g % 997} in the Netherlands survey area.")


# ------------------------------------------------------------------ layers


def gen_landcover(seed: int = SEED):
    """Polygon layer tiling the NL bbox (FIXTURES §2): jittered octagons on a
    grid, ~10% cells skipped (null-join path), a few large overlapping
    polygons, many tiny ones."""
    rng = np.random.default_rng(seed + 1)
    nx, ny = 24, 18
    dx = (NL_LON_MAX - NL_LON_MIN) / nx
    dy = (NL_LAT_MAX - NL_LAT_MIN) / ny
    polys, classes, conf, year = [], [], [], []
    for iy in range(ny):
        for ix in range(nx):
            if rng.random() < 0.10:
                continue
            cx = NL_LON_MIN + (ix + 0.5 + rng.uniform(-0.15, 0.15)) * dx
            cy = NL_LAT_MIN + (iy + 0.5 + rng.uniform(-0.15, 0.15)) * dy
            r = rng.uniform(0.45, 0.62)
            nv = int(rng.integers(5, 9))
            ang = rng.uniform(0, 2 * np.pi) + np.linspace(0, 2 * np.pi, nv, endpoint=False)
            rad = r * rng.uniform(0.75, 1.05, nv)
            ring = np.stack([cx + rad * np.cos(ang) * dx, cy + rad * np.sin(ang) * dy], axis=1)
            polys.append(ring)
            classes.append(LANDCOVER_CLASSES[int(rng.integers(0, len(LANDCOVER_CLASSES)))])
            conf.append(float(np.round(rng.uniform(0.5, 1.0), 2)))
            year.append(int(rng.choice([2020, 2021])))
    # a few very large polygons (overlap many cells) + tiny ones
    for _ in range(4):
        cx = rng.uniform(NL_LON_MIN + 0.5, NL_LON_MAX - 0.5)
        cy = rng.uniform(NL_LAT_MIN + 0.4, NL_LAT_MAX - 0.4)
        nv = int(rng.integers(6, 10))
        ang = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        rad = rng.uniform(0.3, 0.6, nv)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        polys.append(ring)
        classes.append(LANDCOVER_CLASSES[int(rng.integers(0, len(LANDCOVER_CLASSES)))])
        conf.append(float(np.round(rng.uniform(0.5, 1.0), 2)))
        year.append(int(rng.choice([2020, 2021])))
    for _ in range(60):
        cx = rng.uniform(NL_LON_MIN, NL_LON_MAX)
        cy = rng.uniform(NL_LAT_MIN, NL_LAT_MAX)
        nv = int(rng.integers(4, 7))
        ang = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        rad = rng.uniform(0.005, 0.02, nv)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        polys.append(ring)
        classes.append(LANDCOVER_CLASSES[int(rng.integers(0, len(LANDCOVER_CLASSES)))])
        conf.append(float(np.round(rng.uniform(0.5, 1.0), 2)))
        year.append(int(rng.choice([2020, 2021])))
    return {
        "polygon_id": np.arange(len(polys), dtype=np.int64),
        "class": classes,
        "confidence": np.array(conf, dtype=np.float32),
        "year": np.array(year, dtype=np.int32),
        "rings": [p.tolist() for p in polys],
    }


def gen_stations(seed: int = SEED, n: int = 500):
    """Weather stations, density-skewed into the urban hotspot (FIXTURES §3)."""
    rng = np.random.default_rng(seed + 2)
    n_dense = int(n * 0.4)
    lat = np.concatenate([
        rng.uniform(NL_LAT_MIN, NL_LAT_MAX, n - n_dense),
        HOTSPOT[0] + rng.normal(0, HOTSPOT[2], n_dense),
    ])
    lon = np.concatenate([
        rng.uniform(NL_LON_MIN, NL_LON_MAX, n - n_dense),
        HOTSPOT[1] + rng.normal(0, HOTSPOT[2], n_dense),
    ])
    ids = np.array([f"ST{i:04d}" for i in range(n)])
    elev = rng.uniform(-4.0, 300.0, n).astype(np.float32)
    return {"station_id": ids, "lat": lat, "lon": lon, "elevation_m": elev}


def gen_weather_obs(seed: int = SEED, n_stations: int = 500):
    """One row per station per day of June 2023 (capture-date range)."""
    rng = np.random.default_rng(seed + 3)
    days = np.arange(1, 31)
    sid, date, tmin, tmax, precip, wind = [], [], [], [], [], []
    base_t = rng.uniform(8, 16, n_stations)
    for s in range(n_stations):
        t0 = base_t[s] + 4 * np.sin(2 * np.pi * days / 30.0)
        lo = t0 + rng.normal(0, 1.5, len(days))
        hi = lo + rng.uniform(4, 10, len(days))
        pr = np.where(rng.random(len(days)) < 0.35, rng.uniform(0.2, 18, len(days)), 0.0)
        wd = rng.uniform(2, 45, len(days))
        for j, d in enumerate(days):
            sid.append(f"ST{s:04d}")
            date.append(f"2023-06-{d:02d}")
            tmin.append(round(float(lo[j]), 1))
            tmax.append(round(float(hi[j]), 1))
            precip.append(round(float(pr[j]), 1))
            wind.append(round(float(wd[j]), 1))
    import datetime as _dt
    return {
        "station_id": np.array(sid),
        "date": np.array([_dt.date.fromisoformat(d) for d in date]),
        "tmin_c": np.array(tmin, dtype=np.float32),
        "tmax_c": np.array(tmax, dtype=np.float32),
        "precip_mm": np.array(precip, dtype=np.float32),
        "wind_kmh": np.array(wind, dtype=np.float32),
    }


def terrain_m(lat, lon, seed: int = SEED):
    """Smooth deterministic terrain, −5..~320 m (sum of seeded sinusoids)."""
    rng = np.random.default_rng(seed + 4)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    z = np.zeros(np.broadcast(lat, lon).shape)
    for _ in range(6):
        fx, fy = rng.uniform(0.3, 4.0, 2)
        ph = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(10, 60)
        z = z + amp * np.sin(2 * np.pi * (fx * (lon - NL_LON_MIN) / 4.3
                                          + fy * (lat - NL_LAT_MIN) / 2.9) + ph)
    return np.clip(z + 140.0, -5.0, 320.0)


def gen_elevation_tiles(seed: int = SEED):
    """Tile grid covering the NL bbox: 128×128 float32 per tile, res 1/240°."""
    res = 1.0 / 240.0
    tnx = tny = 128
    span_x, span_y = tnx * res, tny * res
    ncols = int(np.ceil((NL_LON_MAX - NL_LON_MIN) / span_x))
    nrows = int(np.ceil((NL_LAT_MAX - NL_LAT_MIN) / span_y))
    tid, mlon, mlat, data = [], [], [], []
    for ty in range(nrows):
        for tx in range(ncols):
            lon0 = NL_LON_MIN + tx * span_x
            lat0 = NL_LAT_MIN + ty * span_y
            cols = lon0 + (np.arange(tnx) + 0.5) * res
            rows = lat0 + (np.arange(tny) + 0.5) * res
            LO, LA = np.meshgrid(cols, rows)
            z = terrain_m(LA, LO, seed).astype("<f4")
            tid.append(ty * ncols + tx)
            mlon.append(lon0)
            mlat.append(lat0)
            data.append(z.tobytes())
    return {
        "tile_id": np.array(tid, dtype=np.int64),
        "min_lon": np.array(mlon),
        "min_lat": np.array(mlat),
        "res_deg": np.full(len(tid), res),
        "nx": np.full(len(tid), tnx, dtype=np.int32),
        "ny": np.full(len(tid), tny, dtype=np.int32),
        "data": data,
    }


# ------------------------------------------------------------- cache logic

CACHE_ROOT = os.environ.get("GRAFT_SYNTH_CACHE", "/tmp/graft_synth")


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a '/root/testdata/sf0.01' style path."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def images_dir_for_sf(sf: float) -> str:
    # cache key includes the row count so IMAGES_PER_SF changes invalidate
    return os.path.join(CACHE_ROOT, f"images_sf{sf:g}_n{n_images_for_sf(sf)}")


def ensure_images(sf: float, n_write_tasks: int | None = None) -> str:
    """Generate (once, cached) the images table at scale sf via Ray tasks.

    Distributed over group-id ranges; content is independent of the split.
    Returns the parquet directory. Never calls ray.init (driver owns the
    session; Ray auto-inits when standalone).

    Layout matters for read parallelism: files are sized ~100 MB and row
    groups are small (4096 rows) so ``read_parquet`` can split any file into
    many read tasks. A single giant row group forces one task to decompress
    the whole file in one go (measured: 32×437 MB single-row-group files at
    sf0.4 serialized the read into 32 ~220 s tasks with 2.3 GB peak heap and
    starved the rest of the DAG — the exact anti-pattern a 100 TB layout
    must avoid)."""
    out = images_dir_for_sf(sf)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import ray

    n_groups = n_groups_for_sf(sf)
    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    @ray.remote
    def _gen(lo: int, hi: int, path: str) -> int:
        tbl = generate_groups(np.arange(lo, hi))
        pq.write_table(tbl, path, compression="zstd", row_group_size=4096)
        return tbl.num_rows

    if n_write_tasks is None:
        # ~100 MB/file (≈ 15.6k rows at ~7 KB/row), floor 32 for parallelism
        n_write_tasks = max(32, n_images_for_sf(sf) // 15_625)
    n_tasks = min(n_write_tasks, max(1, n_groups // 64))
    bounds = np.linspace(0, n_groups, n_tasks + 1).astype(int)
    refs = [
        _gen.remote(int(bounds[i]), int(bounds[i + 1]),
                    os.path.join(tmp, f"part-{i:05d}.parquet"))
        for i in range(n_tasks) if bounds[i + 1] > bounds[i]
    ]
    ray.get(refs)
    os.replace(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def ensure_layers() -> str:
    """Write the small enrichment layers (landcover/stations/obs/elevation)
    to the cache dir once; returns the dir."""
    out = os.path.join(CACHE_ROOT, "layers")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    lc = gen_landcover()
    pq.write_table(pa.table({
        "polygon_id": lc["polygon_id"],
        "class": lc["class"],
        "confidence": lc["confidence"],
        "year": lc["year"],
        "rings": pa.array(lc["rings"], pa.list_(pa.list_(pa.float64()))),
    }), os.path.join(out, "landcover.parquet"))
    st = gen_stations()
    pq.write_table(pa.table(st), os.path.join(out, "weather_stations.parquet"))
    ob = gen_weather_obs()
    pq.write_table(pa.table(ob), os.path.join(out, "weather_obs.parquet"))
    el = gen_elevation_tiles()
    pq.write_table(pa.table({
        "tile_id": el["tile_id"],
        "min_lon": el["min_lon"],
        "min_lat": el["min_lat"],
        "res_deg": el["res_deg"],
        "nx": el["nx"],
        "ny": el["ny"],
        "data": pa.array(el["data"], pa.binary()),
    }), os.path.join(out, "elevation_tiles.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# Audio / video tables (multimodal plumbing inputs). Deterministic per-id
# content in the native GA01/GV01 containers; ~2% poison rows (truncated /
# wrong-magic blobs) so the safe-decode path is exercised end-to-end.

def n_audio_for_sf(sf: float) -> int:
    return max(200, n_images_for_sf(sf) // 10)


def n_video_for_sf(sf: float) -> int:
    return max(60, n_images_for_sf(sf) // 50)


def _gen_audio_rows(ids: np.ndarray) -> "pa.Table":
    from ..functions import codec

    blobs = []
    for aid in ids:
        rng = np.random.default_rng(900_000 + int(aid))
        sr = int(rng.choice([8000, 16000, 22050]))
        n = int(rng.integers(sr // 2, sr * 2))      # 0.5–2 s clips
        t = np.arange(n, dtype=np.float64) / sr
        f0 = float(rng.uniform(80, 2000))
        x = (0.6 * np.sin(2 * np.pi * f0 * t)
             + 0.2 * np.sin(2 * np.pi * 2.5 * f0 * t)
             + 0.1 * rng.standard_normal(n))
        pcm = np.clip(x * 12000, -32768, 32767).astype(np.int16)
        blob = codec.encode_audio(pcm, sr)
        r = rng.random()
        if r < 0.01:
            blob = blob[: max(4, len(blob) // 3)]   # truncated payload
        elif r < 0.02:
            blob = b"XXXX" + blob[4:]               # wrong magic
        blobs.append(blob)
    return pa.table({"audio_id": pa.array(ids, pa.int64()),
                     "bytes": pa.array(blobs, pa.binary())})


def _gen_video_rows(ids: np.ndarray) -> "pa.Table":
    from ..functions import codec

    blobs = []
    for vid in ids:
        rng = np.random.default_rng(950_000 + int(vid))
        nf = int(rng.integers(12, 90))
        h, w = 24, 32
        yy, xx = np.mgrid[0:h, 0:w]
        phase = rng.uniform(0, 2 * np.pi)
        fidx = np.arange(nf)[:, None, None]
        frames = (127 + 100 * np.sin(2 * np.pi * (xx[None] + 2 * fidx) / w
                                     + phase)
                  + 20 * (yy[None] / h)).clip(0, 255).astype(np.uint8)
        blob = codec.encode_video(frames)
        r = rng.random()
        if r < 0.01:
            blob = blob[: max(4, len(blob) // 4)]
        elif r < 0.02:
            blob = b"YYYY" + blob[4:]
        blobs.append(blob)
    return pa.table({"video_id": pa.array(ids, pa.int64()),
                     "bytes": pa.array(blobs, pa.binary())})


def _ensure_media(kind: str, n: int, gen, sf: float) -> str:
    """Shared cached-parquet writer for the audio/video tables (sharded via
    Ray tasks like ensure_images; files stay ~10-20 MB)."""
    out = os.path.join(CACHE_ROOT, f"{kind}_sf{sf:g}_n{n}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import shutil

    import ray

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    @ray.remote
    def _one(lo: int, hi: int, path: str) -> int:
        tbl = gen(np.arange(lo, hi))
        pq.write_table(tbl, path, compression="zstd", row_group_size=1024)
        return tbl.num_rows

    n_tasks = max(1, min(16, n // 200))
    bounds = np.linspace(0, n, n_tasks + 1).astype(int)
    ray.get([_one.remote(int(bounds[i]), int(bounds[i + 1]),
                         os.path.join(tmp, f"part-{i:05d}.parquet"))
             for i in range(n_tasks) if bounds[i + 1] > bounds[i]])
    os.replace(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def ensure_audio(sf: float) -> str:
    """Generate (once, cached) the audio table at scale sf; returns the dir."""
    return _ensure_media("audio", n_audio_for_sf(sf), _gen_audio_rows, sf)


def ensure_video(sf: float) -> str:
    """Generate (once, cached) the video table at scale sf; returns the dir."""
    return _ensure_media("video", n_video_for_sf(sf), _gen_video_rows, sf)
