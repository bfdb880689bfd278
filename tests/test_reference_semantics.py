"""Engine vs reference_semantics oracle on shared kernels (the independent
re-implementation used by the flagship parity tests)."""

import numpy as np
import pytest

from tiff_enrichment_pipeline_ray import reference_semantics as ora
from tiff_enrichment_pipeline_ray.functions import geo, indices
from tiff_enrichment_pipeline_ray.functions.knn import BruteKNN
from tiff_enrichment_pipeline_ray.functions.pip import PolygonIndex


def test_haversine_matches():
    rng = np.random.default_rng(0)
    a = rng.uniform(-80, 80, 50)
    b = rng.uniform(-179, 179, 50)
    c = rng.uniform(-80, 80, 50)
    d = rng.uniform(-179, 179, 50)
    np.testing.assert_allclose(geo.haversine_m(a, b, c, d),
                               ora.oracle_haversine_m(a, b, c, d), rtol=1e-12)


def test_georef_matches():
    t = geo.georef_transform(np.array([52.3]), np.array([4.9]),
                             np.array([80.0]), np.array([120]), np.array([120]))
    o = ora.oracle_georef(52.3, 4.9, 80.0, 120, 120)
    for k in ("px_deg", "py_deg", "west", "north"):
        assert t[k][0] == pytest.approx(o[k], rel=1e-15)


def test_dms_matches():
    import pandas as pd

    got = geo.parse_gps_coords(pd.Series(["52 deg 6' 28.48\" S"]))[0]
    assert got == pytest.approx(ora.oracle_dms_to_decimal(52, 6, 28.48, "S"))


def test_pip_matches():
    rng = np.random.default_rng(1)
    rings = []
    for _ in range(25):
        cx, cy = rng.uniform(0, 5, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        rad = rng.uniform(0.3, 1.2, 6)
        rings.append(np.stack([cx + rad * np.cos(ang),
                               cy + rad * np.sin(ang)], axis=1))
    ids = np.arange(25)
    idx = PolygonIndex(rings, ids)
    pts = rng.uniform(-0.5, 5.5, (300, 2))
    got = idx.join(pts[:, 1], pts[:, 0])
    for (x, y), g in zip(pts, got):
        want = ora.oracle_pip(y, x, [r.tolist() for r in rings], ids)
        assert (ids[g] if g >= 0 else -1) == want


def test_knn_matches():
    rng = np.random.default_rng(2)
    slat = rng.uniform(50, 54, 120)
    slon = rng.uniform(3, 8, 120)
    knn = BruteKNN(slat, slon)
    for _ in range(40):
        qlat, qlon = rng.uniform(50, 54), rng.uniform(3, 8)
        gi, gd = knn.query(np.array([qlat]), np.array([qlon]), 1)
        oi, od = ora.oracle_nearest_station(qlat, qlon, slat, slon)
        assert gi[0, 0] == oi and gd[0, 0] == pytest.approx(od, rel=1e-12)


def test_ndvi_pipeline_matches():
    rng = np.random.default_rng(3)
    nir = rng.integers(0, 7, (32, 32)).astype(np.uint16)
    red = rng.integers(0, 7, (32, 32)).astype(np.uint16)
    calib = indices.calibrate(np.stack([red, red, red, nir, red]).astype("float32"))
    f = calib.astype("float32")
    got = indices.quantize_index(indices.ndvi(f[3], f[2]))
    want = ora.oracle_ndvi_quantized(nir, red)
    assert (got == want).all()
