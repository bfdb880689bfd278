"""ANN (brute + IVF recall) and multimodal stage tests."""

import numpy as np
import pandas as pd
import pytest

from tiff_enrichment_pipeline_ray.functions import codec
from tiff_enrichment_pipeline_ray.stages.ann import IVFIndex, kmeans_fit
from tiff_enrichment_pipeline_ray.stages.multimodal import (
    AudioDecode,
    ImageDecode,
    ImageFeatures,
    ImageResize,
    VideoFrameSample,
)


class TestIVF:
    def test_recall_vs_brute(self):
        rng = np.random.default_rng(9)
        X = rng.normal(size=(2000, 32)).astype(np.float32)
        # plant clusters so IVF lists are meaningful
        X[:500] += 3.0
        X[500:1000] -= 3.0
        ids = np.arange(2000)
        q = X[7] + rng.normal(0, 0.05, 32).astype(np.float32)
        idx = IVFIndex(ids, X, k=16)
        got, _ = idx.search(q, topk=10, nprobe=6)
        norms = np.sqrt((X * X).sum(1))
        sims = (X @ q) / (norms * np.sqrt((q * q).sum()))
        want = ids[np.argsort(-sims, kind="stable")[:10]]
        recall = len(set(got.tolist()) & set(want.tolist())) / 10.0
        assert recall >= 0.8

    def test_deterministic(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(300, 16)).astype(np.float32)
        c1 = kmeans_fit(X, 8)
        c2 = kmeans_fit(X, 8)
        np.testing.assert_array_equal(c1, c2)


def _img_df(n=6):
    rng = np.random.default_rng(4)
    rows = []
    for i in range(n):
        px = (rng.random((40, 50)) * 65535).astype(np.uint16)
        rows.append({"image_id": f"IMG_{i:04d}_1",
                     "bytes": codec.encode_image(px, "png", {})})
    rows.append({"image_id": "BAD", "bytes": b"corrupt"})
    return pd.DataFrame(rows)


class TestMultimodal:
    def test_decode_stage(self):
        out = ImageDecode()( _img_df())
        assert out.decode_ok.sum() == 6 and not out.decode_ok.iloc[-1]
        assert (out.h.iloc[:6] == 40).all() and (out.w.iloc[:6] == 50).all()

    def test_resize_stage(self):
        out = ImageResize(32, 32)(_img_df())
        good = out[out.decode_ok]
        px, _, ok = codec.decode_image(good.bytes.iloc[0])
        assert ok and px.shape == (32, 32)

    def test_feature_stage_deterministic_unit_norm(self):
        df = _img_df()
        f1 = ImageFeatures()(df)
        f2 = ImageFeatures()(df)
        good = f1[f1.decode_ok]
        for v in good.feature:
            assert np.sqrt((v * v).sum()) == pytest.approx(1.0, abs=1e-5)
        for a, b in zip(f1.feature, f2.feature):
            np.testing.assert_array_equal(a, b)

    def test_stubs_raise_with_contract(self):
        with pytest.raises(NotImplementedError):
            AudioDecode()
        with pytest.raises(NotImplementedError):
            VideoFrameSample()
