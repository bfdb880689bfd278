"""Multimodal column stages: decode / resize / feature-extract / frame-sample.

Images/audio/video travel as opaque `binary` columns with typed metadata
(BASELINE.json input_hint). The Ray-side plumbing — schemas, actor-pool
signatures, batch sizing, output layout — is real and tested; codec hooks for
formats whose libraries aren't in this container (JPEG/PNG-file/WAV/MP4) are
STUBBED behind import-tries and raise ``NotImplementedError`` with the
documented contract (SURVEY/charter: stub the decode, keep the plumbing real).

All stages are callable CLASSES → actor pools: state (codec tables, resize
kernels, model weights) is built once per actor in ``__init__``
(`map_batches(Cls, concurrency=N, batch_size=B)`); batch sizes must be small
for wide binary rows (decoded pixels dominate worker heap: batch_size ×
concurrency × H × W × 2B must fit — see config notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import codec

try:  # pragma: no cover — not installable in this sandbox
    from PIL import Image as _PIL_Image  # noqa: F401
    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


class ImageDecode:
    """binary `bytes` → decoded stats + optional pixel pass-through.

    Native GI01 container decodes for real; foreign formats (JPEG/TIFF files)
    need Pillow/rasterio — stubbed here (import-gated)."""

    def __init__(self, keep_pixels: bool = False):
        self.keep_pixels = keep_pixels

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ok, h, w, mean = [], [], [], []
        pixels = []
        for blob in df["bytes"]:
            px, _, good = codec.decode_image(blob)
            if not good and _HAS_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "foreign image container: decode via PIL.Image.open "
                    "(bytes→RGB ndarray) — gated on Pillow availability")
            ok.append(good)
            h.append(px.shape[0] if good else 0)
            w.append(px.shape[1] if good else 0)
            mean.append(float(px.mean()) if good else np.nan)
            if self.keep_pixels:
                pixels.append(px.tobytes() if good else b"")
        out = pd.DataFrame({
            "image_id": df["image_id"].to_numpy(),
            "decode_ok": np.array(ok),
            "h": np.array(h, dtype=np.int32),
            "w": np.array(w, dtype=np.int32),
            "px_mean": np.array(mean),
        })
        if self.keep_pixels:
            out["pixels_raw"] = pixels
        return out


class ImageResize:
    """Decoded image → fixed (target_h, target_w) bilinear resize, re-encoded.
    Real implementation over the native container (separable bilinear)."""

    def __init__(self, target_h: int = 64, target_w: int = 64):
        from ..functions.raster import affine_bilinear_resample

        self.resample = affine_bilinear_resample
        self.th, self.tw = target_h, target_w

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_bytes = []
        ok = []
        for blob in df["bytes"]:
            px, meta, good = codec.decode_image(blob)
            if not good:
                out_bytes.append(b"")
                ok.append(False)
                continue
            h, w = px.shape
            r = self.resample(px, 0.0, 0.0, 1.0 / w, 1.0 / h,
                              0.0, 0.0, 1.0 / self.tw, 1.0 / self.th,
                              self.th, self.tw)
            out_bytes.append(codec.encode_image(
                np.clip(r, 0, 65535).astype(np.uint16), "png", meta, level=1))
            ok.append(True)
        return pd.DataFrame({
            "image_id": df["image_id"].to_numpy(),
            "bytes": out_bytes,
            "w": np.full(len(df), self.tw, dtype=np.int32),
            "h": np.full(len(df), self.th, dtype=np.int32),
            "decode_ok": np.array(ok),
        })


class ImageFeatures:
    """Image → 64-dim float32 feature vector.

    Deterministic downsampled-intensity-grid "embedding" (8×8 mean-pool of
    the normalized image, flattened, L2-normalized) — the documented stand-in
    for a CNN/CLIP encoder (no model weights in this container). The actor
    signature (load once in __init__, batched __call__) is exactly what a real
    model stage uses."""

    DIM = 64

    def __init__(self):
        from ..functions.raster import affine_bilinear_resample

        self.resample = affine_bilinear_resample

    def _feat(self, px: np.ndarray) -> np.ndarray:
        g = self.resample(px.astype(np.float32), 0.0, 0.0,
                          1.0 / px.shape[1], 1.0 / px.shape[0],
                          0.0, 0.0, 1.0 / 8, 1.0 / 8, 8, 8).ravel()
        mx = g.max()
        g = g / mx if mx > 0 else g
        n = np.sqrt((g * g).sum())
        return (g / n if n > 0 else g).astype(np.float32)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats, ok = [], []
        for blob in df["bytes"]:
            px, _, good = codec.decode_image(blob)
            ok.append(good)
            feats.append(self._feat(px) if good
                         else np.zeros(self.DIM, dtype=np.float32))
        return pd.DataFrame({
            "image_id": df["image_id"].to_numpy(),
            "feature": feats,
            "decode_ok": np.array(ok),
        })


class AudioDecode:  # pragma: no cover — stub, schema contract only
    """STUB: audio `bytes` (wav/flac) → pcm float32 + sample_rate.

    Contract: __call__(df[audio_id, bytes]) → df[audio_id, sample_rate:int32,
    n_samples:int64, rms:float32]. Requires soundfile/librosa — not in this
    container."""

    def __init__(self):
        raise NotImplementedError(
            "audio decode requires soundfile/librosa (unavailable here); "
            "the stage contract is documented in the class docstring")


class VideoFrameSample:  # pragma: no cover — stub, schema contract only
    """STUB: video `bytes` → every-Nth-frame sample as image rows.

    Contract: __call__(df[video_id, bytes]) → df[video_id, frame_idx:int32,
    frame_bytes:binary, w:int32, h:int32] (flat_map-shaped: one row per
    sampled frame). Requires pyav/opencv — not in this container."""

    def __init__(self, every_n: int = 30):
        raise NotImplementedError(
            "video frame sampling requires pyav/opencv (unavailable here); "
            "the stage contract is documented in the class docstring")


def image_features_dataset(images_ds, concurrency: int = 4, batch_size: int = 256):
    """images Dataset → (image_id, feature[64], decode_ok) via actor pool."""
    return images_ds.map_batches(
        ImageFeatures, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
