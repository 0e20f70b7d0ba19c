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


# ------------------------------------------------------------ WAV codec
# Audio as an opaque binary column with a REAL decode path: 16-bit PCM
# WAV is a 44-byte RIFF header + little-endian samples — struct +
# np.frombuffer, no audio library.

def synth_wav(media_ref: str, rate: int = 8000) -> bytes:
    """Deterministic mono PCM clip for a ref: length and tone frequency
    from the ref hash, plus seeded noise (pure function of the ref)."""
    h = hashlib.md5(media_ref.encode()).hexdigest()
    n = rate // 4 + int(h[8:12], 16) % rate          # 0.25-1.25 s
    freq = 100 + int(h[12:16], 16) % 900
    rng = np.random.RandomState(int(h[16:24], 16))
    t = np.arange(n, dtype=np.float64) / rate
    wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    return encode_wav(pcm, rate)


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE bytes."""
    import struct
    data = pcm.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
                      b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                      b"data", len(data))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 samples, sample_rate)."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt, channels, rate = struct.unpack_from("<HHI", payload, 20)
    if fmt != 1 or channels != 1:
        raise ValueError("only mono PCM supported")
    n = struct.unpack_from("<I", payload, 40)[0] // 2
    return np.frombuffer(payload, dtype="<i2", count=n, offset=44), rate


def audio_features(pcm: np.ndarray, rate: int) -> dict:
    """Vectorized clip features: duration, RMS, zero-crossing count,
    peak — the audio analog of the pooled image grid."""
    x = pcm.astype(np.float64) / 32768.0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "n_samples": int(len(x)),
        "duration_ms": int(len(x) * 1000 // rate),
        "rms_milli": int(round(float(np.sqrt(np.mean(x ** 2))) * 1000)),
        "peak_milli": int(round(float(np.abs(x).max()) * 1000)),
        "zero_crossings": zc,
    }


# ------------------------------------------------------- video frame-sample
# Synthetic "video" = concatenated BMP frames behind a tiny index
# header; frame-sampling reads ONLY the selected frames' byte ranges —
# the access pattern a real container demuxer gives you.

def synth_video(media_ref: str) -> bytes:
    """4-12 BMP frames derived from the ref (frame i varies the ref)."""
    import struct
    h = hashlib.md5(media_ref.encode()).hexdigest()
    n_frames = 4 + int(h[24:26], 16) % 9
    frames = [synth_bmp(f"{media_ref}#frame{i}") for i in range(n_frames)]
    index = struct.pack("<4sI", b"SVID", n_frames) + b"".join(
        struct.pack("<I", len(f)) for f in frames)
    return index + b"".join(frames)


def sample_frames(payload: bytes, every: int = 2) -> list[np.ndarray]:
    """Decode every ``every``-th frame only (offsets from the index —
    untouched frames' bytes are never parsed)."""
    import struct
    if payload[:4] != b"SVID":
        raise ValueError("not a synthetic video payload")
    n_frames = struct.unpack_from("<I", payload, 4)[0]
    sizes = struct.unpack_from(f"<{n_frames}I", payload, 8)
    offsets = np.concatenate([[0], np.cumsum(sizes)]) + 8 + 4 * n_frames
    return [decode_bmp(payload[offsets[i]:offsets[i + 1]])
            for i in range(0, n_frames, every)]


class AudioFeatureWorker:
    """Actor-pool audio stage: decode WAV payloads and emit clip
    features (codec tables / models would load once here)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [audio_features(*decode_wav(p))
                 for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"])
        for k in ("n_samples", "duration_ms", "rms_milli", "peak_milli",
                  "zero_crossings"):
            out = out.append_column(k, pa.array([f[k] for f in feats],
                                                pa.int64()))
        return out


class FrameSampleWorker:
    """Actor-pool video stage: sample every Nth frame, emit per-item
    frame count and the sampled frames' mean-gray sequence digest."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_sampled, mean_centi = [], []
        for p in batch["payload"].to_pylist():
            frames = sample_frames(p, self.every)
            n_sampled.append(len(frames))
            mean_centi.append(int(round(float(np.mean(
                [f.astype(np.float64).mean() for f in frames])) * 100)))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "n_sampled_frames", pa.array(n_sampled, pa.int64())
        ).append_column(
            "sampled_mean_centi", pa.array(mean_centi, pa.int64()))


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
                if h < 4 or w < 4:
                    # images smaller than the grid: sample pixels
                    # (empty pooling cells would yield NaN features)
                    ys = (np.arange(4) * h) // 4
                    xs = (np.arange(4) * w) // 4
                    feats[i] = gray[ys][:, xs].reshape(-1)
                    continue
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


# -------------------------------------------------------- perceptual hash
# Classic DCT pHash (the image analog of SimHash): grayscale → 32×32 →
# 2-D DCT-II → keep the 8×8 lowest-frequency block → threshold at the
# median (DC excluded) → 64-bit signature.  Near-identical images
# (recompression, small edits, noise) land within a few bits; the
# signatures feed the SAME 4×16 pigeonhole banding shuffle as SimHash
# (``stages/dedup.sig64_near_dups``) — one candidate-pair machinery for
# text and images.

PHASH_SIDE = 32
PHASH_KEEP = 8


def _dct_basis(n: int = PHASH_SIDE) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n): row k is the k-th cosine
    basis vector — ``D @ x`` is the 1-D DCT; ``D @ img @ D.T`` the 2-D."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


def phash64(img: np.ndarray, basis: np.ndarray | None = None) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image."""
    d = _dct_basis() if basis is None else basis
    gray = img.astype(np.float64).mean(axis=2)
    # same index gather as resize_nearest, on the 2-D gray plane directly
    h, w = gray.shape
    ys = (np.arange(PHASH_SIDE) * h) // PHASH_SIDE
    xs = (np.arange(PHASH_SIDE) * w) // PHASH_SIDE
    small = gray[ys][:, xs]
    coeff = d @ small @ d.T
    block = coeff[:PHASH_KEEP, :PHASH_KEEP].reshape(-1)
    med = np.median(block[1:])                 # DC excluded from the median
    bits = (block > med).astype(np.uint8)
    bits[0] = 0                                # DC bit pinned
    return int(np.packbits(bits, bitorder="little").view(np.uint64)[0])


class PHashWorker:
    """Actor-pool stage: (img_id:int64, payload:binary) → adds
    ``simhash:int64`` (the pHash signature, named for the shared
    ``sig64_near_dups`` banding contract).  The DCT basis is built once
    per actor — the model-load-per-request anti-pattern inverted, as
    with the other media workers."""

    def __init__(self):
        self.basis = _dct_basis()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.empty(batch.num_rows, dtype=np.uint64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            sigs[i] = phash64(decode_bmp(p), self.basis)
        out = batch.drop_columns(["payload"])
        return out.append_column("simhash", pa.array(sigs.astype(np.int64)))
