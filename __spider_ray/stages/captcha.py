"""T1/T2/T4 — click-captcha detection with REAL pixel compute, no ML
libraries: template-bank convolution (ZNCC) → the reference's exact NMS
semantics → prompt-ordered click coordinates, as an actor-pool
``map_batches`` stage.

Reference pipeline being re-expressed (same inputs → same contract):
- ``models.py:237-347`` — Darknet conv forward producing per-cell
  (box, objectness, class-scores).  Here the "network" is a bank of
  glyph templates cross-correlated over the image (a matched filter —
  the degenerate-but-REAL conv layer: one ``einsum`` over sliding
  windows per batch image, actual pixel math, deterministic weights).
- ``utils/utils.py:230-268`` — ``non_max_suppression``: confidence
  filter, score sort, greedy same-class suppression at IoU>thresh with
  CONFIDENCE-WEIGHTED box merging.  Reproduced verbatim in numpy.
- ``detect_server.py:150-291`` — per-box OCR with an escalation ladder
  (pyrUp / sharpen / CLAHE retries) and ``return_res``: click targets
  ordered by matching recognized text against the prompt sequence.
  Here the ladder is a lower-threshold re-probe for prompt glyphs the
  first pass missed, and click order follows the prompt exactly.

The model (template bank) is built ONCE per actor in ``__init__`` —
the fix for the reference's rebuild-per-request anti-pattern
(``detect_server.py:65-80`` constructs Darknet and loads checkpoints
inside the Flask handler).

Synthetic captchas are pure functions of ``media_ref`` (like the rest
of the synthetic web): K glyphs from an 8-glyph alphabet stamped at
hash-derived grid cells over seeded noise, with a hash-derived prompt
order — so the detector's output is replay-stable and testable against
hand-computed fixtures (tests/test_captcha.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .media import decode_bmp, encode_bmp, resize_nearest

N_GLYPHS = 8          # alphabet size ("A".."H")
GLYPH = 9             # template side (px)
CANVAS = 96           # captcha side (px)
CELL = 19             # placement grid cell (5x5 grid with margin)
CONF_THRES = 0.65     # rung-1 ZNCC acceptance
LADDER_THRES = 0.45   # rung-2 (detect_server.py's pyrUp/CLAHE retry analog)
NMS_THRES = 0.4       # IoU for same-class suppression (utils.py:230 default)


def glyph_bank() -> np.ndarray:
    """(N_GLYPHS, GLYPH, GLYPH) float64 binary patterns — the
    deterministic 'weights'.  Patterns are mutually near-orthogonal
    (random ~half-density bits), so ZNCC separates classes sharply."""
    rng = np.random.RandomState(41)
    return (rng.rand(N_GLYPHS, GLYPH, GLYPH) < 0.5).astype(np.float64)


def synth_captcha(media_ref: str) -> tuple[bytes, str]:
    """Deterministic captcha for a ref → (BMP payload, prompt).

    The prompt is the CLICK ORDER (the "请依次点击…" instruction of the
    reference's click captcha): K distinct glyph letters; the image
    stamps those glyphs at hash-derived distinct grid cells in an
    UNRELATED spatial order."""
    h = hashlib.md5(("captcha-img:" + media_ref).encode()).hexdigest()
    k = 2 + int(h[0], 16) % 3                        # 2-4 targets
    rng = np.random.RandomState(int(h[1:9], 16))
    glyphs = rng.choice(N_GLYPHS, size=k, replace=False)
    cells = rng.choice(25, size=k, replace=False)    # distinct 5x5 cells
    bank = glyph_bank()
    img = (30 + 20 * rng.rand(CANVAS, CANVAS)).astype(np.float64)  # noise bg
    for g, c in zip(glyphs, cells):
        y0 = (int(c) // 5) * CELL + 2
        x0 = (int(c) % 5) * CELL + 2
        patch = img[y0:y0 + GLYPH, x0:x0 + GLYPH]
        img[y0:y0 + GLYPH, x0:x0 + GLYPH] = np.where(
            bank[g] > 0, 220.0, patch)
    rgb = np.repeat(img.astype(np.uint8)[:, :, None], 3, axis=2)
    prompt = "".join(chr(ord("A") + int(g)) for g in glyphs)
    return encode_bmp(rgb), prompt


def _zncc_maps(gray: np.ndarray, bank: np.ndarray) -> np.ndarray:
    """Zero-normalized cross-correlation of every GLYPH×GLYPH window
    against every template → (N_GLYPHS, H', W') score maps in [-1, 1].
    ONE einsum per image — the vectorized conv forward."""
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(gray, (GLYPH, GLYPH))            # (H',W',g,g)
    n = GLYPH * GLYPH
    t_z = bank - bank.mean(axis=(1, 2), keepdims=True)
    t_norm = np.sqrt((t_z ** 2).sum(axis=(1, 2)))              # (T,)
    w_sum = win.sum(axis=(2, 3))
    w_sq = (win.astype(np.float64) ** 2).sum(axis=(2, 3))
    w_var = np.maximum(w_sq - w_sum ** 2 / n, 1e-9)            # (H',W')
    num = np.einsum("ijkl,tkl->tij", win, t_z)                 # (T,H',W')
    return num / (np.sqrt(w_var)[None] * t_norm[:, None, None])


def candidate_boxes(gray: np.ndarray, bank: np.ndarray,
                    conf_thres: float) -> np.ndarray:
    """Cells above threshold → (M, 7) rows of
    (x1, y1, x2, y2, conf, class_conf, class) — the detection layout
    ``utils.py:230`` documents."""
    maps = _zncc_maps(gray.astype(np.float64), bank)
    t, yy, xx = np.nonzero(maps > conf_thres)
    conf = maps[t, yy, xx]
    return np.column_stack([
        xx, yy, xx + GLYPH, yy + GLYPH, conf, conf, t]).astype(np.float64)


def bbox_iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one (x1,y1,x2,y2) box vs an (M,4) array — the
    ``utils.py`` corner-form variant, vectorized."""
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    iw = np.clip(ix2 - ix1, 0, None)
    ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-16)


def non_max_suppression(dets: np.ndarray,
                        nms_thres: float = NMS_THRES) -> np.ndarray:
    """The reference's NMS, numpy-for-torch (``utils/utils.py:230-268``):
    sort by score desc; repeatedly take the top box, find SAME-CLASS
    boxes with IoU > thresh, replace the kept box's coordinates by the
    CONFIDENCE-WEIGHTED mean of the suppressed group, drop the group."""
    if not len(dets):
        return dets.reshape(0, 7)
    score = dets[:, 4] * dets[:, 5]
    dets = dets[np.argsort(-score, kind="stable")]
    keep = []
    while len(dets):
        top = dets[0]
        invalid = (bbox_iou(top[:4], dets[:, :4]) > nms_thres) \
            & (dets[:, 6] == top[6])
        weights = dets[invalid, 4:5]
        merged = top.copy()
        merged[:4] = (weights * dets[invalid, :4]).sum(0) / weights.sum()
        keep.append(merged)
        dets = dets[~invalid]
    return np.stack(keep)


def detect(gray: np.ndarray, bank: np.ndarray,
           conf_thres: float = CONF_THRES) -> np.ndarray:
    """conv forward → threshold → NMS → (M, 7) final detections."""
    return non_max_suppression(candidate_boxes(gray, bank, conf_thres))


def click_sequence(gray: np.ndarray, prompt: str,
                   bank: np.ndarray) -> list[tuple[int, int, float, str]]:
    """Prompt-ordered click targets — ``detect_server.return_res``:
    walk the PROMPT characters in order, pick each one's best detection
    (center point).  A prompt glyph the rung-1 pass missed gets the
    escalation ladder (``detect_server.py:208-248``'s pyrUp/sharpen/
    CLAHE retries): a 2× nearest-neighbor upsample re-probe at a lower
    threshold, matching templates scaled 2×."""
    dets = detect(gray, bank, CONF_THRES)
    out: list[tuple[int, int, float, str]] = []
    up = None
    for ch in prompt:
        cls = ord(ch) - ord("A")
        mine = dets[dets[:, 6] == cls] if len(dets) else dets
        if len(mine):
            best = mine[np.argmax(mine[:, 4] * mine[:, 5])]
            cx = int(round((best[0] + best[2]) / 2))
            cy = int(round((best[1] + best[3]) / 2))
            out.append((cx, cy, float(best[4]), ch))
            continue
        # ladder rung 2: upsample 2x, re-probe this class only
        if up is None:
            rgb = np.repeat(gray.astype(np.uint8)[:, :, None], 3, axis=2)
            up = resize_nearest(rgb, gray.shape[1] * 2,
                                gray.shape[0] * 2)[:, :, 0]
        big_bank = np.repeat(np.repeat(bank[cls:cls + 1], 2, axis=1),
                             2, axis=2)[:, :GLYPH * 2, :GLYPH * 2]
        from numpy.lib.stride_tricks import sliding_window_view
        win = sliding_window_view(up.astype(np.float64),
                                  (GLYPH * 2, GLYPH * 2))
        t_z = big_bank[0] - big_bank[0].mean()
        n = (GLYPH * 2) ** 2
        w_sum = win.sum(axis=(2, 3))
        w_var = np.maximum((win ** 2).sum(axis=(2, 3)) - w_sum ** 2 / n, 1e-9)
        sc = np.einsum("ijkl,kl->ij", win, t_z) \
            / (np.sqrt(w_var) * np.sqrt((t_z ** 2).sum()))
        yy, xx = np.nonzero(sc > LADDER_THRES)
        if len(yy):
            i = np.argmax(sc[yy, xx])
            # coordinates come back in ORIGINAL pixels (rescale_boxes
            # analog, detect_server.py:177)
            cx = int(round((xx[i] + GLYPH) / 2))
            cy = int(round((yy[i] + GLYPH) / 2))
            out.append((cx, cy, float(sc[yy[i], xx[i]]), ch))
    return out


class CaptchaDetector:
    """Actor-pool stage: template bank built once per actor
    (``map_batches(CaptchaDetector, concurrency=N)``); each batch row
    is one captcha artifact (``media_ref`` [+ optional ``payload``
    BMP]).  Emits prompt-ordered click targets, one list per row."""

    def __init__(self, conf_thres: float = CONF_THRES):
        self.bank = glyph_bank()
        self.conf_thres = conf_thres

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = batch["payload"].to_pylist() \
            if "payload" in batch.column_names else [None] * len(refs)
        n_boxes, xs, ys, confs, prompts = [], [], [], [], []
        for ref, payload in zip(refs, payloads):
            if payload is None:
                payload, prompt = synth_captcha(str(ref))
            else:
                _, prompt = synth_captcha(str(ref))
            gray = decode_bmp(payload)[:, :, 0]
            clicks = click_sequence(gray, prompt, self.bank)
            n_boxes.append(len(clicks))
            xs.append([c[0] for c in clicks])
            ys.append([c[1] for c in clicks])
            confs.append([int(round(c[2] * 10000)) for c in clicks])
            prompts.append(prompt)
        return batch.append_column("n_boxes", pa.array(n_boxes, pa.int32())) \
                    .append_column("click_xs", pa.array(xs, pa.list_(pa.int32()))) \
                    .append_column("click_ys", pa.array(ys, pa.list_(pa.int32()))) \
                    .append_column("conf_bp", pa.array(confs, pa.list_(pa.int64()))) \
                    .append_column("captcha_text", pa.array(prompts, pa.string()))
