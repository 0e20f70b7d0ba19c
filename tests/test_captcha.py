"""Real-compute captcha stage (stages/captcha.py): template-conv
detection, the reference's NMS semantics (utils/utils.py:230-268), and
prompt-ordered clicks (detect_server.py:278-291) — all asserted
against hand-computed fixtures, no ML libraries."""

import numpy as np
import pyarrow as pa

from __spider_ray.stages import captcha as C
from __spider_ray.stages.media import decode_bmp


def _stamp(img, glyph, cell, bank):
    y0 = (cell // 5) * C.CELL + 2
    x0 = (cell % 5) * C.CELL + 2
    img[y0:y0 + C.GLYPH, x0:x0 + C.GLYPH] = np.where(
        bank[glyph] > 0, 220.0, img[y0:y0 + C.GLYPH, x0:x0 + C.GLYPH])
    return x0, y0


def test_detect_hand_fixture_exact_boxes():
    """Three glyphs at known cells on a clean background → exactly
    three detections at exactly those coordinates, right classes,
    conf ≈ 1 (ZNCC of an exact match)."""
    bank = C.glyph_bank()
    img = np.full((C.CANVAS, C.CANVAS), 40.0)
    placed = {g: _stamp(img, g, cell, bank)
              for g, cell in [(0, 0), (3, 12), (5, 24)]}
    dets = C.detect(img, bank)
    assert len(dets) == 3
    for x1, y1, x2, y2, conf, cconf, cls in dets:
        ex, ey = placed[int(cls)]
        assert (x1, y1) == (ex, ey)
        assert (x2 - x1, y2 - y1) == (C.GLYPH, C.GLYPH)
        assert conf > 0.99


def test_nms_confidence_weighted_merge():
    """Hand-computed NMS: two overlapping same-class boxes merge with
    confidence weights ((0.9*0 + 0.6*2)/1.5 = 0.8 on x1); the
    different-class overlap survives (utils.py suppresses only
    label-matched boxes)."""
    dets = np.array([
        [0.0, 0.0, 9.0, 9.0, 0.9, 0.9, 2.0],
        [2.0, 0.0, 11.0, 9.0, 0.6, 0.6, 2.0],    # IoU 7/11 > 0.4, same cls
        [1.0, 1.0, 10.0, 10.0, 0.8, 0.8, 4.0],   # overlaps but other cls
    ])
    out = C.non_max_suppression(dets, nms_thres=0.4)
    assert len(out) == 2
    merged = out[out[:, 6] == 2.0][0]
    w = 0.9 + 0.6
    np.testing.assert_allclose(
        merged[:4], [(0.9 * 0 + 0.6 * 2) / w, 0.0,
                     (0.9 * 9 + 0.6 * 11) / w, 9.0])
    assert merged[4] == 0.9                       # top box's conf kept
    other = out[out[:, 6] == 4.0][0]
    np.testing.assert_allclose(other[:4], [1.0, 1.0, 10.0, 10.0])


def test_click_sequence_follows_prompt_not_position():
    """Click order = PROMPT order (return_res semantics), not spatial:
    prompt 'FDA' with A top-left, D middle, F bottom-right must click
    F first."""
    bank = C.glyph_bank()
    img = np.full((C.CANVAS, C.CANVAS), 40.0)
    coords = {}
    for g, cell in [(0, 0), (3, 12), (5, 24)]:     # A, D, F spatially asc
        x0, y0 = _stamp(img, g, cell, bank)
        coords[chr(ord("A") + g)] = (x0 + C.GLYPH // 2, y0 + C.GLYPH // 2)
    clicks = C.click_sequence(img, "FDA", bank)
    assert [c[3] for c in clicks] == ["F", "D", "A"]
    for cx, cy, conf, ch in clicks:
        ex, ey = coords[ch]
        assert abs(cx - ex) <= 1 and abs(cy - ey) <= 1
        assert conf > 0.99


def test_ladder_rescues_degraded_glyph():
    """Escalation ladder (detect_server.py's pyrUp/CLAHE retries): a
    glyph with 20% of its pixels flipped falls below the rung-1
    threshold (measured ZNCC 0.60) but the rung-2 re-probe still finds
    it near the true location."""
    bank = C.glyph_bank()
    img = np.full((C.CANVAS, C.CANVAS), 40.0)
    x0, y0 = _stamp(img, 2, 12, bank)
    rng = np.random.RandomState(9)
    noisy = bank[2].copy()
    flip = rng.rand(C.GLYPH, C.GLYPH) < 0.20
    noisy[flip] = 1 - noisy[flip]
    img[y0:y0 + C.GLYPH, x0:x0 + C.GLYPH] = np.where(noisy > 0, 220.0, 40.0)
    assert len(C.detect(img, bank, C.CONF_THRES)) == 0   # rung 1 misses
    clicks = C.click_sequence(img, "C", bank)
    assert len(clicks) == 1
    cx, cy, conf, ch = clicks[0]
    assert ch == "C" and C.LADDER_THRES < conf < C.CONF_THRES
    assert abs(cx - (x0 + C.GLYPH // 2)) <= 2
    assert abs(cy - (y0 + C.GLYPH // 2)) <= 2


def test_synth_roundtrip_and_determinism():
    """Every synthetic captcha's clicks resolve its full prompt, in
    prompt order, twice identically (replay contract)."""
    det = C.CaptchaDetector()
    refs = pa.table({"media_ref": pa.array(
        [f"captcha://{i:016x}" for i in range(12)])})
    out1, out2 = det(refs), det(refs)
    assert out1.equals(out2)
    for n, xs, prompt in zip(out1["n_boxes"].to_pylist(),
                             out1["click_xs"].to_pylist(),
                             out1["captcha_text"].to_pylist()):
        assert n == len(prompt) == len(xs)
        assert 2 <= n <= 4


def test_detector_accepts_external_payload():
    """A provided BMP payload is decoded and scored instead of the
    synthetic one (the real-deployment input path)."""
    payload, prompt = C.synth_captcha("captcha://ext")
    t = pa.table({"media_ref": pa.array(["captcha://ext"]),
                  "payload": pa.array([payload], pa.binary())})
    out = C.CaptchaDetector()(t)
    assert out["captcha_text"].to_pylist() == [prompt]
    assert out["n_boxes"].to_pylist()[0] == len(prompt)
    gray = decode_bmp(payload)[:, :, 0]
    assert gray.shape == (C.CANVAS, C.CANVAS)
