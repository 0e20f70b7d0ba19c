"""S4/T6 — browser-render fetch stage + T1-T4 challenge solving, as
actor-pool stages with the heavy dependencies import-gated.

The reference detours requests through headless Chrome
(``CtripSpiderMiddleware.py:383-412``, ``YlSpiderMiddleware.py:63-184``,
driver factory ``spiders/bshead.py:18-58``), solving slider captchas
with a physics track (``verifyImage.py:101-197``) and click captchas
via a YOLOv3+PaddleOCR Flask server that reloads the model per request
(``detect_server.py:65-345``).

Here the Ray-side shape is real — one browser/model per ACTOR, loaded
once in ``__init__`` (the fix for the reference's reload-per-request),
``batch_size`` kept small because rendering is per-page work — while
the pixel/browser work is stubbed: selenium/torch/paddle are absent in
this container, so rendering returns a deterministic md5-derived HTML
body and the captcha scorer returns md5-derived boxes+text.  The
``strict=True`` flag raises ``NotImplementedError`` instead, marking
exactly where a real deployment plugs in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import synth

try:                                     # not installed in this container
    from selenium import webdriver       # pragma: no cover
    _HAVE_SELENIUM = True
except ImportError:
    webdriver = None
    _HAVE_SELENIUM = False

RENDER_BATCH_SIZE = 32                   # rendering is seconds-per-page work


def synthetic_html(url: str) -> bytes:
    """Deterministic rendered-page stand-in: flight rows as divs (the
    shape the bytecode-only ylSpider xpath parser reads, SURVEY.md M13)
    plus an <img> captcha artifact on some pages."""
    status, err, n = synth.page_status(url)
    if err or status != 200:
        return b"<html><body class='error'></body></html>"
    rows = []
    for i in range(n):
        f = synth.flight_fields(url, i)
        rows.append(
            f"<div class='flight-desc' data-no='{f['plane_no']}'>"
            f"<span class='company'>{f['company']}</span>"
            f"<span class='time'>{f['start_time']}-{f['end_time']}</span>"
            f"<span class='price'>{f['price']}</span></div>")
        if f["has_media"]:
            rows.append(f"<img class='captcha' src='{f['media_ref']}'/>")
    return ("<html><body>" + "".join(rows) + "</body></html>").encode()


class RenderWorker:
    """Headless-browser fetch actor: one driver per actor, created once
    (bshead.py:18-58 creates one per spider process — same idea,
    actor-scoped).  ``__call__`` renders a small batch of URLs."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.driver = None
        if _HAVE_SELENIUM:                        # pragma: no cover
            self.driver = webdriver.Chrome()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if self.strict and self.driver is None:
            raise NotImplementedError(
                "real rendering requires selenium+Chrome (absent here); "
                "strict=False uses the deterministic synthetic renderer")
        bodies = [synthetic_html(u) for u in urls]
        return batch.append_column("rendered_body",
                                   pa.array(bodies, pa.binary()))


class CaptchaScorer:
    """T1/T2 analog: model loaded once per actor in __init__ (vs the
    reference's per-request Darknet build+checkpoint load,
    detect_server.py:65-275); scores batches of captcha refs.

    Output mirrors the detect server's contract
    (detect_server.py:278-291): ordered click coordinates + recognized
    text per artifact.  Since round 3 the scoring is REAL pixel math —
    the pure-numpy template-conv + NMS + prompt-order pipeline in
    ``stages/captcha.py`` (the md5-derived fake boxes are gone); torch
    remains the import-gated plug point for a real YOLO deployment."""

    def __init__(self, conf_thres: float | None = None, strict: bool = False):
        from . import captcha as _cap
        self.strict = strict
        try:                                       # pragma: no cover
            import torch  # noqa: F401
            self.model = "yolov3-would-load-here"
        except ImportError:
            self.model = None
        self.detector = _cap.CaptchaDetector(
            conf_thres if conf_thres is not None else _cap.CONF_THRES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and self.model is None:
            raise NotImplementedError(
                "real captcha scoring requires torch+paddleocr (absent); "
                "strict=False runs the pure-numpy template detector")
        out = self.detector(batch)
        return out.drop_columns(["conf_bp"])       # legacy contract


def slider_track(distance: int) -> list[int]:
    """T3 — the slider physics track (accelerate 20, decelerate −30
    past 60% of the distance), re-derived from the kinematics the
    reference uses (verifyImage.py:101-137) as a pure deterministic
    function (no random jitter — replay-stable)."""
    track, x, v, t = [], 0.0, 0.0, 0.2
    mid = distance * 0.6
    while x < distance:
        a = 20.0 if x < mid else -30.0
        move = v * t + 0.5 * a * t * t
        v = max(0.0, v + a * t)
        if move <= 0 and v == 0:
            move = 1.0
        x += move
        track.append(int(round(move)))
    overshoot = int(round(x)) - distance
    if overshoot:
        track.append(-overshoot)
    return track
