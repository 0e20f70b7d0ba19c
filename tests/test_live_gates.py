"""Import-gated live-path coverage (round-3 verdict #6).

The real-dependency branches (httpx RealTransport, selenium render,
PIL decode, torch scoring) are unreachable in this sandbox, so they
carry two kinds of tests:

- ``pytest.importorskip`` tests that EXERCISE the live branch when the
  dependency exists (they skip cleanly here, run in a full env) — the
  gated code stops being dead-in-CI everywhere;
- inverse-gate tests that run HERE and pin the gate semantics: strict
  mode raises ``NotImplementedError`` naming the missing dependency,
  non-strict falls back to the deterministic synthetic stand-in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


# ------------------------------------------------------------- httpx live
def test_real_transport_fetches_localhost():
    """RealTransport end-to-end against a stdlib localhost server —
    the live branch of stages/fetch.py (cipher-shuffled session, POST,
    (status, bytes) contract).  Skips where httpx is absent."""
    pytest.importorskip("httpx")
    import http.server
    import threading

    from __spider_ray.stages.fetch import RealTransport

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = b'{"fltitem": []}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        tr = RealTransport("session-key")
        status, body = tr.fetch(f"http://127.0.0.1:{srv.server_port}/x",
                                headers={"X-Proxy": "p0"})
        assert status == 200 and body == b'{"fltitem": []}'
    finally:
        srv.shutdown()


@pytest.mark.skipif(_has("httpx"), reason="httpx present; gate closed")
def test_real_transport_gate_raises_without_httpx():
    from __spider_ray.stages.fetch import FetchWorker, RealTransport
    with pytest.raises(NotImplementedError, match="httpx"):
        RealTransport("session-key")
    with pytest.raises(NotImplementedError, match="httpx"):
        FetchWorker(transport="real")


# ----------------------------------------------------------- PIL decode
def test_pil_decode_real_matches_numpy_codec():
    """The PIL branch of MediaDecodeWorker (_decode_real) must agree
    with the pure-numpy BMP codec on dimensions.  Skips without PIL."""
    pytest.importorskip("PIL")
    from __spider_ray.stages import media

    w = media.MediaDecodeWorker()
    payload = media.synth_bmp("captcha://0123456789abcdef")
    img = media.decode_bmp(payload)
    pw, ph = w._decode_real(payload)
    assert (pw, ph) == (img.shape[1], img.shape[0])


@pytest.mark.skipif(_has("PIL"), reason="PIL present; gate closed")
def test_media_strict_gate_without_payload_or_pil():
    from __spider_ray.stages import media

    w = media.MediaDecodeWorker(strict=True)
    batch = pa.table({"media_ref": pa.array(["captcha://deadbeef00000000"])})
    with pytest.raises(NotImplementedError, match="PIL|payload"):
        w(batch)


# --------------------------------------------------------- selenium render
def test_selenium_renderer_builds_driver():
    """RenderWorker's live branch: one Chrome per actor.  Skips without
    selenium; also skips if selenium is importable but no browser
    binary exists (construction is the part under test)."""
    pytest.importorskip("selenium")
    from __spider_ray.stages.render import RenderWorker

    try:
        w = RenderWorker()
    except Exception as e:  # pragma: no cover - no Chrome binary
        pytest.skip(f"selenium present but browser unavailable: {e}")
    assert w.driver is not None


@pytest.mark.skipif(_has("selenium"), reason="selenium present; gate closed")
def test_render_strict_gate_without_selenium():
    from __spider_ray.stages.render import RenderWorker

    w = RenderWorker(strict=True)
    batch = pa.table({"url": pa.array(["https://bjs.flights.test/x"])})
    with pytest.raises(NotImplementedError, match="selenium"):
        w(batch)
    # non-strict: deterministic synthetic renderer still works
    out = RenderWorker()(batch)
    assert out["rendered_body"][0].as_py().startswith(b"<html>")


@pytest.mark.skipif(_has("torch"), reason="torch present; gate closed")
def test_captcha_strict_gate_without_torch():
    from __spider_ray.stages.render import CaptchaScorer

    s = CaptchaScorer(strict=True)
    batch = pa.table({"media_ref": pa.array(["captcha://0123456789abcdef"])})
    with pytest.raises(NotImplementedError, match="torch"):
        s(batch)
    # non-strict: the pure-numpy detector produces the contract columns
    out = CaptchaScorer()(batch)
    assert {"captcha_text", "n_boxes"} <= set(out.column_names)
