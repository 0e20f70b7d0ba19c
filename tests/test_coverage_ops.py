"""Tests for the parity operators: render/captcha stubs (S4/T1-T4),
HTML span extraction (M13), scalar battery (§2.8), CSV sink (S6),
stage registry (§2.10), credentials actor (S11/J3), proxy rotation
(S12)."""

from __future__ import annotations

import csv
import os

import pyarrow as pa
import pytest
import ray.data

from conftest import SF_SMALL

from __spider_ray import synth
from __spider_ray.functions import scalar
from __spider_ray.pipelines.registry import StagePipeline
from __spider_ray.sources.csv_sink import CSV_COLUMNS, write_partitioned_csv
from __spider_ray.stages import html_extract, render
from __spider_ray.stages.fetch import FetchWorker
from __spider_ray.state.credentials import CredentialClient


def test_render_worker_synthetic():
    w = render.RenderWorker()
    urls = [u for u in (f"https://h.test/r{i}" for i in range(60))
            if synth.page_status(u)[0] == 200][:5]
    out = w(pa.table({"url": pa.array(urls)}))
    body = out["rendered_body"][0].as_py().decode()
    assert "flight-desc" in body
    # strict mode marks the real-decode boundary
    with pytest.raises(NotImplementedError):
        render.RenderWorker(strict=True)(pa.table({"url": pa.array(urls)}))


def test_html_extract_matches_json_parse_fields():
    url = next(u for u in (f"https://h.test/x{i}" for i in range(60))
               if synth.page_status(u)[0] == 200)
    docs = html_extract.html_to_docs_batch(
        pa.table({"url": pa.array([url]),
                  "rendered_body": pa.array([render.synthetic_html(url)],
                                            pa.binary())}))
    assert docs.num_rows == 1
    spans = docs["spans"][0].as_py()
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    f0 = synth.flight_fields(url, 0)
    assert texts[0] == f0["company"]             # first flight row leads
    assert f0["price"] in texts
    assert f"{f0['start_time']}-{f0['end_time']}" in texts
    media = [s for s in spans if s["kind"] == "media"]
    for m in media:
        assert m["media_ref"].startswith("captcha://")
    offs = [s["offset"] for s in spans]
    assert offs == list(range(len(offs)))


def test_captcha_scorer_stub():
    w = render.CaptchaScorer()
    out = w(pa.table({"media_ref": pa.array(["captcha://ab", "captcha://cd"])}))
    assert out["n_boxes"].to_pylist() == [len(x) for x in out["click_xs"].to_pylist()]
    assert all(2 <= n <= 4 for n in out["n_boxes"].to_pylist())
    # deterministic
    out2 = w(pa.table({"media_ref": pa.array(["captcha://ab", "captcha://cd"])}))
    assert out["captcha_text"].to_pylist() == out2["captcha_text"].to_pylist()


def test_slider_track_sums_to_distance():
    for d in (37, 120, 260):
        track = render.slider_track(d)
        assert sum(track) == d
        assert all(isinstance(x, int) for x in track)


def test_scalar_battery():
    assert scalar.hhmm_truncate(pa.array(["08:05:33"])).to_pylist() == ["08:05"]
    assert scalar.company_code(pa.array(["MU5100"])).to_pylist() == ["MU"]
    ts = pa.array([1_700_000_000_000_000], pa.timestamp("us"))
    assert scalar.epoch_millis(ts).to_pylist() == [1_700_000_000_000]
    assert scalar.epoch_millis_scalar("1970-01-01 00:00:01") == 1000
    assert scalar.discount_label(pa.array([35, 99])).to_pylist() == ["3.5折", "9.9折"]
    assert scalar.day_window("2026-01-01", 0, 0) == ["2026-01-01"]
    assert len(scalar.day_window("2026-01-01", -1, -1)) == 15
    assert scalar.day_window("2026-01-01", 2, 4) == [
        "2026-01-03", "2026-01-04", "2026-01-05"]


def test_has_field_probe():
    meta = pa.StructArray.from_arrays(
        [pa.array(["a", None]), pa.array([None, "b"])], names=["x", "y"])
    t = pa.table({"meta": meta})
    assert scalar.has_field(t, "meta.x").to_pylist() == [True, False]
    assert scalar.has_field(t, "meta.y").to_pylist() == [False, True]


def test_partitioned_csv_sink(tmp_path):
    from __spider_ray.pipelines import crawl
    recs = crawl.flight_records(SF_SMALL).limit(500)
    out = str(tmp_path / "csvs")
    manifest = write_partitioned_csv(recs, out).to_pandas()
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == len(manifest)
    assert manifest["rows"].sum() == 500
    with open(os.path.join(out, files[0]), encoding="utf-8") as f:
        rows = list(csv.reader(f))
    assert rows[0] == CSV_COLUMNS
    assert len(rows) >= 2


def test_stage_registry_order_and_apply():
    p = StagePipeline()
    p.register("double", lambda t: t.set_column(0, "x", pa.compute.multiply(t["x"], 2)),
               priority=200)
    p.register("inc", lambda t: t.set_column(0, "x", pa.compute.add(t["x"], 1)),
               priority=50)
    assert p.names() == ["inc", "double"]
    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
    out = p.apply(ds).to_pandas()
    assert list(out["x"]) == [4, 6]              # (x+1)*2 — priority order
    with pytest.raises(ValueError):
        p.register("inc", lambda t: t)
    p.remove("double")
    assert p.names() == ["inc"]


def test_credentials_refresh_and_invalidate():
    c = CredentialClient(ttl_s=3600)
    t1 = c.token("ctrip")
    assert t1 == c.token("ctrip")               # cached within TTL
    c.invalidate("ctrip")
    t2 = c.token("ctrip")
    assert t2 != t1                             # refreshed, job not killed
    assert c.token("yl") != t2                  # per-platform


def test_proxy_rotation():
    w = FetchWorker(proxies=["p0", "p1", "p2"])
    assert [w.next_proxy() for _ in range(5)] == ["p0", "p1", "p2", "p0", "p1"]


def test_bmp_codec_roundtrip_and_resize():
    """The numpy BMP codec must round-trip pixels exactly (incl. the
    4-byte row padding and bottom-up row order) and resize must gather
    the expected nearest-neighbor pixels."""
    import numpy as np

    from __spider_ray.stages import media
    rng = np.random.RandomState(5)
    for w, h in [(3, 2), (17, 9), (64, 33)]:   # odd widths hit padding
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)
        back = media.decode_bmp(media.encode_bmp(img))
        assert back.shape == (h, w, 3)
        assert (back == img).all(), (w, h)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = media.resize_nearest(img, 3, 2)
    assert small.shape == (2, 3, 3)
    assert (small[0, 0] == img[0, 0]).all()
    assert (small[1, 2] == img[2, 4]).all()


def test_media_pixel_pipeline_real_decode():
    """End-to-end pixel path: synthetic BMP payloads decode to their
    true dims (not the metadata fake), pooled-grid features match a
    per-image numpy reference, and the query runs over real spans."""
    import numpy as np

    from __spider_ray.pipelines.queries import _media_pixels
    from __spider_ray.stages import media
    ref = "captcha://deadbeef01234567"
    payload = media.synth_bmp(ref)
    img = media.decode_bmp(payload)
    batch = pa.table({"media_ref": pa.array([ref]),
                      "payload": pa.array([payload], pa.binary())})
    out = media.MediaDecodeWorker()(batch)
    assert out["width"][0].as_py() == img.shape[1]
    assert out["height"][0].as_py() == img.shape[0]
    feat = media.MediaFeatureWorker()(out)
    f = np.array(feat["feature"][0].as_py())
    gray = img.astype(np.float64).mean(axis=2)
    hh, ww = gray.shape
    ys = (np.arange(5) * hh) // 4
    xs = (np.arange(5) * ww) // 4
    want = np.array([gray[ys[a]:ys[a + 1], xs[b]:xs[b + 1]].mean()
                     for a in range(4) for b in range(4)])
    want /= np.linalg.norm(want)
    assert np.allclose(f, want)
    res = _media_pixels(SF_SMALL).to_pandas()
    assert len(res) > 0
    assert (res["width"] >= 16).all() and (res["width"] <= 63).all()
    assert (res["target_w"] <= 64).all() and (res["target_h"] <= 64).all()
    assert res["resized_mean_centi"].between(0, 25500).all()


def test_wav_codec_and_audio_features():
    import numpy as np

    from __spider_ray.stages import media
    rate = 8000
    pcm = (np.sin(2 * np.pi * 440 * np.arange(4000) / rate) * 20000).astype("<i2")
    back, r2 = media.decode_wav(media.encode_wav(pcm, rate))
    assert r2 == rate and (back == pcm).all()
    f = media.audio_features(pcm, rate)
    assert f["n_samples"] == 4000 and f["duration_ms"] == 500
    # RMS of a sine ≈ amplitude/√2
    assert abs(f["rms_milli"] - round(20000 / 32768 / np.sqrt(2) * 1000)) <= 2
    # 440 Hz over 0.5 s → ~440 zero crossings
    assert 400 <= f["zero_crossings"] <= 480
    # synthetic payloads are pure functions of the ref
    assert media.synth_wav("captcha://x") == media.synth_wav("captcha://x")


def test_actor_pool_survives_actor_death_mid_run():
    """Round-3 verdict #3: a broadcast-carrying actor pool must survive
    one of its actors dying mid-run.  The fix: constructor payloads are
    plain VALUES in fn_constructor_kwargs (they ride the actor-creation
    spec, so a restarted actor re-materializes them with no driver-ref
    liveness dependency — ray#53727), and the pool keeps Ray Data's
    default max_restarts=-1 (max_restarts=0 was verified to turn any
    actor death into a whole-job abort).  One actor os._exit(1)s on its
    first batch; the dataset must still produce every row, exactly
    once."""
    import os

    import numpy as np
    import ray
    import ray.data

    @ray.remote
    class KillOnce:
        def __init__(self):
            self.done = False

        def take(self) -> bool:
            if not self.done:
                self.done = True
                return True
            return False

    flag = KillOnce.remote()

    class Scorer:  # same shape as knn.BruteForceTopK: value payload + state
        def __init__(self, queries):
            self.add = queries
            self.first = True

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.first:
                self.first = False
                if ray.get(flag.take.remote()):
                    os._exit(1)          # simulated actor crash mid-batch
            return pa.table(
                {"x": pa.compute.add(t["x"], self.add)})

    ds = ray.data.range(20000).map_batches(
        lambda b: pa.table({"x": pa.array(b["id"])}), batch_format="numpy")
    out = ds.map_batches(Scorer, fn_constructor_kwargs={"queries": np.int64(3)},
                         batch_format="pyarrow", batch_size=1000,
                         concurrency=2, num_cpus=0.5)
    assert out.sum("x") == sum(range(20000)) + 3 * 20000
    assert out.count() == 20000


def test_video_frame_sampling():
    import numpy as np

    from __spider_ray.stages import media
    ref = "captcha://feedface87654321"
    payload = media.synth_video(ref)
    every = media.sample_frames(payload, 1)
    sampled = media.sample_frames(payload, 2)
    assert len(sampled) == (len(every) + 1) // 2
    for i, fr in enumerate(sampled):
        want = media.decode_bmp(media.synth_bmp(f"{ref}#frame{2 * i}"))
        assert (fr == want).all()
    batch = pa.table({"media_ref": pa.array([ref]),
                      "payload": pa.array([payload], pa.binary())})
    out = media.FrameSampleWorker(every=2)(batch)
    assert out["n_sampled_frames"][0].as_py() == len(sampled)
    want_mean = int(round(float(np.mean(
        [f.astype(np.float64).mean() for f in sampled])) * 100))
    assert out["sampled_mean_centi"][0].as_py() == want_mean
