"""Unit tests for individual stages/functions (SURVEY.md §5a)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from __spider_ray import synth
from __spider_ray.functions.hashing import hash64, md5_hex, uniform01
from __spider_ray.stages import canonicalize as canon
from __spider_ray.stages.fetch import fetch_batch
from __spider_ray.stages.parse import parse_batch, split_fetch_results
from __spider_ray.stages.spans import records_to_docs


def test_hash64_matches_scalar_reference():
    """Vectorized FNV-1a must equal a straightforward scalar FNV-1a."""
    def scalar_fnv(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        # same splitmix64 finish as hash64
        h ^= h >> 30; h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 27; h = (h * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
        return h
    vals = ["", "a", "abc", "北京", "https://x.test/p?q=1", "aaaaaaaaaaaaaaaaaa"]
    got = hash64(pa.array(vals))
    for v, g in zip(vals, got):
        assert int(g) == scalar_fnv(v), v


def test_hash64_distribution_and_determinism():
    vals = pa.array([f"url-{i}" for i in range(20000)])
    h1, h2 = hash64(vals), hash64(vals)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 20000          # no collisions on 20k keys
    assert (hash64(vals, seed=1) != h1).mean() > 0.99


def test_hash64_sliced_array_matches_unsliced():
    """A nonzero-offset slice must hash identically to the same values in
    a fresh array (the offsets buffer is shared with the parent)."""
    vals = [f"url-{i}" * (i % 5 + 1) for i in range(1000)]
    whole = pa.array(vals, type=pa.large_string())
    sliced = whole.slice(137, 500)
    fresh = pa.array(vals[137:637], type=pa.large_string())
    assert (hash64(sliced) == hash64(fresh)).all()


def test_v2_body_is_double_encoded_and_parser_reads_cards():
    """The v2 body's 'data' value must be a JSON STRING (double encoding,
    ctripSpider02.py:272) and the parser must read fields from the CARDS,
    not from request meta."""
    import json
    # find a 200 page with at least one card
    url = next(u for u in
               (f"https://pek.flights.test/listcards/SHA-PEK/2026-01-0{d}?v={v}"
                for d in range(1, 9) for v in range(40))
               if synth.page_status_v2(u)[0] == 200 and synth.page_status_v2(u)[2] > 0)
    body = synth.page_body_v2(url)
    outer = json.loads(body)
    assert isinstance(outer["data"], str)          # double-encoded
    inner = json.loads(outer["data"])
    assert inner["cityMessage"] == "SHA城|PEK城"
    cards = inner["listCards"]
    assert all(set(c) >= {"crossDays", "totalDuration", "ticketCounts",
                          "stops", "stopTimes", "airlines"} for c in cards)
    # parse through the real stage
    from __spider_ray.stages.parse import parse_v2_batch
    n = len(cards)
    meta = pa.StructArray.from_arrays(
        [pa.array(["2026-01-01"]), pa.array([synth.CREATE_TIME_STR])],
        names=["flight_time", "create_time"])
    batch = pa.table({
        "url": pa.array([url]), "host": pa.array(["pek.flights.test"]),
        "seed_index": pa.array([1], pa.int64()),
        "day_offset": pa.array([0], pa.int32()),
        "meta": meta,
        "status": pa.array([200], pa.int32()),
        "error": pa.array([None], pa.string()),
        "body": pa.array([body], pa.binary()),
    })
    out = parse_v2_batch(batch)
    assert out.num_rows == n
    assert out["from_city"][0].as_py() == "SHA城"
    assert out["from_city_airport"][0].as_py() == "SHA机场"
    # HH:MM truncation of the card's full datetime
    t0 = cards[0]["departDateTime"].split(" ")[1]
    assert out["start_time"][0].as_py() == t0[:5]
    # running count semantics (the v2 'count' variable)
    assert out["flight_number"].to_pylist() == list(range(1, n + 1))
    stops0 = cards[0]["stops"]
    assert out["flight_type"][0].as_py() == ("经停" if stops0 else "")


def test_real_transport_surface():
    """The live-HTTP plug point: deterministic cipher shuffle (same key
    → same suite, different keys → different order, all ciphers kept)
    and a clean import gate when httpx is absent."""
    from __spider_ray.stages.fetch import (ORIGIN_CIPHERS, RealTransport,
                                           shuffled_ciphers)
    a, b = shuffled_ciphers("session-1"), shuffled_ciphers("session-1")
    assert a == b                                  # replay-stable
    c = shuffled_ciphers("session-2")
    assert a.endswith(":!aNULL:!MD5:!DSS")
    base = set(ORIGIN_CIPHERS.split(":"))
    assert set(a.split(":")) - {"!aNULL", "!MD5", "!DSS"} == base
    assert a != c or len(base) <= 1
    try:
        import httpx  # noqa: F401
        have_httpx = True
    except ImportError:
        have_httpx = False
    if not have_httpx:
        import pytest
        with pytest.raises(NotImplementedError, match="httpx"):
            RealTransport("session-1")


def test_uniform01_range():
    u = uniform01(pa.array([f"u{i}" for i in range(1000)]), salt="x")
    assert (u >= 0).all() and (u < 1).all()
    assert 0.4 < u.mean() < 0.6


def test_md5_parity_with_duckdb():
    import duckdb
    vals = ["abc", "https://pek.flights.test/flightlist/A-B/2026-01-01#3", "北京"]
    want = [duckdb.sql(f"select md5('{v}')").fetchone()[0] for v in vals]
    assert md5_hex(vals) == want


def test_canonicalize_rules():
    t = pa.table({
        "seed_id": [1, 2, 3],
        "from_city_name": ["北京", "武隆", "广州"],
        "from_city_code": ["PKX", "CQW", "CAN"],
        "to_city_name": ["上海", "北京", "武隆"],
        "to_city_code": ["SHA", "PEK", "CQW"],
    })
    out = canon.canonicalize_seed_batch(t)
    assert out["from_city_code"].to_pylist() == ["BJS", "CQW", "CAN"]
    assert out["to_city_code"].to_pylist() == ["SHA", "BJS", "CQW"]
    assert out["from_city_name"].to_pylist() == ["北京", "重庆", "广州"]
    assert out["to_city_name"].to_pylist() == ["上海", "北京", "重庆"]


def test_airport_map():
    codes = pa.array(["PKX", "SHA", "TFU", "CAN", "CKG"])
    got = canon.canonical_airport(codes).to_pylist()
    assert got == ["PEK", "PVG", "CTU", "CAN", "CKG"]


def _frontier_batch(urls):
    n = len(urls)
    meta = pa.StructArray.from_arrays(
        [pa.array(["广州"] * n), pa.array(["上海"] * n),
         pa.array(["CAN"] * n), pa.array(["SHA"] * n),
         pa.array(["2026-01-01"] * n),
         pa.array(np.zeros(n, dtype=np.int32)),
         pa.array(["ua"] * n),
         pa.array(np.full(n, np.datetime64("2026-01-01T00:00:00", "us")))],
        names=["from_city", "to_city", "from_city_code", "to_city_code",
               "flight_time", "is_low_price", "user_agent", "create_time"])
    return pa.table({
        "url": pa.array(urls),
        "host": pa.array(["h.test"] * n),
        "depth": pa.array(np.zeros(n, dtype=np.int32)),
        "priority": pa.array(np.zeros(n)),
        "seed_index": pa.array(np.arange(n, dtype=np.int64)),
        "day_offset": pa.array(np.zeros(n, dtype=np.int32)),
        "meta": meta,
    })


def test_fetch_parse_roundtrip():
    # find one URL per branch
    urls, want = [], {}
    i = 0
    while len(urls) < 40:
        u = f"https://h.test/p{i}"
        urls.append(u)
        want[u] = synth.page_status(u)
        i += 1
    fb = fetch_batch(_frontier_batch(urls))
    assert fb.num_rows == len(urls)
    for u, st, err in zip(fb["url"].to_pylist(), fb["status"].to_pylist(),
                          fb["error"].to_pylist()):
        assert (st, err) == (want[u][0], want[u][1])
    recs = parse_batch(fb)
    # shared (icsf) flights are filtered (ylSpider06.py:331-334); the
    # emitted count and flight_number reflect the KEPT flights only
    kept = {u: [i for i in range(want[u][2])
                if not synth.flight_fields(u, i)["icsf"]]
            for u in urls if want[u][0] == 200}
    ok_urls = [u for u, ks in kept.items() if ks]
    assert set(recs["url"].to_pylist()) == set(ok_urls)
    for u in ok_urls:
        ks = kept[u]
        sub = recs.filter(pa.compute.equal(recs["url"], u))
        assert sub.num_rows == len(ks)
        assert sorted(sub["flight_idx"].to_pylist()) == ks   # response positions
        assert sub["flight_number"].to_pylist() == [len(ks)] * len(ks)
    dead = split_fetch_results(fb)
    assert set(dead["url"].to_pylist()) == set(u for u in urls if want[u][0] != 200)


def test_vectorized_fetch_bit_identical_to_scalar():
    """page_responses_v1 (the vectorized hot path fetch_batch uses by
    default) must be BIT-identical — status, error, and full JSON body
    — to the scalar page_status/page_body derivation the SQL oracle
    mirrors, across every response branch (timeout/403/500/200 and
    every flight-count)."""
    urls = [f"https://h{i % 7}.test/vec{i}" for i in range(3000)]
    st, err, bodies = synth.page_responses_v1(urls)
    seen_status = set()
    for i, u in enumerate(urls):
        s, e, _n = synth.page_status(u)
        assert (int(st[i]), err[i]) == (s, e)
        assert bodies[i] == synth.page_body(u)
        seen_status.add(s)
    assert seen_status == {0, 403, 500, 200}   # every branch exercised


def test_vectorized_detail_bodies_bit_identical():
    """synth.detail_bodies (the vectorized depth-1 fetch path) must be
    bit-identical to the scalar detail_body derivation the SQL oracle
    mirrors."""
    urls = [synth.detail_url(f"h{i % 5}.test", f"CA{1000 + i}",
                             f"2026-01-{1 + i % 28:02d}") for i in range(500)]
    vec = synth.detail_bodies(urls)
    assert vec == [synth.detail_body(u) for u in urls]
    assert synth.detail_bodies([]) == []


def test_records_to_docs_structure():
    urls = [f"https://h.test/d{i}" for i in range(50)]
    fb = fetch_batch(_frontier_batch(urls))
    recs = parse_batch(fb)
    docs = records_to_docs(recs)
    assert docs.num_rows == len(set(recs["doc_id"].to_pylist()))
    spans = docs["spans"].combine_chunks()
    for doc_spans in docs["spans"].to_pylist():
        offs = [s["offset"] for s in doc_spans]
        assert offs == list(range(len(offs)))
        for s in doc_spans:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None
            else:
                assert s["kind"] == "media"
                assert s["text"] is None and s["media_ref"].startswith("captcha://")


def test_empty_parse_batch():
    fb = fetch_batch(_frontier_batch([]))
    recs = parse_batch(fb)
    assert recs.num_rows == 0
    docs = records_to_docs(recs)
    assert docs.num_rows == 0


def test_fetch_worker_live_path_with_fake_transport():
    """The transport!=None branch: proxy rotation, credential header,
    bounded retries, and error rows — driven by a stub transport (httpx
    absent in the sandbox, so the live path is tested via injection)."""
    from __spider_ray.stages.fetch import FetchWorker

    class FakeTransport:
        def __init__(self):
            self.calls = []

        def fetch(self, url, headers=None):
            self.calls.append((url, dict(headers or {})))
            if "fail" in url:
                raise ConnectionError("boom")
            return 200, b'{"fltitem": []}'

    class FakeCreds:
        def token(self, platform):
            return f"tok-{platform}"

    w = FetchWorker(max_retries=1)
    w.transport = FakeTransport()          # inject (ctor needs httpx)
    w.credentials = FakeCreds()
    batch = pa.table({
        "url": pa.array(["https://h.test/ok1", "https://h.test/fail",
                         "https://h.test/ok2"]),
        "host": pa.array(["h.test"] * 3),
    })
    out = w(batch)
    assert out["status"].to_pylist() == [200, 0, 200]
    assert out["error"].to_pylist()[1] is not None
    assert out["error"].to_pylist()[0] is None
    # bounded retries: the failing URL was attempted max_retries+1 times
    fails = [c for c in w.transport.calls if "fail" in c[0]]
    assert len(fails) == 2
    # proxy rotation + credential header on every attempt
    proxies = [h["X-Proxy"] for _u, h in w.transport.calls]
    assert len(set(proxies)) > 1
    assert all(h["Cookie"] == "tok-ctrip" for _u, h in w.transport.calls)


def test_day_window_reference_semantics():
    """ctripSpider.py:148-153 verbatim: (0,0)→[0]; -1 anywhere→15-day
    horizon; else inclusive [from, to]."""
    import numpy as np
    import pytest
    from __spider_ray.stages.expand import day_window
    assert day_window(0, 0).tolist() == [0]
    assert day_window(-1, 7).tolist() == list(range(15))
    assert day_window(4, -1).tolist() == list(range(15))
    assert day_window(3, 9).tolist() == [3, 4, 5, 6, 7, 8, 9]
    assert day_window(5, 5).tolist() == [5]
    with pytest.raises(ValueError):
        day_window(9, 3)


def test_expand_batch_day_window_offsets_and_priority():
    """An absolute window keeps the true day offsets in day_offset (and
    the URLs) while priority ranks by POSITION so crawl order stays
    seed-major × window order."""
    import numpy as np
    import pyarrow as pa
    from __spider_ray.stages.expand import day_window, expand_batch
    seeds = pa.table({
        "seed_id": pa.array([7, 8], pa.int64()),
        "from_city_name": pa.array(["x", "y"]),
        "from_city_code": pa.array(["AAA", "BBB"]),
        "to_city_name": pa.array(["z", "w"]),
        "to_city_code": pa.array(["CCC", "DDD"]),
    })
    out = expand_batch(seeds, days=day_window(3, 5))
    assert out.num_rows == 6
    assert out["day_offset"].to_pylist() == [3, 4, 5, 3, 4, 5]
    prio = out["priority"].to_numpy()
    assert prio.tolist() == [21.0, 22.0, 23.0, 24.0, 25.0, 26.0]
    assert all("2026-01-0" in u for u in out["url"].to_pylist())


def test_captions_batch_fixture():
    """Hand-built interleaved docs: forward fill, per-doc reset,
    media-before-any-text → null, null text spans skipped."""
    import pyarrow as pa

    from __spider_ray.schemas import SPAN
    from __spider_ray.stages.spans import captions_batch

    def span(kind, text=None, ref=None, off=0):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    docs = pa.table({
        "doc_id": pa.array(["d0", "d1", "d2"], pa.string()),
        "spans": pa.array([
            # d0: text A, media m0 (→A), null-text span, media m1 (→A)
            [span("text", "A", off=0), span("media", ref="m0", off=1),
             span("text", None, off=2), span("media", ref="m1", off=3)],
            # d1: media first (no caption), then text B, media m2 (→B)
            [span("media", ref="m2", off=0), span("text", "B", off=1),
             span("media", ref="m3", off=2)],
            # d2: text only — contributes no rows, must not leak into d1/d0
            [span("text", "C", off=0)],
        ], pa.list_(SPAN)),
    })
    out = captions_batch(docs).to_pylist()
    got = {(r["doc_id"], r["media_ref"]): r["caption"] for r in out}
    assert got == {("d0", "m0"): "A", ("d0", "m1"): "A",
                   ("d1", "m2"): None, ("d1", "m3"): "B"}
    offs = [(r["doc_id"], r["media_offset"]) for r in out]
    assert offs == [("d0", 1), ("d0", 3), ("d1", 0), ("d1", 2)]


def test_captions_batch_empty():
    import pyarrow as pa

    from __spider_ray.schemas import SPAN
    from __spider_ray.stages.spans import captions_batch

    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "spans": pa.array([], pa.list_(SPAN))})
    assert captions_batch(empty).num_rows == 0
