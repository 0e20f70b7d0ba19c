"""Unit tests for M3/M4/M5/M6 request-construction operators and the
J1 airports broadcast enrichment."""

from __future__ import annotations

import json

import pyarrow as pa

from conftest import SF_SMALL

from __spider_ray import synth
from __spider_ray.stages import request_build as rb
from __spider_ray.stages.enrich import airports_dim, enrich_airports


def test_ua_pick_deterministic():
    urls = pa.array([f"https://h.test/{i}" for i in range(100)])
    a = rb.pick_user_agents(urls)
    b = rb.pick_user_agents(urls)
    assert a.to_pylist() == b.to_pylist()
    assert set(a.to_pylist()) <= set(synth.USER_AGENTS)
    assert len(set(a.to_pylist())) > 1           # spreads across the pool


def test_cookie_param_extraction():
    cookies = pa.array([
        "GUID=abc123; _RGUID=zzz; ctrip_userid=u42; other=1",
        "foo=bar",
        "GUID=first; GUID=second",               # last occurrence wins
    ])
    out = rb.extract_cookie_params(cookies)
    assert out["guid"].to_pylist() == ["abc123", None, "second"]
    assert out["userid"].to_pylist() == ["u42", None, None]


def test_tid_shape_and_determinism():
    t1 = rb.deterministic_tid("https://x.test/a")
    t2 = rb.deterministic_tid("https://x.test/a")
    assert t1 == t2
    assert t1.startswith("{") and t1.endswith("}")
    body = t1[1:-1].split("-")
    assert [len(p) for p in body] == [8, 4, 4, 4, 12]
    assert body[2][0] == "4"                     # uuid4 version nibble
    assert body[3][0] in "89ab"                  # uuid4 variant nibble


def test_payload_builder():
    meta = pa.StructArray.from_arrays(
        [pa.array(["广州"]), pa.array(["上海"]), pa.array(["CAN"]),
         pa.array(["SHA"]), pa.array(["2026-01-03"]),
         pa.array([0], pa.int32()), pa.array(["ua"]),
         pa.array([0], pa.timestamp("us"))],
        names=["from_city", "to_city", "from_city_code", "to_city_code",
               "flight_time", "is_low_price", "user_agent", "create_time"])
    batch = pa.table({"url": pa.array(["https://sha.flights.test/x"]),
                      "meta": meta})
    out = rb.build_payload_batch(batch)
    payload = json.loads(out["request_body"][0].as_py())
    assert payload["searchitem"] == [{"dccode": "CAN", "accode": "SHA",
                                      "dtime": "2026-01-03"}]
    assert len(payload["token"]) == 64
    assert payload["tid"] == rb.deterministic_tid("https://sha.flights.test/x")


def test_airports_enrichment():
    dim = airports_dim(SF_SMALL)
    assert dim["BJS"] == "北京国际机场"
    assert dim["CQW"] == "重庆国际机场"
    t = pa.table({
        "from_city_code": pa.array(["BJS", "ZZZ"]),
        "from_city_airport": pa.array(["", ""]),
        "to_city_code": pa.array(["CQW", "BJS"]),
        "to_city_airport": pa.array(["", ""]),
    })
    out = enrich_airports(t, dim)
    assert out["from_city_airport"].to_pylist() == ["北京国际机场", ""]
    assert out["to_city_airport"].to_pylist() == ["重庆国际机场", "北京国际机场"]
