"""Request construction operators — M3 (UA/header build), M4 (cookie →
params extraction), M5 (payload build) from SURVEY.md §2.2.

The reference builds these imperatively per request:
- UA pick: ``random.choice(user_agent_list)`` (``spiders/ctripSpider.py:157``)
  — here a pure hash of the URL (replay-deterministic);
- cookie parsing: split "k=v; k=v" pairs, extract GUID / userid
  (``spiders/ctripSpider.py:185-196``, ``ylSpider06.py:174-186``);
- POST payload: nested JSON with search items and session tokens
  (``spiders/ctripSpider.py:198-220``); the JS ``uuidv4``/``btoa`` helpers
  (``spiders/ctripSpider.py:88-99``, ``spiders/parse.js:1-19``) become
  pure-Python deterministic equivalents (M6) — no JS runtime.

All vectorized: cookie splitting uses pyarrow string kernels; payloads
are one json.dumps per request row (inherent — it IS the body).
"""

from __future__ import annotations

import base64
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import synth
from ..functions.hashing import hash64


def pick_user_agents(urls: pa.Array) -> pa.Array:
    """M3: deterministic UA per URL (hash-based replacement for the
    reference's random.choice, ctripSpider.py:157)."""
    idx = (hash64(urls, seed=7) % np.uint64(len(synth.USER_AGENTS))).astype(np.int64)
    return pc.take(pa.array(synth.USER_AGENTS, pa.string()), pa.array(idx))


def extract_cookie_params(cookies: pa.Array) -> pa.Table:
    """M4: cookie-string → (guid, userid) columns.

    Mirrors the reference's split-and-scan (ctripSpider.py:185-196):
    ``GUID`` key → guid, any key containing ``userid`` → userid.
    Vectorized with Arrow list kernels over the split pairs.
    """
    pairs = pc.split_pattern(cookies.cast(pa.string()), pattern=";")
    flat = pairs.flatten()
    counts = np.asarray(pairs.value_lengths())
    row_of = np.repeat(np.arange(len(counts)), counts)
    kv = pc.split_pattern(pc.utf8_trim_whitespace(flat), pattern="=", max_splits=1)
    # pairs without '=' (trailing ';', flag attributes like 'Secure')
    # split into ONE element — pc.list_element(kv, 1) would raise on
    # them; skip them like the reference's split-and-scan does
    has_val = np.asarray(pc.greater_equal(pc.list_value_length(kv), 2)
                         .to_numpy(zero_copy_only=False), dtype=bool)
    kv = kv.filter(pa.array(has_val))
    row_of = row_of[has_val]
    keys = pc.list_element(kv, 0)
    vals = pc.list_element(kv, 1)

    def pick(mask: pa.Array) -> pa.Array:
        m = np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool)
        out = np.full(len(counts), None, dtype=object)
        vals_np = np.asarray(vals.to_numpy(zero_copy_only=False), dtype=object)
        # last occurrence wins (reference scans in order, overwrites)
        for i in np.nonzero(m)[0]:
            out[row_of[i]] = vals_np[i]
        return pa.array(out, pa.string())

    guid = pick(pc.equal(keys, "GUID"))
    userid = pick(pc.match_substring(keys, "userid"))
    return pa.table({"guid": guid, "userid": userid})


def deterministic_tid(url: str) -> str:
    """M6: uuidv4-shaped session id as a pure function of the URL
    (replaces the execjs uuid at ctripSpider.py:88-99)."""
    h = synth.md5("tid:" + url)
    return (f"{{{h[0:8]}-{h[8:12]}-4{h[13:16]}-"
            f"{'89ab'[int(h[16], 16) % 4]}{h[17:20]}-{h[20:32]}}}")


def mystery_token(url: str) -> str:
    """M6: the base64 'mystery' token (btoa(...)[:64] analog,
    ctripSpider02.py:209-235) — deterministic."""
    raw = synth.md5("tok:" + url) + synth.md5("tok2:" + url)
    return base64.b64encode(raw.encode()).decode()[:64]


def build_payload_batch(batch: pa.Table) -> pa.Table:
    """M5: frontier batch → request body column (POST JSON shaped like
    the reference's flightListSearch payload, ctripSpider.py:198-220).
    One json.dumps per request row — the body IS the output."""
    meta = batch["meta"].combine_chunks()
    fc = meta.field("from_city_code").to_pylist()
    tc = meta.field("to_city_code").to_pylist()
    ft = meta.field("flight_time").to_pylist()
    urls = batch["url"].to_pylist()
    bodies = []
    for i, u in enumerate(urls):
        payload = {
            "contentType": "json",
            "head": {"cver": "1.0", "lang": "01", "syscode": "09"},
            "searchitem": [{"dccode": fc[i], "accode": tc[i], "dtime": ft[i]}],
            "tid": deterministic_tid(u),
            "token": mystery_token(u),
            "trptpe": 1,
        }
        bodies.append(json.dumps(payload, ensure_ascii=False).encode())
    return batch.append_column("request_body", pa.array(bodies, pa.binary()))
