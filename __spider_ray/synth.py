"""Deterministic synthetic web — the sandbox stand-in for network fetch.

The reference crawls live OTAs (``m.ctrip.com`` POST API at
``spiders/ctripSpider.py:222-225``).  This sandbox has no network, so
fetch is simulated: every page body is a *pure function of its URL*
(md5-derived), which makes the whole crawl reproducible AND lets the
driver's DuckDB oracle regenerate the exact same content in SQL
(``md5()`` + hex-slice arithmetic — verified bit-identical).

Derivation spec (the single source of truth; mirrored in
``pipelines/oracle_sqlgen.py``):

- seeds come from the driver's ``customer``×``nation`` tables
  (seed_id = c_custkey), with 北京/武隆 special rows injected every
  50th/41st key to exercise the reference's canonicalization
  (``spiders/ctripSpider.py:141-146``);
- frontier = seeds × day_offset∈[0,15) (``spiders/ctripSpider.py:148-156``
  ``days = range(15)``), flight_time = BASE_DATE + day_offset;
- page status/flight-count derive from ``md5(url)``;
- flight *i*'s fields derive from ``md5(url + '#' + i)``.

NOTE on loops: md5-per-URL is a Python-level call by design — it is the
synthetic replacement for a network round-trip and runs inside fetch
``map_batches`` workers (one md5 per *page*, not per row of a 100 TB
table).  Everything downstream of "fetch" is vectorized Arrow.
"""

from __future__ import annotations

import hashlib
import json
from datetime import date, timedelta

import numpy as np
import pyarrow as pa


def date_fromisoformat(s: str) -> date:
    return date.fromisoformat(s)

# ---------------------------------------------------------------- constants
BASE_DATE = date(2026, 1, 1)              # crawl day (fixed ⇒ deterministic)
BASE_DATE_STR = "2026-01-01"
CREATE_TIME_STR = "2026-01-01 00:00:00"   # replaces datetime.now() (ctripSpider.py:158)
N_DAYS = 15                               # days = range(15) (ctripSpider.py:150-153)
TASK_TIME = "00"                          # hourly cadence slot (start_spider_demo.sh:2)
SERVER_IP = "ray-0"                       # replaces ip_map lookup (ylutils/ip_map.py:6-10)
PLATFORM = "ctrip"

# airline (name, 2-letter code) pool — flight i picks by hex digit
COMPANIES = [
    ("国航", "CA"), ("东航", "MU"), ("南航", "CZ"),
    ("海航", "HU"), ("川航", "3U"), ("厦航", "MF"),
]
# stopover-city pool — picked by one hex digit (16 entries)
TRANSFER_CITIES = [
    "西安", "郑州", "武汉", "长沙", "昆明", "乌鲁木齐", "兰州", "南京",
    "杭州", "青岛", "沈阳", "哈尔滨", "贵阳", "太原", "合肥", "南昌",
]
# deterministic UA pool — replaces random.choice(user_agent_list)
# (spiders/ctripSpider.py:157; the 300-entry list at settings.py:102-451)
USER_AGENTS = [f"spider-ray-ua/{i}" for i in range(8)]


def _hx(h: str, a: int, b: int) -> int:
    """int(h[a:b], 16) — SQL: ('0x' || substr(h, a+1, b-a))::BIGINT."""
    return int(h[a:b], 16)


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------- seeds
# The 北京/武隆 seed-injection rule (from-side: custkey%50∈{0,1} →
# 北京/PKX, 武隆/CQW; to-side: custkey%41 with PEK) lives in ONE place —
# stages/expand._seed_side (vectorized) — mirrored by the SQL oracle
# (oracle_sqlgen.SEEDS_CTE) and the conformance simulator.

def nation_code(n_name: str, n_nationkey: int) -> str:
    """City code for a nation row: upper 3-prefix + nationkey."""
    return n_name[:3].upper() + str(n_nationkey)


# ---------------------------------------------------------------- fetch
def page_status(url: str) -> tuple[int, str | None, int]:
    """(status, error, n_flights) for a URL.

    First md5 hex digit routes the response branch
    (``spiders/ctripSpider.py:243-332``): 0 → transport error (the
    reference's '**' sentinel, YlSpiderMiddleware.py:186-194),
    1 → 403, 2 → 500, else 200.  Second digit sizes fltitem[].
    """
    h = md5(url)
    d0 = _hx(h, 0, 1)
    if d0 == 0:
        return 0, "timeout", 0
    if d0 == 1:
        return 403, None, 0
    if d0 == 2:
        return 500, None, 0
    return 200, None, 1 + _hx(h, 1, 2) % 5


def flight_fields(url: str, i: int) -> dict:
    """Flight *i* of a page — every field a pure md5 derivation.

    Mirrors the per-flight extraction shape of the reference parser
    (``spiders/ctripSpider.py:253-292``) without any network data.
    """
    h = md5(f"{url}#{i}")
    company, code = COMPANIES[_hx(h, 0, 1) % len(COMPANIES)]
    plane_no = code + str(1000 + _hx(h, 1, 5) % 9000)
    dep_h, dep_m = _hx(h, 5, 7) % 24, (_hx(h, 7, 9) % 12) * 5
    dur = 60 + _hx(h, 9, 11) % 180
    end_tot = (dep_h * 60 + dep_m + dur) % 1440
    price = 200 + _hx(h, 11, 15) % 1800
    disc_tenths = 20 + _hx(h, 15, 17) % 80
    # three-way classification (ylSpider06.py:361-373): 'sc' node → 经停
    # (stopover), 'ps.g5.g5sc' → 联程 (connecting itinerary), else 直飞
    d17 = _hx(h, 17, 18)
    if d17 < 3:
        ftype, transfer = "经停", TRANSFER_CITIES[_hx(h, 18, 19)]
    elif d17 < 5:
        ftype, transfer = "联程", TRANSFER_CITIES[_hx(h, 18, 19)]
    else:
        ftype, transfer = "直飞", ""
    return {
        "company": company,
        "company_no": code,                      # plane_no[0:2] (ctripSpider.py:274)
        "plane_no": plane_no,
        "start_time": f"{dep_h:02d}:{dep_m:02d}",   # "HH:MM" (ctripSpider.py:269-272)
        "end_time": f"{end_tot // 60:02d}:{end_tot % 60:02d}",
        "price": str(price),                     # stringified (ctripSpider.py:277)
        "discount": f"{disc_tenths / 10:.1f}折",  # drate*10 rule (ctripSpider.py:278)
        "flight_type": ftype,
        "flight_transfer": transfer,
        "plane_type": f"73{_hx(h, 19, 20) % 10}",
        "has_media": _hx(h, 20, 21) == 0,        # ~6% of flights carry a captcha artifact
        "media_ref": f"captcha://{h[:16]}",
        "icsf": _hx(h, 21, 22) == 0,             # shared-flight marker (ylSpider06.py:331)
    }


def page_body(url: str) -> bytes:
    """Full synthetic response body (JSON shaped like the Ctrip API's
    ``fltitem[]``, ctripSpider.py:252-285) — used by the fetch stage."""
    status, error, n = page_status(url)
    if error or status != 200:
        return json.dumps({"error": error or status}).encode()
    return json.dumps(
        {"fltitem": [flight_fields(url, i) for i in range(n)]},
        ensure_ascii=False,
    ).encode()


# ---------------------------------------------------------------- Ctrip v2 (listCards)
# The second body format of the reference (``spiders/ctripSpider02.py:272-317``):
# the payload is DOUBLE-encoded — ``json.loads(json.loads(body)['data'])`` —
# and carries ``listCards`` entries with crossDays / totalDuration /
# ticketCounts / stops / stopTimes plus a ``cityMessage`` "A|B" pair the
# parser splits for the city names.  URL path segment: ``listcards``.

def url_parts(url: str) -> tuple[str, str, str]:
    """(from_code, to_code, date) parsed back out of a list URL — the
    synthetic body must be a pure function of the URL alone."""
    segs = url.split("/")
    od, date = segs[4], segs[5].split("?")[0]
    from_code, to_code = od.split("-", 1)
    return from_code, to_code, date


def page_status_v2(url: str) -> tuple[int, str | None, int]:
    """v2 status routing: same transport/status branches as v1, but the
    card count may be ZERO — modeling the empty-``listCards`` branch the
    reference turns into a ConnectionError (ctripSpider02.py:276-280):
    such pages emit no records."""
    h = md5(url)
    d0 = _hx(h, 0, 1)
    if d0 == 0:
        return 0, "timeout", 0
    if d0 == 1:
        return 403, None, 0
    if d0 == 2:
        return 500, None, 0
    return 200, None, _hx(h, 1, 2) % 6


def card_fields_v2(url: str, i: int) -> dict:
    """listCard *i* of a v2 page — md5-derived, SQL-mirrorable.

    Field shape follows the reference's per-card extraction
    (``ctripSpider02.py:286-311``): airlines[0] dict, ECONOMY keyed
    prices/discounts/ticketCounts, stops/stopTimes parallel lists,
    departDateTime/arriveDateTime full datetimes (the parser truncates
    to HH:MM), crossDays and totalDuration."""
    from_code, to_code, date = url_parts(url)
    h = md5(f"{url}#{i}")
    company, code = COMPANIES[_hx(h, 0, 1) % len(COMPANIES)]
    plane_no = code + str(1000 + _hx(h, 1, 5) % 9000)
    dep_h, dep_m = _hx(h, 5, 7) % 24, (_hx(h, 7, 9) % 12) * 5
    dur = 90 + _hx(h, 9, 11) % 600
    end_raw = dep_h * 60 + dep_m + dur
    cross_days = end_raw // 1440
    arr_date = (date_fromisoformat(date) + timedelta(days=cross_days)).isoformat()
    price = 300 + _hx(h, 11, 15) % 2000
    disc = (20 + _hx(h, 15, 17) % 80) / 10
    has_stop = _hx(h, 17, 18) < 4
    return {
        "departureAirportCode": from_code,
        "departureAirportName": f"{from_code}机场",
        "arrivalAirportCode": to_code,
        "arrivalAirportName": f"{to_code}机场",
        "departDateTime": f"{date} {dep_h:02d}:{dep_m:02d}:00",
        "arriveDateTime": f"{arr_date} {(end_raw % 1440) // 60:02d}:{end_raw % 60:02d}:00",
        "crossDays": cross_days,
        "airlines": [{"displayName": plane_no, "code": code,
                      "name": company, "craft": f"32{_hx(h, 22, 23) % 10}"}],
        "prices": {"ECONOMY": price},
        "discounts": {"ECONOMY": f"{disc:.1f}"},
        "totalDuration": dur,
        "ticketCounts": {"ECONOMY": 1 + _hx(h, 20, 21) % 9},
        "stops": [TRANSFER_CITIES[_hx(h, 18, 19)]] if has_stop else [],
        "stopTimes": [30 + _hx(h, 19, 20) * 10] if has_stop else [],
    }


def page_body_v2(url: str) -> bytes:
    """v2 response body: the inner payload is a JSON STRING under
    ``data`` (double encoding, ctripSpider02.py:272) with ``listCards``
    and the ``cityMessage`` "A|B" pair (ctripSpider02.py:284-285)."""
    status, error, n = page_status_v2(url)
    if error or status != 200:
        return json.dumps({"error": error or status}).encode()
    from_code, to_code, _date = url_parts(url)
    inner = {
        "listCards": [card_fields_v2(url, i) for i in range(n)],
        "cityMessage": f"{from_code}城|{to_code}城",
    }
    return json.dumps({"data": json.dumps(inner, ensure_ascii=False)},
                      ensure_ascii=False).encode()


# ---------------------------------------------------------------- detail pages (depth 1)
# the two-hop path: list page → per-flight detail API (ylSpider06.py:508-514),
# whose economyList feeds the lowest-economy-fare selector (ylSpider06.py:515-564)
LIMIT_LABELS = ["", "限时特惠", "婴儿不可预订", "会员专享"]   # last is excluded by M12
ELIGIBLE_LABELS = {"限时特惠", "婴儿不可预订"}


def detail_url(host: str, plane_no: str, off_date: str) -> str:
    return f"https://{host}/detail/{plane_no}/{off_date}"


def cabin_fields(durl: str, j: int) -> dict:
    """Cabin *j* of a detail page — md5-derived, SQL-mirrorable.

    Shapes the fields the reference reads off ``economyList``
    (``ylSpider06.py:515-557``): ruleId / limitLabel eligibility,
    clientTicketPrice, lep with lrp fallback, meal, baggage.
    """
    hc = md5(f"{durl}@{j}")
    price = 150 + _hx(hc, 6, 10) % 1500
    return {
        "cabin_idx": j,
        "ruleId": "00000" if _hx(hc, 0, 1) < 6 else "1" + hc[1:5],
        "limitLabel": LIMIT_LABELS[_hx(hc, 5, 6) % 4],
        "clientTicketPrice": price,
        "lep": "" if _hx(hc, 10, 11) < 4 else str(price - _hx(hc, 11, 13) % 100),
        "lrp": str(price - _hx(hc, 13, 15) % 50),
        "ml": "有" if _hx(hc, 15, 16) < 8 else "无",
        "baggage": _hx(hc, 16, 18) % 30,
    }


def detail_n_cabins(durl: str) -> int:
    return 2 + _hx(md5(durl), 0, 1) % 4


def detail_body(durl: str) -> bytes:
    """Synthetic detail response: economyList of cabins (always 200 —
    the reference's detail fetch has no status routing of its own)."""
    return json.dumps(
        {"economyList": [cabin_fields(durl, j) for j in range(detail_n_cabins(durl))]},
        ensure_ascii=False,
    ).encode()


def detail_bodies(urls: list[str]) -> list[bytes]:
    """Vectorized detail responses for a URL batch — bit-identical to
    ``detail_body(u)`` per URL (pinned by tests), same shape as
    ``page_responses_v1``: one md5 per url/cabin (the per-'request'
    cost), numpy field math, one f-string per cabin."""
    import hashlib as _hl

    if not urls:
        return []
    hexes = [_hl.md5(u.encode("utf-8")).hexdigest() for u in urls]
    D = _hex_digit_matrix(hexes)
    counts = 2 + D[:, 0].astype(np.int64) % 4
    page_of = np.repeat(np.arange(len(urls)), counts)
    cidx = np.arange(len(page_of)) - np.repeat(np.cumsum(counts) - counts, counts)
    chex = [_hl.md5(f"{urls[p]}@{j}".encode("utf-8")).hexdigest()
            for p, j in zip(page_of, cidx)]
    C = _hex_digit_matrix(chex)
    price = 150 + _hx_cols(C, 6, 10) % 1500
    rule_open = C[:, 0] < 6
    label_i = C[:, 5] % 4
    lep_empty = C[:, 10] < 4
    lep_val = price - _hx_cols(C, 11, 13) % 100
    lrp_val = price - _hx_cols(C, 13, 15) % 50
    meal = C[:, 15] < 8
    baggage = _hx_cols(C, 16, 18) % 30
    labels = LIMIT_LABELS
    items = [
        f'{{"cabin_idx": {j}, '
        f'"ruleId": "{"00000" if ro else "1" + ch[1:5]}", '
        f'"limitLabel": "{labels[li]}", '
        f'"clientTicketPrice": {pr}, '
        f'"lep": "{"" if le else lv}", "lrp": "{rv}", '
        f'"ml": "{"有" if ml_ else "无"}", "baggage": {bg}}}'
        for j, ch, ro, li, pr, le, lv, rv, ml_, bg in zip(
            cidx.tolist(), chex, rule_open.tolist(), label_i.tolist(),
            price.tolist(), lep_empty.tolist(), lep_val.tolist(),
            lrp_val.tolist(), meal.tolist(), baggage.tolist())
    ]
    starts = np.concatenate([[0], np.cumsum(counts)])
    return [('{"economyList": [' + ", ".join(items[int(starts[p]):int(starts[p + 1])])
             + "]}").encode("utf-8")
            for p in range(len(urls))]


def day_str(day_offset: int) -> str:
    return (BASE_DATE + timedelta(days=int(day_offset))).isoformat()


# ---------------------------------------------------------------- vectorized fetch
_HEXLUT = np.zeros(256, dtype=np.uint8)
for _c in b"0123456789":
    _HEXLUT[_c] = _c - 48
for _c in b"abcdef":
    _HEXLUT[_c] = _c - 87


def _hex_digit_matrix(hexes: list[str]) -> np.ndarray:
    """n×32 uint8 matrix of hex-digit values from md5 hex strings —
    ONE frombuffer over the joined bytes + one LUT gather, no per-char
    Python.  uint8 (not int64): 8× less memory traffic, and the only
    multi-digit arithmetic (``_hx_cols``) upcasts as it accumulates."""
    if not hexes:
        return np.empty((0, 32), dtype=np.uint8)
    raw = np.frombuffer("".join(hexes).encode("ascii"), dtype=np.uint8)
    return _HEXLUT[raw].reshape(-1, 32)


def _hx_cols(d: np.ndarray, a: int, b: int) -> np.ndarray:
    """Vectorized ``_hx``: int(h[a:b], 16) per row of the digit matrix."""
    v = np.zeros(len(d), dtype=np.int64)
    for j in range(a, b):
        v = v * 16 + d[:, j]
    return v


_ERROR_BODIES = {0: json.dumps({"error": "timeout"}).encode(),
                 1: json.dumps({"error": 403}).encode(),
                 2: json.dumps({"error": 500}).encode()}
_Z2 = tuple(f"{i:02d}" for i in range(60))   # 2-digit zero-pad lookup
_COMPANY_ARR = np.array([c for c, _ in COMPANIES], dtype=object)
_CODE_ARR = np.array([c for _, c in COMPANIES], dtype=object)
_TRANSFER_ARR = np.array(TRANSFER_CITIES, dtype=object)


def page_responses_v1(urls: list[str]) -> tuple[np.ndarray, list, list]:
    """Vectorized (statuses, errors, bodies) for a batch of v1 URLs —
    bit-identical to ``(page_status(u), page_body(u))`` per URL (pinned
    by tests/test_stages_unit.py), but derived with ONE md5 pass per
    url/flight and numpy field math instead of per-flight dicts +
    json.dumps.  This is the headline crawl's innermost loop: the md5
    calls are the irreducible 'network' stand-in; everything else here
    is O(batch) vector ops + one f-string per flight."""
    import hashlib as _hl

    n_urls = len(urls)
    hexes = [_hl.md5(u.encode("utf-8")).hexdigest() for u in urls]
    D = _hex_digit_matrix(hexes)
    d0 = D[:, 0]
    statuses = np.select([d0 == 0, d0 == 1, d0 == 2],
                         [0, 403, 500], 200).astype(np.int32)
    errors: list[str | None] = [None] * n_urls
    bodies: list[bytes] = [b""] * n_urls
    n_flights = np.where(d0 >= 3, 1 + D[:, 1].astype(np.int64) % 5, 0)

    for i in np.nonzero(d0 == 0)[0]:
        errors[i] = "timeout"
    for code in (0, 1, 2):
        for i in np.nonzero(d0 == code)[0]:
            bodies[i] = _ERROR_BODIES[code]

    ok = np.nonzero(d0 >= 3)[0]
    if not len(ok):
        return statuses, errors, bodies
    counts = n_flights[ok]
    # flat (page, flight) expansion; md5 per flight is the per-'request'
    # cost, fields derive from the digit matrix in vector passes
    page_of = np.repeat(np.arange(len(ok)), counts)
    fidx = np.arange(len(page_of)) - np.repeat(np.cumsum(counts) - counts, counts)
    fhex = [_hl.md5(f"{urls[ok[p]]}#{j}".encode("utf-8")).hexdigest()
            for p, j in zip(page_of, fidx)]
    F = _hex_digit_matrix(fhex)
    comp_i = F[:, 0] % len(COMPANIES)
    companies = _COMPANY_ARR[comp_i]
    codes = _CODE_ARR[comp_i]
    plane_num = 1000 + _hx_cols(F, 1, 5) % 9000
    dep_h = _hx_cols(F, 5, 7) % 24
    dep_m = (_hx_cols(F, 7, 9) % 12) * 5
    dur = 60 + _hx_cols(F, 9, 11) % 180
    end_tot = (dep_h * 60 + dep_m + dur) % 1440
    price = 200 + _hx_cols(F, 11, 15) % 1800
    disc = 20 + _hx_cols(F, 15, 17) % 80
    d17 = F[:, 17]
    transfer = _TRANSFER_ARR[F[:, 18]]
    plane_t = F[:, 19] % 10
    has_media = F[:, 20] == 0
    icsf = F[:, 21] == 0

    # remaining per-flight Python is ONE f-string over plain scalars:
    # numpy-scalar indexing/formatting inside the loop (and int→"U2"
    # astype casts) are 3-5× slower, so every array drops to a Python
    # list and 2-digit zero-pads come from a lookup table
    ftype = np.where(d17 < 3, "经停", np.where(d17 < 5, "联程", "直飞"))
    ftrans = np.where(d17 < 5, transfer.astype("U8"), "")
    z2 = _Z2
    items = [
        f'{{"company": "{co}", "company_no": "{cd}", "plane_no": "{cd}{pn}", '
        f'"start_time": "{z2[sh]}:{z2[sm]}", '
        f'"end_time": "{z2[et // 60]}:{z2[et % 60]}", '
        f'"price": "{pr}", "discount": "{dc // 10}.{dc % 10}折", '
        f'"flight_type": "{ft}", "flight_transfer": "{tr}", '
        f'"plane_type": "73{pt}", '
        f'"has_media": {"true" if hm else "false"}, '
        f'"media_ref": "captcha://{fh[:16]}", '
        f'"icsf": {"true" if ic else "false"}}}'
        for co, cd, pn, sh, sm, et, pr, dc, ft, tr, pt, hm, fh, ic in zip(
            companies.tolist(), codes.tolist(), plane_num.tolist(),
            dep_h.tolist(), dep_m.tolist(), end_tot.tolist(),
            price.tolist(), disc.tolist(),
            ftype.tolist(), ftrans.tolist(), plane_t.tolist(),
            has_media.tolist(), fhex, icsf.tolist())
    ]
    starts = np.concatenate([[0], np.cumsum(counts)])
    for p in range(len(ok)):
        lo, hi = int(starts[p]), int(starts[p + 1])
        bodies[ok[p]] = ('{"fltitem": [' + ", ".join(items[lo:hi]) + "]}").encode("utf-8")
    return statuses, errors, bodies


# ---------------------------------------------------------------- vectorized helpers
def day_strs(day_offsets: np.ndarray) -> np.ndarray:
    """Vectorized day_offset → 'YYYY-MM-DD' via numpy datetime64."""
    base = np.datetime64(BASE_DATE_STR)
    return (base + day_offsets.astype("timedelta64[D]")).astype("datetime64[D]").astype(str)


def url_variant(seed_id: np.ndarray) -> np.ndarray:
    """Per-seed URL variant: every 5th seed collapses to the shared
    ``v=0`` URL (duplicate pressure for the seen-filter + hot pages);
    the rest get a unique per-seed variant, so the URL space grows
    linearly with the seed list (web-scale shape).
    SQL: ``CASE WHEN seed_id % 5 = 0 THEN 0 ELSE seed_id END``."""
    return np.where(seed_id % 5 == 0, 0, seed_id)


def build_urls(from_codes: pa.Array, to_codes: pa.Array, days: pa.Array,
               variants: np.ndarray, path: str = "flightlist"):
    """url = https://{lower(to)}.flights.test/{path}/{from}-{to}/{date}?v={v}

    Host embeds the destination code → all URLs of one destination meet
    one politeness bucket; 北京(BJS) is the deliberate hot host.
    ``path``: ``flightlist`` = v1 API, ``listcards`` = v2 (ctripSpider02).
    """
    import pyarrow.compute as pc
    host = pc.binary_join_element_wise(
        pc.utf8_lower(to_codes.cast(pa.string())), pa.scalar(".flights.test"), "")
    v = pa.array(variants.astype(str), type=pa.string())
    return pc.binary_join_element_wise(
        pa.scalar("https://"), host, pa.scalar(f"/{path}/"),
        from_codes.cast(pa.string()), pa.scalar("-"), to_codes.cast(pa.string()),
        pa.scalar("/"), days.cast(pa.string()), pa.scalar("?v="), v, ""), host
