"""M9 — the flagship parse stage: fetched page → flight records.

Re-implements the semantics of the reference's ``parse_api``
(``spiders/ctripSpider.py:231-332``): status routing (200/201 parse,
error → dead-letter, other status → dead-letter), JSON ``fltitem[]``
flatten, per-flight field extraction, and the per-page flight count
(``flight_number = len(data_list)``, ctripSpider.py:295-316).

Execution shape: one ``json.loads`` per *page* (inherent to parsing,
like the reference), then columnar assembly — a page batch of B rows
does B json parses and a fixed number of Arrow array builds.  All
downstream transforms are vectorized.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import synth
from ..schemas import FLIGHT_RECORDS

# provenance columns carried alongside the 25 record columns;
# media_ref is the captcha/image artifact reference a flight row may
# carry (CtripSpiderMiddleware.py:87-137 — base64 captcha images; here a
# reference string, payload never inlined into the record)
PROVENANCE = ("url", "host", "doc_id", "seed_index", "day_offset", "flight_idx", "media_ref")

# every flight-dict key the v1 extraction reads (validated per page so a
# malformed page dead-letters instead of crashing the fused pass)
_V1_FIELDS = ("company", "company_no", "plane_no", "start_time", "end_time",
              "price", "discount", "flight_type", "plane_type",
              "flight_transfer")
# every card key the v2 extraction reads
_V2_FIELDS = ("departureAirportCode", "departureAirportName",
              "arrivalAirportCode", "arrivalAirportName", "departDateTime",
              "arriveDateTime", "crossDays", "airlines", "prices",
              "discounts", "totalDuration", "ticketCounts", "stops",
              "stopTimes")


def parse_batch(batch: pa.Table) -> pa.Table:
    """fetch-result batch → flight-record rows (one row per flight).

    Non-200 / errored pages yield no rows here — they are routed to the
    dead-letter dataset by ``split_fetch_results`` (the explicit version
    of the reference's status routing at ctripSpider.py:243-332).

    Execution shape: one ``json.loads`` per page (inherent), then ONE
    list comprehension per JSON field over the flattened flight list;
    every page-level column is expanded by a single vectorized
    ``pc.take`` with a page-index array — no per-row dict juggling.
    """
    status = batch["status"].to_numpy()
    errors = batch["error"].to_pylist()
    bodies = batch["body"].to_pylist()
    urls = batch["url"].to_pylist()

    page_idx: list[int] = []          # source row per emitted flight
    flights: list[dict] = []          # parsed flight dicts, page order
    flight_pos: list[int] = []        # position in the page's fltitem[]
    counts: list[int] = []            # KEPT flight count per emitting page
    doc_ids: list[str] = []
    for i in range(len(bodies)):
        if errors[i] is not None or status[i] not in (200, 201):
            continue
        try:
            fl_all = json.loads(bodies[i])["fltitem"]
            # shared-flight filter: the reference only emits rows for
            # flights with falsy ``icsf`` (ylSpider06.py:331-334);
            # flight_idx stays the position in the RESPONSE
            # (provenance), the per-page flight count reflects KEPT
            # flights only.  Probe every field the extraction below
            # reads so a malformed-but-200 page skips HERE (per page)
            # instead of raising mid-column-build and killing the task
            # (the epoch pass runs with max_retries=0).
            fl = [(j, f) for j, f in enumerate(fl_all) if not f.get("icsf")]
            for _, f in fl:
                for k in _V1_FIELDS:
                    f[k]
        except Exception:
            continue
        if not fl:
            continue
        page_idx.extend([i] * len(fl))
        flights.extend(f for _, f in fl)
        flight_pos.extend(j for j, _ in fl)
        counts.append(len(fl))
        doc_ids.append("doc-" + synth.md5(urls[i]))

    n = len(flights)
    idx = pa.array(np.asarray(page_idx, dtype=np.int64))
    counts_np = np.asarray(counts, dtype=np.int64)
    take = lambda col: pc.take(batch[col].combine_chunks(), idx)  # noqa: E731
    meta = batch["meta"].combine_chunks()
    mtake = lambda f: pc.take(meta.field(f), idx)                 # noqa: E731
    const = lambda v: pa.array([v] * n, pa.string())              # noqa: E731

    def jf(key: str) -> pa.Array:
        return pa.array([f[key] for f in flights], pa.string())

    arrays = {
        "url": take("url"),
        "host": take("host"),
        "doc_id": pa.array(np.repeat(np.asarray(doc_ids, dtype=object), counts_np),
                           pa.string()),
        "seed_index": take("seed_index"),
        "day_offset": take("day_offset"),
        "flight_idx": pa.array(np.asarray(flight_pos, dtype=np.int32)),
        "media_ref": pa.array([f["media_ref"] if f.get("has_media") else None
                               for f in flights], pa.string()),
        "company": jf("company"),
        "company_no": jf("company_no"),
        "plane_no": jf("plane_no"),
        "start_time": jf("start_time"),
        "end_time": jf("end_time"),
        "from_city": mtake("from_city"),
        "from_city_code": mtake("from_city_code"),
        "to_city": mtake("to_city"),
        "to_city_code": mtake("to_city_code"),
        "create_time": mtake("create_time"),
        "discount": jf("discount"),
        "off_date": mtake("flight_time"),
        "platform": const(synth.PLATFORM),
        "price": jf("price"),
        "flight_type": jf("flight_type"),
        "plane_type": jf("plane_type"),
        "flight_transfer": jf("flight_transfer"),
        "from_city_airport": const(""),
        "to_city_airport": const(""),
        "task_time": const(synth.TASK_TIME),
        "server_ip": const(synth.SERVER_IP),
        "flight_number": pa.array(np.repeat(counts_np, counts_np).astype(np.int32)
                                  if n else np.empty(0, dtype=np.int32)),
        "lep_price": pa.array([None] * n, pa.int32()),
        "is_meal": pa.array([None] * n, pa.string()),
        "baggage": pa.array([None] * n, pa.int32()),
    }
    names = list(PROVENANCE) + list(FLIGHT_RECORDS.names)
    return pa.Table.from_arrays([arrays[x] for x in names], names=names)


def parse_v2_batch(batch: pa.Table) -> pa.Table:
    """M10 — the Ctrip v2 parser: DOUBLE-decoded body →
    ``json.loads(json.loads(body)['data'])['listCards']`` rows
    (``spiders/ctripSpider02.py:272-317``).

    Distinct v2 semantics modeled here:
    - city names come from the RESPONSE's ``cityMessage`` "A|B" split
      (ctripSpider02.py:284-285), airport codes/names from each card —
      not from request meta;
    - HH:MM times are truncated out of full ``departDateTime`` /
      ``arriveDateTime`` datetimes (ctripSpider02.py:294-297);
    - crossDays, totalDuration, ticketCounts[ECONOMY] and
      stops/stopTimes are first-class columns (the reference computes
      them and then drops them from ``_data`` — ctripSpider02.py:302-317;
      we keep them, since they are the fields the format exists for);
    - ``flight_number`` is the 1-based running card count (the v2
      ``count`` variable, ctripSpider02.py:287), not the page total;
    - empty ``listCards`` pages emit nothing (the ConnectionError
      branch, ctripSpider02.py:276-280).
    """
    status = batch["status"].to_numpy()
    errors = batch["error"].to_pylist()
    bodies = batch["body"].to_pylist()
    urls = batch["url"].to_pylist()

    page_idx: list[int] = []
    cards: list[dict] = []
    cities: list[tuple[str, str]] = []      # (from_city, to_city) per card
    doc_ids: list[str] = []
    counts: list[int] = []
    for i in range(len(bodies)):
        if errors[i] is not None or status[i] not in (200, 201):
            continue
        try:
            inner = json.loads(json.loads(bodies[i])["data"])   # double decode
            cds = inner["listCards"]
            if not cds:
                continue
            msg = str(inner["cityMessage"]).split("|")
            if len(msg) < 2:
                continue
            # probe every card field the extraction reads (see _V1_FIELDS
            # note): a malformed page skips, never kills the fused pass
            for c in cds:
                for k in _V2_FIELDS:
                    c[k]
                c["airlines"][0]["displayName"]
                c["prices"]["ECONOMY"]
                c["discounts"]["ECONOMY"]
                c["ticketCounts"]["ECONOMY"]
        except Exception:
            continue
        page_idx.extend([i] * len(cds))
        cards.extend(cds)
        cities.extend([(msg[0], msg[1])] * len(cds))
        counts.append(len(cds))
        doc_ids.append("doc-" + synth.md5(urls[i]))

    n = len(cards)
    idx = pa.array(np.asarray(page_idx, dtype=np.int64))
    counts_np = np.asarray(counts, dtype=np.int64)
    take = lambda col: pc.take(batch[col].combine_chunks(), idx)  # noqa: E731
    meta = batch["meta"].combine_chunks()
    const = lambda v: pa.array([v] * n, pa.string())              # noqa: E731

    def hhmm(key: str) -> pa.Array:
        # "YYYY-MM-DD HH:MM:SS" → "HH:MM" (split-space, split-colon rejoin)
        out = []
        for c in cards:
            t = str(c[key]).split(" ")[1]
            p = t.split(":")
            out.append(p[0] + ":" + p[1])
        return pa.array(out, pa.string())

    flight_idx = (np.concatenate([np.arange(c, dtype=np.int64) for c in counts_np])
                  if n else np.empty(0, dtype=np.int64))
    arrays = {
        "url": take("url"),
        "host": take("host"),
        "doc_id": pa.array(np.repeat(np.asarray(doc_ids, dtype=object), counts_np),
                           pa.string()),
        "seed_index": take("seed_index"),
        "day_offset": pc.take(batch["day_offset"].combine_chunks().cast(pa.int64()), idx),
        "flight_idx": pa.array(flight_idx),
        "company": pa.array([c["airlines"][0]["name"] for c in cards], pa.string()),
        "company_no": pa.array([c["airlines"][0]["code"] for c in cards], pa.string()),
        "plane_no": pa.array([c["airlines"][0]["displayName"] for c in cards], pa.string()),
        "start_time": hhmm("departDateTime"),
        "end_time": hhmm("arriveDateTime"),
        "cross_days": pa.array([int(c["crossDays"]) for c in cards], pa.int64()),
        "total_duration": pa.array([int(c["totalDuration"]) for c in cards], pa.int64()),
        "ticket_counts": pa.array([int(c["ticketCounts"]["ECONOMY"]) for c in cards],
                                  pa.int64()),
        "stop_times": pa.array([str(c["stopTimes"][0]) if c["stops"] else ""
                                for c in cards], pa.string()),
        "from_city": pa.array([a for a, _ in cities], pa.string()),
        "from_city_code": pa.array([c["departureAirportCode"] for c in cards], pa.string()),
        "from_city_airport": pa.array([c["departureAirportName"] for c in cards], pa.string()),
        "to_city": pa.array([b for _, b in cities], pa.string()),
        "to_city_code": pa.array([c["arrivalAirportCode"] for c in cards], pa.string()),
        "to_city_airport": pa.array([c["arrivalAirportName"] for c in cards], pa.string()),
        "create_time": pc.take(meta.field("create_time"), idx),
        "discount": pa.array([str(c["discounts"]["ECONOMY"]) for c in cards], pa.string()),
        "off_date": pc.take(meta.field("flight_time"), idx),
        "platform": const(synth.PLATFORM),
        "price": pa.array([str(c["prices"]["ECONOMY"]) for c in cards], pa.string()),
        "flight_type": pa.array(["经停" if c["stops"] else "" for c in cards], pa.string()),
        "flight_transfer": pa.array([c["stops"][0] if c["stops"] else ""
                                     for c in cards], pa.string()),
        "plane_type": pa.array([c["airlines"][0]["craft"] for c in cards], pa.string()),
        "flight_number": pa.array(flight_idx + 1),
    }
    return pa.Table.from_arrays(list(arrays.values()), names=list(arrays.keys()))


def split_fetch_results(batch: pa.Table) -> pa.Table:
    """Dead-letter side: keep only failed rows with an error-kind column
    (replaces the reference's exception-HTML dump, ctripSpider.py:318-326)."""
    import pyarrow.compute as pc
    bad = pc.or_(pc.is_valid(batch["error"]),
                 pc.invert(pc.is_in(batch["status"], value_set=pa.array([200, 201], pa.int32()))))
    out = batch.filter(bad)
    kind = pc.if_else(pc.is_valid(out["error"]), out["error"],
                      pc.cast(out["status"], pa.string()))
    return out.drop_columns(["body"]).append_column("failure_kind", kind)
