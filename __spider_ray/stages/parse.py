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

from .. import synth
from ..schemas import FLIGHT_RECORDS

# provenance columns carried alongside the 25 record columns;
# media_ref is the captcha/image artifact reference a flight row may
# carry (CtripSpiderMiddleware.py:87-137 — base64 captcha images; here a
# reference string, payload never inlined into the record)
PROVENANCE = ("url", "host", "doc_id", "seed_index", "day_offset", "flight_idx", "media_ref")


def parse_batch(batch: pa.Table) -> pa.Table:
    """fetch-result batch → flight-record rows (one row per flight).

    Non-200 / errored pages yield no rows here — they are routed to the
    dead-letter dataset by ``split_fetch_results`` (the explicit version
    of the reference's status routing at ctripSpider.py:243-332).
    """
    meta = batch["meta"].combine_chunks()
    metas = {f: meta.field(f).to_pylist()
             for f in ("from_city", "to_city", "from_city_code", "to_city_code",
                       "flight_time")}
    create_time = meta.field("create_time").to_pylist()
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    status = batch["status"].to_numpy()
    errors = batch["error"].to_pylist()
    bodies = batch["body"].to_pylist()
    seed_index = batch["seed_index"].to_numpy()
    day_offset = batch["day_offset"].to_numpy()

    cols: dict[str, list] = {name: [] for name in PROVENANCE}
    for f in FLIGHT_RECORDS.names:
        cols[f] = []

    for i in range(len(urls)):
        if errors[i] is not None or status[i] not in (200, 201):
            continue
        try:
            flights = json.loads(bodies[i])["fltitem"]
        except Exception:
            continue
        if not flights:
            continue
        n = len(flights)
        doc_id = "doc-" + synth.md5(urls[i])
        for j, fl in enumerate(flights):
            cols["url"].append(urls[i])
            cols["host"].append(hosts[i])
            cols["doc_id"].append(doc_id)
            cols["seed_index"].append(int(seed_index[i]))
            cols["day_offset"].append(int(day_offset[i]))
            cols["flight_idx"].append(j)
            cols["media_ref"].append(fl["media_ref"] if fl.get("has_media") else None)
            cols["company"].append(fl["company"])
            cols["company_no"].append(fl["company_no"])
            cols["plane_no"].append(fl["plane_no"])
            cols["start_time"].append(fl["start_time"])
            cols["end_time"].append(fl["end_time"])
            cols["from_city"].append(metas["from_city"][i])
            cols["from_city_code"].append(metas["from_city_code"][i])
            cols["to_city"].append(metas["to_city"][i])
            cols["to_city_code"].append(metas["to_city_code"][i])
            cols["create_time"].append(create_time[i])
            cols["discount"].append(fl["discount"])
            cols["off_date"].append(metas["flight_time"][i])
            cols["platform"].append(synth.PLATFORM)
            cols["price"].append(fl["price"])
            cols["flight_type"].append(fl["flight_type"])
            cols["plane_type"].append(fl["plane_type"])
            cols["flight_transfer"].append(fl["flight_transfer"])
            cols["from_city_airport"].append("")
            cols["to_city_airport"].append("")
            cols["task_time"].append(synth.TASK_TIME)
            cols["server_ip"].append(synth.SERVER_IP)
            cols["flight_number"].append(n)
            cols["lep_price"].append(None)
            cols["is_meal"].append(None)
            cols["baggage"].append(None)

    arrays, names = [], []
    for name in PROVENANCE:
        names.append(name)
        if name in ("seed_index",):
            arrays.append(pa.array(cols[name], type=pa.int64()))
        elif name in ("day_offset", "flight_idx"):
            arrays.append(pa.array(cols[name], type=pa.int32()))
        else:
            arrays.append(pa.array(cols[name], type=pa.string()))
    for field in FLIGHT_RECORDS:
        names.append(field.name)
        arrays.append(pa.array(cols[field.name], type=field.type))
    return pa.Table.from_arrays(arrays, names=names)


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
