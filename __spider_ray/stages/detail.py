"""Depth-1 detail fetch + M12 lowest-economy-fare selection.

The reference's ylSpider06 makes a *blocking nested* httpx call per
flight inside parse (``spiders/ylSpider06.py:508-514`` — it stalls the
Twisted reactor) and then selects the cheapest eligible economy cabin
(``ylSpider06.py:515-564``): keep cabins with ``ruleId == '00000'`` or
``limitLabel`` in {限时特惠, 婴儿不可预订}, sort prices ascending, take
the min, with lep→lrp fallback for the lowest-economy-price field.

Ray-Data-first re-expression (SURVEY.md §3.2): parse emits detail-URL
rows into the NEXT frontier epoch; a second fetch ``map_batches`` stage
gets them (same politeness budget, same host buckets); the grouped
argmin runs vectorized per batch — no nesting, no blocking.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import synth

DETAIL_KEY = ("detail_url", "host", "plane_no", "off_date")


def expand_detail_links(batch: pa.Table) -> pa.Table:
    """flight-record batch → depth-1 frontier rows (one per unique
    flight on the page).  This is the link-discovery step of the crawl
    loop: output feeds the next epoch's seen-filter + fetch."""
    host = batch["host"].to_pylist()
    plane = batch["plane_no"].to_pylist()
    off = batch["off_date"].to_pylist()
    urls = [synth.detail_url(h, p, d) for h, p, d in zip(host, plane, off)]
    from ..functions.hashing import hash64
    priority = (batch["seed_index"].to_numpy().astype(np.float64) * synth.N_DAYS
                + batch["day_offset"].to_numpy())
    url_arr = pa.array(urls, type=pa.string())
    # same packer as the depth-0 frontier; the default 31-bit budget is
    # fine here — the depth-1 pass never sorts on this key (epoch.py
    # skips the sort; links inherit host locality from the depth-0 pass)
    from .expand import pack_sort_key
    sort_key = pack_sort_key(hash64(batch["host"].combine_chunks()), priority)
    t = pa.table(
        {
            "url": url_arr,
            "host": batch["host"],
            "plane_no": batch["plane_no"],
            "off_date": batch["off_date"],
            "seed_index": batch["seed_index"],
            "day_offset": batch["day_offset"],
            "depth": pa.array(np.ones(batch.num_rows, dtype=np.int32)),
            "priority": pa.array(priority),
            "sort_key": pa.array(sort_key),
        }
    )
    # a plane_no+date pair can appear on several list pages → in-batch dedup
    mask = np.zeros(t.num_rows, dtype=bool)
    seen: set[str] = set()
    for i, u in enumerate(urls):
        if u not in seen:
            seen.add(u)
            mask[i] = True
    return t.filter(pa.array(mask))


def fetch_detail_batch(batch: pa.Table) -> pa.Table:
    """Synthetic detail fetch: body = f(detail_url); always 200.
    Vectorized batch derivation (synth.detail_bodies), bit-identical to
    the scalar ``synth.detail_body`` per URL."""
    bodies = synth.detail_bodies(batch["url"].to_pylist())
    return batch.append_column("body", pa.array(bodies, type=pa.binary()))


def parse_cabins_batch(batch: pa.Table) -> pa.Table:
    """detail fetch result → one row per cabin (economyList flatten).

    One ``json.loads`` per page, one comprehension per JSON field over
    the flattened cabin list, one vectorized take per page column."""
    bodies = batch["body"].to_pylist()
    page_idx: list[int] = []
    cabins: list[dict] = []
    for i in range(len(bodies)):
        cl = json.loads(bodies[i])["economyList"]
        page_idx.extend([i] * len(cl))
        cabins.extend(cl)
    idx = pa.array(np.asarray(page_idx, dtype=np.int64))

    def jf(key: str, typ) -> pa.Array:
        return pa.array([c[key] for c in cabins], typ)

    return pa.table(
        {
            "detail_url": pc.take(batch["url"].combine_chunks(), idx),
            "host": pc.take(batch["host"].combine_chunks(), idx),
            "plane_no": pc.take(batch["plane_no"].combine_chunks(), idx),
            "off_date": pc.take(batch["off_date"].combine_chunks(), idx),
            "cabin_idx": jf("cabin_idx", pa.int32()),
            "ruleId": jf("ruleId", pa.string()),
            "limitLabel": jf("limitLabel", pa.string()),
            "clientTicketPrice": jf("clientTicketPrice", pa.int64()),
            "lep": jf("lep", pa.string()),
            "lrp": jf("lrp", pa.string()),
            "ml": jf("ml", pa.string()),
            "baggage": jf("baggage", pa.int64()),
        }
    )


def eligible_mask(t: pa.Table) -> pa.Array:
    """M12 eligibility: ruleId=='00000' OR limitLabel ∈ ELIGIBLE_LABELS
    (ylSpider06.py:515-534)."""
    return pc.or_(
        pc.equal(t["ruleId"], "00000"),
        pc.is_in(t["limitLabel"],
                 value_set=pa.array(sorted(synth.ELIGIBLE_LABELS))),
    )


def lowest_fare_batch(t: pa.Table) -> pa.Table:
    """Vectorized grouped argmin per (plane_no, off_date): min eligible
    clientTicketPrice, tie-break cabin_idx asc; lep→lrp fallback
    (ylSpider06.py:536-557).  Runs per batch — cabins of one detail URL
    are contiguous (parse is batch-aligned), so in-batch grouping is
    exact; the shuffle-based flavor in queries.py handles the general
    (re-partitioned) case."""
    m = eligible_mask(t)
    e = t.filter(m)
    if e.num_rows == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "plane_no": pa.array([], pa.string()),
                         "off_date": pa.array([], pa.string()),
                         "lep_price": pa.array([], pa.int64()),
                         "is_meal": pa.array([], pa.string()),
                         "baggage": pa.array([], pa.int64()),
                         "min_cabin_price": pa.array([], pa.int64())})
    idx = pc.sort_indices(e, sort_keys=[("detail_url", "ascending"),
                                        ("clientTicketPrice", "ascending"),
                                        ("cabin_idx", "ascending")])
    s = e.take(idx)
    durl = np.asarray(s["detail_url"].to_pylist(), dtype=object)
    first = np.empty(len(durl), dtype=bool)
    first[0] = True
    first[1:] = durl[1:] != durl[:-1]
    w = s.filter(pa.array(first))
    lep = w["lep"].to_pylist()
    lrp = w["lrp"].to_pylist()
    lep_price = pa.array([int(a) if a != "" else int(b) for a, b in zip(lep, lrp)],
                         type=pa.int64())
    return pa.table(
        {
            "host": w["host"],
            "plane_no": w["plane_no"],
            "off_date": w["off_date"],
            "lep_price": lep_price,
            "is_meal": w["ml"],
            "baggage": w["baggage"],
            "min_cabin_price": w["clientTicketPrice"],
        }
    )
