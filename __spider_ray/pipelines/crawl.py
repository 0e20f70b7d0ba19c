"""The crawl pipeline — seeds → frontier → dedup → fetch → parse → docs.

Single-epoch composition (depth-0 frontier; the epoch loop with the
stateful URL-seen/politeness actors lives in ``pipelines/epoch.py``).
Everything here is lazy ``ray.data`` — no driver-side row loops, no
mid-pipeline materialization.

Dedup semantics: the same URL can be produced by many seeds (several
customers share an OD pair).  The reference disables URL dedup
(``dont_filter=True``, ``spiders/ctripSpider.py:225``) but its vestigial
scrapy-redis dupefilter (``settings.py:23-28``) defines the intended
semantics: first occurrence wins, in crawl order (seed_index,
day_offset) (§2.6 O4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import hash64
from ..stages import expand, fetch, parse, spans

N_DEDUP_BUCKETS = 64    # per-bucket work is vectorized; buckets ≈ 2-4× cores


def _add_bucket(t: pa.Table, col: str, n_buckets: int = N_DEDUP_BUCKETS) -> pa.Table:
    h = hash64(t[col].combine_chunks())
    b = (h % np.uint64(n_buckets)).astype(np.int64)
    return (t.append_column("_h64", pa.array(h))
             .append_column("bucket", pa.array(b)))


def _dedup_bucket(g: pa.Table) -> pa.Table:
    """First-wins per URL inside one hash bucket.

    Hot path sorts on the uint64 hash already computed for bucketing
    (no object-dtype string lexsort); exactness is preserved by
    string-verifying only inside equal-hash runs and falling back to a
    per-run string sort iff a run mixes distinct URLs (a 64-bit
    collision — effectively never, but handled)."""
    h = g["_h64"].to_numpy()
    prio = g["priority"].to_numpy()
    order = np.lexsort((prio, h))
    hs = h[order]
    n = len(hs)
    first = np.empty(n, dtype=bool)
    if n:
        first[0] = True
        same_hash = hs[1:] == hs[:-1]
        first[1:] = ~same_hash
        if same_hash.any():
            # Verify strings pairwise inside equal-hash runs (Arrow take
            # touches only the tied rows, not the whole bucket).
            idx = np.flatnonzero(same_hash) + 1
            urls = g["url"].combine_chunks()
            a = urls.take(pa.array(order[idx - 1]))
            b = urls.take(pa.array(order[idx]))
            neq = pc.not_equal(a, b).fill_null(True).to_numpy(
                zero_copy_only=False)
            if neq.any():
                # 64-bit collision: re-resolve the affected runs exactly
                # on the strings (rare path, runs are tiny).
                run_id = np.cumsum(first)          # 1-based run labels
                bad_runs = np.unique(run_id[idx[neq]])
                sel = np.isin(run_id, bad_runs)
                sub_order = order[sel]
                sub_urls = np.asarray(
                    urls.take(pa.array(sub_order)).to_pylist(), dtype=object)
                sub_sorted = np.lexsort((prio[sub_order], sub_urls))
                us = sub_urls[sub_sorted]
                sub_first = np.empty(len(us), dtype=bool)
                sub_first[0] = True
                sub_first[1:] = us[1:] != us[:-1]
                first_vals = first.copy()
                first_vals[sel] = sub_first[np.argsort(sub_sorted)]
                first = first_vals
    return g.take(pa.array(order[first])).drop_columns(["bucket", "_h64"])


def dedup_frontier(ds: ray.data.Dataset) -> ray.data.Dataset:
    """URL-seen semi-join, dataset flavor: keep the first frontier row
    per URL in crawl order (priority = seed_index*N_DAYS + day_offset).

    Shuffle shape: hash-bucket by URL (N_DEDUP_BUCKETS keys) →
    vectorized per-bucket first-wins.  Equivalent to the reference's
    intended dupefilter semantics and exactly reproducible in SQL
    (row_number() over url); the *streaming* scale path is the cuckoo
    actor pool in state/url_seen.py (no shuffle at all)."""
    return (ds.map_batches(lambda t: _add_bucket(t, "url"), batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(_dedup_bucket, batch_format="pyarrow"))


def frontier(sf_dir: str, deduped: bool = True) -> ray.data.Dataset:
    ds = expand.frontier_dataset(sf_dir)
    return dedup_frontier(ds) if deduped else ds


def fetched(sf_dir: str) -> ray.data.Dataset:
    """frontier → fetch results (stateless flavor for correctness runs;
    the politeness-enforcing actor-pool flavor is in epoch.py)."""
    return frontier(sf_dir).map_batches(fetch.fetch_batch, batch_format="pyarrow")


def flight_records(sf_dir: str) -> ray.data.Dataset:
    """The flagship relational output (M9 parse)."""
    return fetched(sf_dir).map_batches(parse.parse_batch, batch_format="pyarrow")


def fetched_v2(sf_dir: str) -> ray.data.Dataset:
    """v2 (listCards) crawl: same seeds, ``listcards`` URL space, the
    double-encoded body variant (ctripSpider02 = a sibling spider over
    the same seed list in the reference)."""
    from .. import synth
    ds = dedup_frontier(expand.frontier_dataset(sf_dir, path="listcards"))
    return ds.map_batches(
        lambda t: fetch.fetch_batch(t, status_fn=synth.page_status_v2,
                                    body_fn=synth.page_body_v2),
        batch_format="pyarrow")


def flight_records_v2(sf_dir: str) -> ray.data.Dataset:
    """M10 — the v2 parse output (crossDays/totalDuration/ticketCounts/
    stops modeled as first-class columns)."""
    return fetched_v2(sf_dir).map_batches(parse.parse_v2_batch,
                                          batch_format="pyarrow")


def documents(sf_dir: str) -> ray.data.Dataset:
    """Interleaved text+media span docs (driver input_hint table)."""
    return flight_records(sf_dir).map_batches(spans.records_to_docs,
                                              batch_format="pyarrow")


def exploded_spans(sf_dir: str) -> ray.data.Dataset:
    """documents → one row per span (flat, SQL-checkable)."""
    return documents(sf_dir).map_batches(spans.explode_spans, batch_format="pyarrow")


def detail_frontier(sf_dir: str) -> ray.data.Dataset:
    """Depth-1 frontier: unique detail URLs discovered by parse (same
    hash-bucket vectorized dedup as the depth-0 frontier)."""
    from ..stages import detail
    links = flight_records(sf_dir).map_batches(detail.expand_detail_links,
                                               batch_format="pyarrow")
    return (links.map_batches(lambda t: _add_bucket(t, "url"),
                              batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(_dedup_bucket, batch_format="pyarrow"))


def detail_cabins(sf_dir: str) -> ray.data.Dataset:
    """Depth-1 fetch + economyList flatten (ylSpider06.py:515-534)."""
    from ..stages import detail
    return (detail_frontier(sf_dir)
            .map_batches(detail.fetch_detail_batch, batch_format="pyarrow")
            .map_batches(detail.parse_cabins_batch, batch_format="pyarrow"))


def lowest_fares(sf_dir: str) -> ray.data.Dataset:
    """M12 grouped argmin over eligible cabins (ylSpider06.py:536-557)."""
    from ..stages import detail
    return detail_cabins(sf_dir).map_batches(detail.lowest_fare_batch,
                                             batch_format="pyarrow")


def dead_letter(sf_dir: str) -> ray.data.Dataset:
    """Failed fetches (error or bad status) — the reference's exception
    artifacts (ctripSpider.py:318-326) as a queryable side dataset."""
    return fetched(sf_dir).map_batches(parse.split_fetch_results,
                                       batch_format="pyarrow")
