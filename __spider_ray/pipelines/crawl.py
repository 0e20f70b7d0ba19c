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

import pyarrow as pa
import ray.data

from ..stages import expand, fetch, parse, spans


def _first_by_crawl_order(group: pa.Table) -> pa.Table:
    idx = pa.compute.sort_indices(
        group, sort_keys=[("seed_index", "ascending"), ("day_offset", "ascending")])
    return group.take(idx[:1])


def dedup_frontier(ds: ray.data.Dataset) -> ray.data.Dataset:
    """URL-seen semi-join, dataset flavor: keep the first frontier row
    per URL in crawl order.  This is the shuffle-based equivalent of the
    cuckoo-filter actor path (state/url_seen.py) used by the streaming
    epoch loop; correctness queries use this flavor because it is
    exactly reproducible in SQL (row_number() over url)."""
    return ds.groupby("url").map_groups(_first_by_crawl_order, batch_format="pyarrow")


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


def documents(sf_dir: str) -> ray.data.Dataset:
    """Interleaved text+media span docs (driver input_hint table)."""
    return flight_records(sf_dir).map_batches(spans.records_to_docs,
                                              batch_format="pyarrow")


def exploded_spans(sf_dir: str) -> ray.data.Dataset:
    """documents → one row per span (flat, SQL-checkable)."""
    return documents(sf_dir).map_batches(spans.explode_spans, batch_format="pyarrow")


def _first_url(group: pa.Table) -> pa.Table:
    return group.take(pa.compute.sort_indices(
        group, sort_keys=[("seed_index", "ascending"), ("day_offset", "ascending")])[:1])


def detail_frontier(sf_dir: str) -> ray.data.Dataset:
    """Depth-1 frontier: unique detail URLs discovered by parse."""
    from ..stages import detail
    return (flight_records(sf_dir)
            .map_batches(detail.expand_detail_links, batch_format="pyarrow")
            .groupby("url").map_groups(_first_url, batch_format="pyarrow"))


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
