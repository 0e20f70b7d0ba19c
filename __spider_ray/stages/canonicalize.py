"""M2 — city/airport/URL canonicalization (SURVEY.md §2.2).

Re-implements the reference's special-casing as vectorized Arrow ops:

- 北京 city-code override → ``BJS`` (``spiders/ctripSpider.py:141-142``);
- 武隆 city rename → 重庆 (``spiders/ctripSpider.py:143-144``);
- one-city-two-airports map (``spiders/ctripSpider.py:56-70``
  ``airport_map``): PKX→PEK, SHA→PVG, TFU→CTU, …

This is the engine's URL-canonicalization stage: it runs BEFORE
hashing/partitioning so that all aliases of one logical destination
land in the same host bucket / URL-seen shard.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

BEIJING = "北京"
BEIJING_CODE = "BJS"
WULONG = "武隆"
WULONG_CANONICAL = "重庆"

# one-city-two-airports: alias → canonical (ctripSpider.py:56-70)
AIRPORT_MAP = {
    "PEK": "PEK", "PKX": "PEK",
    "PVG": "PVG", "SHA": "PVG",
    "CTU": "CTU", "TFU": "CTU",
    "ZYI": "ZYI", "WMT": "WMT",
    "CKG": "CKG", "CQW": "CQW",
}


def override_beijing_code(city_name: pa.Array, city_code: pa.Array) -> pa.Array:
    """code := 'BJS' where city == 北京 (ctripSpider.py:141-142)."""
    return pc.if_else(pc.equal(city_name, BEIJING), pa.scalar(BEIJING_CODE), city_code)


def rename_wulong(city_name: pa.Array) -> pa.Array:
    """武隆 → 重庆 (ctripSpider.py:143-144)."""
    return pc.if_else(pc.equal(city_name, WULONG), pa.scalar(WULONG_CANONICAL), city_name)


def canonical_airport(codes: pa.Array) -> pa.Array:
    """Dictionary-replace through AIRPORT_MAP; unknown codes pass through."""
    keys = pa.array(list(AIRPORT_MAP.keys()), type=pa.string())
    vals = pa.array(list(AIRPORT_MAP.values()), type=pa.string())
    idx = pc.index_in(codes, value_set=keys)
    mapped = pc.take(vals, idx)
    return pc.coalesce(mapped, codes)


def canonicalize_seed_batch(batch: pa.Table,
                            airport_aliases: bool = False) -> pa.Table:
    """Apply all seed-level canonicalization to a seeds-schema batch.

    ``airport_aliases=True`` additionally collapses one-city-two-airport
    codes through ``AIRPORT_MAP`` (PKX→PEK, SHA→PVG, …) — the generic
    seed-file path (sources/seed_reader) uses it so alias destinations
    share one politeness bucket and one URL-seen identity.  The
    synthetic customer-derived seeds keep it OFF: their 北京-name
    override already canonicalizes, and the SQL oracle mirrors exactly
    that derivation."""
    fc = override_beijing_code(batch["from_city_name"], batch["from_city_code"])
    tc = override_beijing_code(batch["to_city_name"], batch["to_city_code"])
    if airport_aliases:
        fc = canonical_airport(fc)
        tc = canonical_airport(tc)
    fn = rename_wulong(batch["from_city_name"])
    tn = rename_wulong(batch["to_city_name"])
    return pa.table(
        {
            "seed_id": batch["seed_id"],
            "from_city_name": fn,
            "from_city_code": fc,
            "to_city_name": tn,
            "to_city_code": tc,
        }
    )
