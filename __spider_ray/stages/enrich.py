"""J1 — broadcast dimension join: airport-name enrichment.

The reference looks up airport names from an xlsx **re-read on every
lookup** (``ylutils/excel_read.py:7-69``, used at
``ylSpider06.py:346-353, 479-487``) — the canonical small-side-join
anti-pattern.  Here the dim table is built ONCE driver-side (derived
deterministically from the canonical seed city codes), shipped to
tasks as a plain dict in the closure, and applied per batch with a
vectorized take — the broadcast hash-join shape that at cluster scale
becomes ``ray.put`` once + lookup in every task.
"""

from __future__ import annotations

import pyarrow as pa

from .expand import load_nation_map

AIRPORT_SUFFIX = "国际机场"


def airports_dim(sf_dir: str) -> dict[str, str]:
    """ap_code → airport-name dict; name = city + 国际机场.  Mirrors the
    xlsx dim shape (FIXTURES.md §6).

    Derived from the 25-row nation table plus the fixed canonical
    special codes — NOT from a customer scan: the dim can only ever
    contain ~27 codes (nation codes + BJS/CQW after canonicalization),
    so materializing 10⁸ customer rows driver-side to discover them was
    the small-side-join anti-pattern this module exists to fix.  The
    dict is a superset of the codes any seed can produce, which is
    exactly what a broadcast lookup wants."""
    nmap = load_nation_map(sf_dir)
    dim = {f"{name[:3].upper()}{key}": name + AIRPORT_SUFFIX
           for key, name in nmap.items()}
    # canonicalized specials (stages/canonicalize.py): 北京→BJS, 武隆→重庆/CQW
    dim["BJS"] = "北京" + AIRPORT_SUFFIX
    dim["CQW"] = "重庆" + AIRPORT_SUFFIX
    return dim


def enrich_airports(batch: pa.Table, dim: dict[str, str]) -> pa.Table:
    """Fill from/to airport columns by broadcast lookup (replaces the
    reference's per-lookup re-read)."""
    codes = sorted(dim)
    keys = pa.array(codes, pa.string())
    vals = pa.array([dim[c] for c in codes], pa.string())
    import pyarrow.compute as pc
    out = batch
    for code_col, ap_col in (("from_city_code", "from_city_airport"),
                             ("to_city_code", "to_city_airport")):
        idx = pc.index_in(out[code_col], value_set=keys)
        name = pc.coalesce(pc.take(vals, idx), pa.scalar(""))
        out = out.set_column(out.schema.get_field_index(ap_col), ap_col, name)
    return out
