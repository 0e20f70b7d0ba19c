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

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .expand import load_nation_map, make_seeds_batch

AIRPORT_SUFFIX = "国际机场"


def airports_dim(sf_dir: str) -> dict[str, str]:
    """ap_code → airport-name dict (distinct codes over both seed
    sides; name = city + 国际机场).  Mirrors the xlsx dim shape
    (FIXTURES.md §6) as a pure derivation of the driver tables."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    seeds = make_seeds_batch(cust, load_nation_map(sf_dir))
    dim: dict[str, str] = {}
    for code_col, name_col in (("from_city_code", "from_city_name"),
                               ("to_city_code", "to_city_name")):
        for code, name in zip(seeds[code_col].to_pylist(),
                              seeds[name_col].to_pylist()):
            dim[code] = name + AIRPORT_SUFFIX
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
