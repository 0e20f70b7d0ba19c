"""S1/S2 — seed-list reader + line-range shard selector.

The reference reads an OD-pair seed file with ``eval()`` per line
(``spiders/ctripSpider.py:124-129``) and shards servers by CLI line
ranges ``[from_line-1 : to_line]`` with ``-1`` meaning "all"
(``spiders/ctripSpider.py:131-134``; ``start_ctrip.py:7-15``).

Seed files are driver-scale input (the reference's largest is 7,491
lines), so they are read once on the driver — ``ast.literal_eval``
accepts the reference's python-dict lines AND strict JSON, never
``eval`` — and become a Dataset via ``from_arrow``.  At 10^10-URL scale
the frontier is seeded from a parquet/Lance table instead
(``stages/expand.seeds_dataset``); the manual line-range sharding is
kept only for reference parity (Ray Data block partitioning replaces
it).
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa
import ray.data

FIELDS = ("from_city_name", "from_city_code", "to_city_name", "to_city_code")


def parse_seed_lines(lines: list[str]) -> pa.Table:
    parsed = [ast.literal_eval(ln.strip()) for ln in lines if ln.strip()]
    cols = {"seed_id": pa.array(np.arange(len(parsed), dtype=np.int64))}
    for f in FIELDS:
        cols[f] = pa.array([d[f] for d in parsed], pa.string())
    return pa.table(cols)


def shard_lines(tbl: pa.Table, from_line: int = -1, to_line: int = -1) -> pa.Table:
    """1-based inclusive [from_line, to_line] window; -1 = all
    (start_ctrip.py:7-15 semantics)."""
    if from_line == -1 or to_line == -1:
        return tbl
    ids = tbl["seed_id"].to_numpy()
    return tbl.filter(pa.array((ids >= from_line - 1) & (ids < to_line)))


def read_seed_file(path: str, from_line: int = -1,
                   to_line: int = -1) -> ray.data.Dataset:
    """Seed file → canonicalized seeds Dataset.

    Canonicalization (city renames + the one-city-two-airports alias
    map, stages/canonicalize.py) runs HERE, before any hashing: alias
    codes for the same destination (PKX/PEK, SHA/PVG…) must collapse
    BEFORE the host becomes a politeness bucket and a URL-seen key, or
    one logical destination splits across two rate budgets and
    duplicate logical URLs pass the seen filter."""
    from ..stages.canonicalize import canonicalize_seed_batch
    with open(path, encoding="utf-8") as f:
        tbl = parse_seed_lines(f.readlines())
    return ray.data.from_arrow(
        canonicalize_seed_batch(shard_lines(tbl, from_line, to_line),
                                airport_aliases=True))
