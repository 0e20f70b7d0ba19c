"""Seed derivation + M1 frontier expansion (SURVEY.md §2.2 M1, §2.1 S1/S2).

The reference reads a JSONL OD-pair file and loops seed × day
(``spiders/ctripSpider.py:124-229``).  Here:

- seeds derive deterministically from the driver's ``customer`` ×
  ``nation`` parquet tables (seed_id = c_custkey) with 北京/武隆 rows
  injected to exercise canonicalization — the derivation is mirrored
  1:1 in SQL by ``pipelines/oracle_sqlgen.py`` so the DuckDB oracle can
  check every downstream crawl stage;
- expansion is a vectorized ``map_batches`` that emits
  ``N_DAYS`` frontier rows per seed via ``np.repeat`` (no Python
  per-row loop, no ``flat_map``-per-row).

``nation`` (25 rows) is a broadcast small side: loaded once on the
driver, shipped to tasks as a plain dict captured in the closure (Ray
serializes it once per task group, not per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from .. import synth
from ..functions.hashing import hash64
from .canonicalize import canonicalize_seed_batch


def load_nation_map(sf_dir: str) -> dict[int, str]:
    """nation_key → n_name (tiny dim table, read once driver-side — the
    broadcast fix for the reference's per-lookup xlsx re-read,
    ``ylutils/excel_read.py:7-23``)."""
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    return dict(zip(t["n_nationkey"].to_pylist(), t["n_name"].to_pylist()))


def _seed_side(custkey: np.ndarray, nation_names: np.ndarray,
               nation_codes: np.ndarray, which: str) -> tuple[np.ndarray, np.ndarray]:
    """(city_name, city_code) arrays for one side, with special rows.

    from-side: custkey%50==0 → (北京,PKX); ==1 → (武隆,CQW)
    to-side:   custkey%41==0 → (北京,PEK); ==1 → (武隆,CQW)
    otherwise (n_name, upper(n_name[:3]) + nationkey).
    """
    mod = 50 if which == "from" else 41
    bj_code = "PKX" if which == "from" else "PEK"
    m = custkey % mod
    name = np.where(m == 0, "北京", np.where(m == 1, "武隆", nation_names))
    code = np.where(m == 0, bj_code, np.where(m == 1, "CQW", nation_codes))
    return name.astype(object), code.astype(object)


def make_seeds_batch(batch: pa.Table, nation_map: dict[int, str]) -> pa.Table:
    """customer batch → canonicalized seeds batch (vectorized; the only
    Python loop below is over the 25 nation rows, not the batch)."""
    custkey = batch["c_custkey"].to_numpy()
    natkey = batch["c_nationkey"].to_numpy().astype(np.int64)
    keys = np.array(sorted(nation_map))
    names = np.array([nation_map[k] for k in keys], dtype=object)
    codes = np.array([nation_map[k][:3].upper() + str(k) for k in keys], dtype=object)
    from_idx = np.searchsorted(keys, natkey)
    to_keys = (custkey * 7) % len(keys)
    to_idx = np.searchsorted(keys, to_keys)
    fname, fcode = _seed_side(custkey, names[from_idx], codes[from_idx], "from")
    tname, tcode = _seed_side(custkey, names[to_idx], codes[to_idx], "to")
    raw = pa.table(
        {
            "seed_id": pa.array(custkey, type=pa.int64()),
            "from_city_name": pa.array(fname, type=pa.string()),
            "from_city_code": pa.array(fcode, type=pa.string()),
            "to_city_name": pa.array(tname, type=pa.string()),
            "to_city_code": pa.array(tcode, type=pa.string()),
        }
    )
    return canonicalize_seed_batch(raw)


def pack_sort_key(host_hash: np.ndarray, priority: np.ndarray,
                  prio_bits: int = 31) -> np.ndarray:
    """The ONE frontier sort-key packer: top (62−prio_bits) bits of the
    host hash above ``prio_bits`` bits of priority (positive int64, no
    sign-bit wrap).  ``prio_bits`` must bound the priority range —
    ``frontier_dataset`` measures it from the customer table's parquet
    statistics so large scale factors can't carry priority bits into
    the host field (the silent-ordering-corruption hazard
    ``epoch.salt_hot_hosts`` documents)."""
    host_bits = 62 - prio_bits
    return ((host_hash >> np.uint64(64 - host_bits)).astype(np.int64)
            << np.int64(prio_bits)) + priority.astype(np.int64)


def prio_bits_for(sf_dir: str, n_days: int) -> int:
    """Bits needed for priority = custkey·n_days + day, from the
    customer parquet FOOTER statistics (no data read); falls back to 31
    (the ≤2^31 budget) when stats are absent."""
    import math

    import pyarrow.parquet as pq
    try:
        md = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata
        col = md.schema.to_arrow_schema().get_field_index("c_custkey")
        mx = max(md.row_group(rg).column(col).statistics.max
                 for rg in range(md.num_row_groups))
        bound = (int(mx) + 1) * n_days
        return min(47, max(20, math.ceil(math.log2(bound + 1))))
    except Exception:
        return 31


def _default_blocks() -> int:
    """Blocks ≈ 2× cluster CPUs: the seed file is ONE parquet file (one
    read block by default), which would serialize the whole expand →
    fetch → parse chain into a single task no matter how many CPUs the
    cluster has.  Splitting the read is what lets every downstream
    map_batches fan out.

    2× is measured, not guessed: 4×/8× were tried and LOST (31 s → 43 s
    → 61 s for the full sf0.1 crawl at 32 CPUs) — per-task dispatch +
    object-store hops outweigh the better balance on Python-heavy fused
    fetch→parse tasks.  Tunable via $GRAFT_BLOCKS_PER_CPU."""
    import os
    import ray
    mult = int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "2"))
    return max(16, int(ray.cluster_resources().get("CPU", 8)) * mult)


def seeds_dataset(sf_dir: str, n_blocks: int | None = None) -> ray.data.Dataset:
    """Canonicalized seeds as a Dataset (columns pruned at the read)."""
    nation_map = load_nation_map(sf_dir)
    return (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"],
                              override_num_blocks=n_blocks or _default_blocks())
        .map_batches(lambda b: make_seeds_batch(b, nation_map),
                     batch_format="pyarrow")
    )


def day_window(from_date: int, to_date: int) -> np.ndarray:
    """The reference's crawl-window selector
    (``spiders/ctripSpider.py:148-153``), verbatim semantics:
    (0, 0) → today only; either == -1 → the default 15-day horizon;
    else the INCLUSIVE absolute offset range [from_date, to_date]."""
    if from_date == 0 and to_date == 0:
        return np.array([0], dtype=np.int32)
    if from_date == -1 or to_date == -1:
        return np.arange(synth.N_DAYS, dtype=np.int32)
    if to_date < from_date:
        raise ValueError(f"empty window [{from_date}, {to_date}]")
    return np.arange(from_date, to_date + 1, dtype=np.int32)


def expand_batch(batch: pa.Table, n_days: int = synth.N_DAYS,
                 path: str = "flightlist", prio_bits: int = 31,
                 days: np.ndarray | None = None) -> pa.Table:
    """seeds batch → frontier batch: one row per seed × day (M1).

    Vectorized: np.repeat over the seed columns × np.tile over the day
    vector — the Ray-Data replacement for the reference's nested
    seed×day loop (``spiders/ctripSpider.py:136-229``).  ``days``
    overrides the default ``range(n_days)`` with an explicit offset
    window (``day_window``); priority ranks by POSITION in the window
    so crawl order stays seed-major × window order."""
    n = batch.num_rows
    day_vals = np.asarray(days, dtype=np.int32) if days is not None \
        else np.arange(n_days, dtype=np.int32)
    n_days = len(day_vals)
    idx = np.repeat(np.arange(n), n_days)
    days = np.tile(day_vals, n)
    day_rank = np.tile(np.arange(n_days, dtype=np.int64), n)
    rep = batch.take(pa.array(idx))
    day_str = pa.array(synth.day_strs(days), type=pa.string())
    seed_index = rep["seed_id"].cast(pa.int64())
    urls, hosts = synth.build_urls(rep["from_city_code"].combine_chunks(),
                                   rep["to_city_code"].combine_chunks(),
                                   day_str,
                                   synth.url_variant(seed_index.to_numpy()),
                                   path=path)
    from .request_build import pick_user_agents
    ua = pick_user_agents(urls)          # the ONE UA derivation (M3)
    meta = pa.StructArray.from_arrays(
        [
            rep["from_city_name"].combine_chunks(),
            rep["to_city_name"].combine_chunks(),
            rep["from_city_code"].combine_chunks(),
            rep["to_city_code"].combine_chunks(),
            day_str,
            pa.array(np.zeros(len(idx), dtype=np.int32)),
            ua,
            pa.array(
                np.full(len(idx), np.datetime64(synth.CREATE_TIME_STR.replace(" ", "T"), "us"))
            ),
        ],
        names=["from_city", "to_city", "from_city_code", "to_city_code",
               "flight_time", "is_low_price", "user_agent", "create_time"],
    )
    # reference crawl order = seed-file order × day order (§2.6 O4);
    # rank (position in the window), not the raw offset, so absolute
    # windows pack densely into the priority bits
    priority = seed_index.to_numpy().astype(np.float64) * n_days + day_rank
    # numeric shuffle key: high bits = host hash (locality), low bits =
    # priority (order) — one int64 sort instead of a (string, float) sort
    sort_key = pack_sort_key(hash64(hosts), priority, prio_bits)
    return pa.table(
        {
            "url": urls,
            "host": hosts,
            "depth": pa.array(np.zeros(len(idx), dtype=np.int32)),
            "priority": pa.array(priority),
            "sort_key": pa.array(sort_key),
            "seed_index": seed_index,
            "day_offset": pa.array(days),
            "meta": meta,
        }
    )


def frontier_dataset(sf_dir: str, n_days: int = synth.N_DAYS,
                     path: str = "flightlist",
                     from_date: int | None = None,
                     to_date: int | None = None,
                     n_blocks: int | None = None) -> ray.data.Dataset:
    """seeds → expanded frontier (lazy, streaming).  The sort-key's
    priority width is measured from the customer table once (footer
    stats) so the packing never overflows at large scale factors.
    ``from_date``/``to_date`` select an absolute day-offset window
    (``day_window``); default is the rolling ``range(n_days)``.
    ``n_blocks`` overrides the read/expand block count — the epoch loop
    passes fewer blocks than the 2×-CPU default because its analytic
    range exchange re-fans the frontier out anyway, so coarse expand
    tasks just cut dispatch overhead."""
    days = day_window(from_date, to_date) \
        if from_date is not None and to_date is not None else None
    n_eff = len(days) if days is not None else n_days
    pb = prio_bits_for(sf_dir, n_eff)
    return seeds_dataset(sf_dir, n_blocks=n_blocks).map_batches(
        lambda b: expand_batch(b, n_days, path, pb, days=days),
        batch_format="pyarrow")
