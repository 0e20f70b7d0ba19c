"""Analytic range exchange (stages/exchange.py): order/multiset
equivalence with ds.sort, balance on the frontier key shape, the
coarsening path at high group cardinality, and edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from __spider_ray.stages import exchange
from __spider_ray.stages.exchange import (_block_summary, _boundaries,
                                          analytic_range_exchange)


def _frontier_like(n_hosts: int, rows_per_host: int, prio_bits: int = 20,
                   seed: int = 7) -> pa.Table:
    """Packed keys shaped like the crawl frontier: hash-valued host
    field above a ~uniform priority field."""
    rng = np.random.default_rng(seed)
    host_field = rng.integers(0, 1 << 40, size=n_hosts, dtype=np.int64)
    key = np.concatenate([
        (h << prio_bits) + rng.integers(0, 1 << prio_bits,
                                        size=rows_per_host, dtype=np.int64)
        for h in host_field])
    rid = np.arange(len(key), dtype=np.int64)
    return pa.table({"sort_key": pa.array(key), "rid": pa.array(rid)})


def _run(tbl: pa.Table, low_bits: int, n_blocks: int, n_parts: int):
    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    out = analytic_range_exchange(ds, "sort_key", low_bits, n_parts=n_parts)
    parts = [r for r in ray.data.Dataset.to_arrow_refs(out.materialize())]
    import ray as _ray
    return [p if isinstance(p, pa.Table) else _ray.get(p) for p in parts]


def test_global_order_and_multiset(ray_session):
    tbl = _frontier_like(27, 1000)
    parts = _run(tbl, 20, n_blocks=8, n_parts=8)
    keys = np.concatenate([p["sort_key"].to_numpy() for p in parts
                           if p.num_rows])
    assert np.array_equal(keys, np.sort(tbl["sort_key"].to_numpy()))
    rids = np.concatenate([p["rid"].to_numpy() for p in parts if p.num_rows])
    assert np.array_equal(np.sort(rids), np.arange(tbl.num_rows))


def test_balance_beats_sampling_shape(ray_session):
    """On the 27-point-mass host distribution the parts must be near
    equi-depth (the sampled sort measured 5x skew here)."""
    tbl = _frontier_like(27, 2000)
    parts = _run(tbl, 20, n_blocks=16, n_parts=16)
    sizes = np.array([p.num_rows for p in parts])
    mean = tbl.num_rows / len(sizes)
    assert sizes.max() <= 1.25 * mean, sizes.tolist()
    assert sizes.min() >= 0.75 * mean, sizes.tolist()


def test_skewed_host_mass_still_balanced(ray_session):
    """One host holding half the frontier: intra-group interpolation
    must cut inside it."""
    hot = _frontier_like(1, 20000, seed=1)
    cold = _frontier_like(40, 500, seed=2)
    tbl = pa.concat_tables([hot, cold]).combine_chunks()
    # rids collide between the two halves; rebuild unique ones
    tbl = tbl.set_column(1, "rid",
                         pa.array(np.arange(tbl.num_rows, dtype=np.int64)))
    parts = _run(tbl, 20, n_blocks=8, n_parts=10)
    sizes = np.array([p.num_rows for p in parts])
    mean = tbl.num_rows / len(sizes)
    assert sizes.max() <= 1.4 * mean, sizes.tolist()


def test_summary_coarsens_at_high_cardinality():
    rng = np.random.default_rng(3)
    # 50k distinct "hosts", one row each — summary must coarsen, not
    # ship 50k groups
    key = rng.integers(0, 1 << 60, size=50_000, dtype=np.int64)
    tbl = pa.table({"sort_key": pa.array(key)})
    s = _block_summary(tbl, "sort_key", 8, cap=1024)
    assert len(s["group"]) <= 1024
    assert s["shift"] > 8
    assert int(s["count"].sum()) == 50_000
    b = _boundaries([s], 16)
    assert np.all(np.diff(b) >= 0)
    sizes = np.diff(np.concatenate([[0],
                    np.searchsorted(np.sort(key), b), [len(key)]]))
    assert sizes.max() <= 2.0 * len(key) / 16


def test_all_equal_keys_and_tiny_inputs(ray_session):
    tbl = pa.table({"sort_key": pa.array(np.full(100, 42, dtype=np.int64)),
                    "rid": pa.array(np.arange(100, dtype=np.int64))})
    parts = _run(tbl, 4, n_blocks=4, n_parts=4)
    assert sum(p.num_rows for p in parts) == 100
    # n_parts > rows
    tbl2 = pa.table({"sort_key": pa.array([3, 1], type=pa.int64()),
                     "rid": pa.array([0, 1], type=pa.int64())})
    parts2 = _run(tbl2, 4, n_blocks=2, n_parts=4)
    keys = np.concatenate([p["sort_key"].to_numpy() for p in parts2
                           if p.num_rows])
    assert keys.tolist() == [1, 3]


def test_empty_dataset(ray_session):
    tbl = pa.table({"sort_key": pa.array([], type=pa.int64())})
    ds = ray.data.from_arrow(tbl)
    out = analytic_range_exchange(ds, "sort_key", 8)
    assert out.count() == 0


def test_epoch_crawl_matches_ray_sort(ray_session, tmp_path):
    """The full crawl run under the analytic exchange must produce the
    same seen set / totals as under ds.sort (the A/B env gate)."""
    import os

    from conftest import SF_SMALL

    from __spider_ray.pipelines import epoch

    res_a = epoch.run_crawl(SF_SMALL, str(tmp_path / "a"), resume=False,
                            n_days=5)
    os.environ["GRAFT_SORT_IMPL"] = "ray"
    try:
        res_b = epoch.run_crawl(SF_SMALL, str(tmp_path / "b"), resume=False,
                                n_days=5)
    finally:
        del os.environ["GRAFT_SORT_IMPL"]
    assert res_a["totals"] == res_b["totals"]
    assert sum(s["count"] for s in res_a["seen"]) == \
        sum(s["count"] for s in res_b["seen"])
