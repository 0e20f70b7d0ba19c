"""Hand-computed fixtures for the round-3 second relational batch —
distributed ntile boundaries, gaps-and-islands streaks, grouped mode
tie-break, market-share integer bps, stratified rates, and the
range-search threshold margin.  The DuckDB oracle (tools/selfcheck.py)
verifies each end-to-end; these pin the corner semantics on inputs
small enough to check by eye."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from __spider_ray.pipelines.relational2 import (
    KNN_RANGE_TAU,
    q_events_ntile,
    q_nation_market_share,
    q_part_brand_mode,
    streaks_kernel,
)

US = "datetime64[us]"


def _write_events_values(tmp_path, pairs):
    t = pa.table({
        "event_id": pa.array([p[0] for p in pairs], pa.int64()),
        "value": pa.array([p[1] for p in pairs], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_ntile_remainder_goes_to_first_tiles(tmp_path):
    # 10 rows, 7 tiles -> sizes [2,2,2,1,1,1,1] in (value, event_id) order
    pairs = [(i, float(i)) for i in range(10)]
    sf = _write_events_values(tmp_path, pairs)
    got = (q_events_ntile(sf, tiles=7).to_pandas()
           .sort_values("event_id")["tile"].tolist())
    assert got == [1, 1, 2, 2, 3, 3, 4, 5, 6, 7]


def test_ntile_cut_inside_a_duplicate_value_run_resolves_by_event_id(tmp_path):
    # 6 rows all the same value, 4 tiles -> sizes [2,2,1,1]; every cut
    # is INTERIOR to the single value run, so boundaries must resolve
    # to exact event_ids (the filtered sort+limit+max path)
    pairs = [(eid, 5.0) for eid in (11, 3, 7, 20, 1, 15)]
    sf = _write_events_values(tmp_path, pairs)
    got = (q_events_ntile(sf, tiles=4).to_pandas()
           .sort_values("event_id"))
    # event_id order: 1,3,7,11,15,20 -> tiles 1,1,2,2,3,4
    assert got["tile"].tolist() == [1, 1, 2, 2, 3, 4]


def test_streaks_kernel_counts_islands_and_longest():
    # user 1: days 10,11,12, 14 -> 4 active, 2 streaks, longest 3
    # user 2: days 5 only      -> 1 active, 1 streak, longest 1
    # user 3: 7,8, 10,11,12,13 -> 6 active, 2 streaks, longest 4
    uid = np.array([1, 1, 1, 1, 1, 2, 3, 3, 3, 3, 3, 3], dtype=np.int64)
    day = np.array([10, 11, 11, 12, 14, 5, 7, 8, 10, 11, 12, 13],
                   dtype=np.int64)   # note duplicate (1, 11) collapses
    out = streaks_kernel(uid, day).to_pandas().set_index("user_id")
    assert out.loc[1].tolist() == [4, 2, 3]
    assert out.loc[2].tolist() == [1, 1, 1]
    assert out.loc[3].tolist() == [6, 2, 4]


def test_streaks_kernel_empty():
    out = streaks_kernel(np.array([], dtype=np.int64),
                         np.array([], dtype=np.int64))
    assert out.num_rows == 0


def test_mode_tie_breaks_on_min_brand(tmp_path):
    t = pa.table({
        "p_type": pa.array(["a", "a", "a", "a", "b"], pa.string()),
        "p_brand": pa.array(["z", "z", "m", "m", "q"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "part.parquet"))
    got = (q_part_brand_mode(str(tmp_path)).to_pandas()
           .set_index("p_type"))
    assert got.loc["a", "mode_brand"] == "m"     # tie 2-2 -> min brand
    assert int(got.loc["a", "n_parts"]) == 2
    assert got.loc["b", "mode_brand"] == "q"


def test_market_share_bps_sum_close_to_10000(tmp_path):
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["R0", "R1"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    got = (q_nation_market_share(str(tmp_path)).to_pandas()
           .set_index("n_name"))
    # R0: N0=3000c, N1=3000c -> each 5000 bps; R1: N2 alone -> 10000
    assert int(got.loc["N0", "share_bps"]) == 5000
    assert int(got.loc["N1", "share_bps"]) == 5000
    assert int(got.loc["N2", "share_bps"]) == 10000
    # floor division: per-region sums never exceed 10000
    assert got.groupby(got["r_name"])["share_bps"].sum().le(10000).all()


def test_knn_range_tau_margin_holds_on_driver_tables():
    """The oracle recomputes cosine in float32; the engine in float64.
    The filter is only hash-stable if no score sits within cross-engine
    noise (~2e-7) of τ.  Assert a 1e-4 guard band on the shipped
    testdata so a silent regen that violates it fails HERE, not in the
    driver's hash compare."""
    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(ids), -1)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = m[np.argsort(ids)[:10]]
    sc = (m @ q.T)[ids[:, None] != np.sort(ids)[:10][None, :]]
    assert np.abs(sc - KNN_RANGE_TAU).min() > 1e-4
