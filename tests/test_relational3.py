"""Hand-computed fixtures for the round-4 third relational batch —
tied rank/dense_rank windows, the bloom-accelerated exact semi-join,
and the Levenshtein vocabulary join (vectorized kernel + lossless
length-band blocking).  The DuckDB oracle (tools/selfcheck.py)
verifies each end-to-end; these pin corner semantics on inputs small
enough to check by eye."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from __spider_ray.pipelines.relational3 import (
    SEMI_DISC,
    SEMI_QTY,
    levenshtein_pairs,
    q_events_rank,
    q_orders_semi_bloom,
    q_part_name_pairs,
)


def _lev_ref(a: str, b: str) -> int:
    """Scalar reference DP."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_kernel_matches_scalar_reference():
    rng = random.Random(7)
    words = ["", "a", "ab", "kitten", "sitting", "flaw", "lawn",
             "gizmo", "gizmos", "widget", "red widget", "blue widget"]
    words += ["".join(rng.choice("abcd ") for _ in range(rng.randrange(1, 14)))
              for _ in range(40)]
    a = [rng.choice(words) for _ in range(300)]
    b = [rng.choice(words) for _ in range(300)]
    got = levenshtein_pairs(a, b)
    exp = np.array([_lev_ref(x, y) for x, y in zip(a, b)], dtype=np.int64)
    assert (got == exp).all()


def test_levenshtein_kernel_empty_and_unicode():
    a = ["", "直飞", "经停"]
    b = ["abc", "直达", "经停"]
    assert levenshtein_pairs(a, b).tolist() == [3, 1, 0]
    assert levenshtein_pairs([], []).tolist() == []


def test_events_rank_ties(tmp_path):
    # user 1 values: 9, 7, 7, 3  -> rnk 1,2,2,4  drnk 1,2,2,3
    # user 2 values: 5, 5        -> rnk 1,1      drnk 1,1
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([9.0, 7.0, 7.0, 3.0, 5.0, 5.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (q_events_rank(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["rnk"].tolist() == [1, 2, 2, 4, 1, 1]
    assert got["drnk"].tolist() == [1, 2, 2, 3, 1, 1]


def test_orders_semi_bloom_exact_exists(tmp_path):
    # orders 1..6; lineitems qualify (qty>=SEMI_QTY and disc>=SEMI_DISC)
    # only for orders 2 and 5; order 6 has a near-miss on each predicate
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.5, 30.0, 40.0, 50.25, 60.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 5, 6, 6], pa.int64()),
        "l_quantity": pa.array([1.0, SEMI_QTY, 50.0, SEMI_QTY + 1,
                                SEMI_QTY - 1, 50.0]),
        "l_discount": pa.array([0.10, SEMI_DISC, 0.01, 0.09,
                                0.10, SEMI_DISC - 0.01]),
    }), str(tmp_path / "lineitem.parquet"))
    got = (q_orders_semi_bloom(str(tmp_path)).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    assert got["o_orderkey"].tolist() == [2, 5]
    assert got["price_cents"].tolist() == [2050, 5025]


def test_part_name_pairs_blocking_is_lossless(tmp_path):
    # vocabulary: pairs at dist 1 ("red bolt"/"red boat"), dist 2 with
    # length diff 2 ("gizmo"/"gizmos!"), dist>2 excluded, and a
    # duplicate name that must collapse before pairing
    names = ["red bolt", "red boat", "gizmo", "gizmos!", "widget",
             "red bolt"]
    pq.write_table(pa.table({"p_name": pa.array(names, pa.string())}),
                   str(tmp_path / "part.parquet"))
    got = (q_part_name_pairs(str(tmp_path)).to_pandas()
           .sort_values(["name_a", "name_b"]).reset_index(drop=True))
    pairs = list(zip(got["name_a"], got["name_b"], got["dist"]))
    assert pairs == [("gizmo", "gizmos!", 2), ("red boat", "red bolt", 1)]


def test_part_name_pairs_orientation_and_no_self_pairs(tmp_path):
    names = ["aa", "ab", "ba"]        # all within dist 1-2 of each other
    pq.write_table(pa.table({"p_name": pa.array(names, pa.string())}),
                   str(tmp_path / "part.parquet"))
    got = q_part_name_pairs(str(tmp_path)).to_pandas()
    assert (got["name_a"] < got["name_b"]).all()
    assert len(got) == 3              # aa-ab(1) aa-ba(1|2) ab-ba(2)


def test_events_winsorized_clamps_to_group_quantiles(tmp_path):
    # one group, 20 values 1..20 (cents 100..2000): p5 = rank 1 -> 100,
    # p95 = rank 19 -> 1900; clamp changes only the max (2000 -> 1900)
    t = pa.table({
        "event_id": pa.array(list(range(20)), pa.int64()),
        "user_id": pa.array([1] * 20, pa.int64()),
        "event_type": pa.array(["a"] * 20, pa.string()),
        "value": pa.array([float(i) for i in range(1, 21)], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from __spider_ray.pipelines.relational3 import q_events_winsorized
    got = q_events_winsorized(str(tmp_path)).to_pandas()
    assert got["n_rows"].tolist() == [20]
    assert got["sum_clamped_cents"].tolist() == [sum(range(100, 2001, 100)) - 100]


def test_events_running_distinct(tmp_path):
    # user 1 in time order: a, b, a, c  -> 1, 2, 2, 3
    # user 2:               x, x        -> 1, 1
    import numpy as np_
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(np_.array([10, 20, 30, 40, 10, 20],
                                 dtype="datetime64[us]")),
        "event_type": pa.array(["a", "b", "a", "c", "x", "x"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from __spider_ray.pipelines.relational3 import q_events_running_distinct
    got = (q_events_running_distinct(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["n_distinct_types"].tolist() == [1, 2, 2, 3, 1, 1]


def test_events_histogram_buckets(tmp_path):
    # one group, values 0..7 cents -> width math puts one value/bucket
    t = pa.table({
        "event_id": pa.array(list(range(8)), pa.int64()),
        "user_id": pa.array([1] * 8, pa.int64()),
        "event_type": pa.array(["a"] * 8, pa.string()),
        "value": pa.array([i / 100 for i in range(8)], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from __spider_ray.pipelines.relational3 import q_events_histogram
    got = (q_events_histogram(str(tmp_path)).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    assert got["bucket"].tolist() == list(range(8))
    assert got["n"].tolist() == [1] * 8


def test_events_rank_pct_ties(tmp_path):
    # user 1 values desc: 9, 7, 7, 3 (n=4):
    #   rnk 1,2,2,4 -> pr_bp (rnk-1)*10000//3 = 0, 3333, 3333, 10000
    #   cnt_ge 1,3,3,4 -> cd_bp *10000//4 = 2500, 7500, 7500, 10000
    # user 2 single event -> pr_bp 0, cd_bp 10000
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "value": pa.array([9.0, 7.0, 7.0, 3.0, 5.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from __spider_ray.pipelines.relational3 import q_events_rank_pct
    got = (q_events_rank_pct(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["pr_bp"].tolist() == [0, 3333, 3333, 10000, 0]
    assert got["cd_bp"].tolist() == [2500, 7500, 7500, 10000, 10000]
