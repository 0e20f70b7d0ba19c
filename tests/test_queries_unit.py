"""Hand-computed fixtures for the bucket-kernel analytics queries —
funnel stage assignment, cohort offsets, daily new users, keep-best
dedup, centroid quantization.  The DuckDB oracle (tools/selfcheck.py)
verifies these end-to-end at sf scale; these tests pin the corner
semantics (ordering constraints, tie-breaks, 1-based dims) on inputs
small enough to check by eye."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from __spider_ray.pipelines.relational import (
    q_events_daily_new_users,
    q_events_funnel,
    q_orders_cohorts,
)
from __spider_ray.pipelines.textops import q_dedup_keep_best, q_emb_centroid_sums

US = "datetime64[us]"


def _write_events(tmp_path, rows):
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype=US)),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_requires_strictly_increasing_stage_times(tmp_path):
    rows = [
        # u1: full ordered journey -> stage 3
        (1, "2024-01-01T00:00:00", "signup"),
        (1, "2024-01-01T01:00:00", "view"),
        (1, "2024-01-01T02:00:00", "purchase"),
        # u2: purchase BEFORE the first view -> stops at stage 2
        (2, "2024-01-01T00:00:00", "signup"),
        (2, "2024-01-01T02:00:00", "view"),
        (2, "2024-01-01T01:00:00", "purchase"),
        # u3: view precedes signup (never views after) -> stage 1
        (3, "2024-01-01T00:00:00", "view"),
        (3, "2024-01-01T01:00:00", "signup"),
        # u4: activity but never signs up -> stage 0
        (4, "2024-01-01T00:00:00", "view"),
        (4, "2024-01-01T01:00:00", "purchase"),
        # u5: simultaneous signup+view (strict > required) -> stage 1
        (5, "2024-01-01T00:00:00", "signup"),
        (5, "2024-01-01T00:00:00", "view"),
    ]
    sf = _write_events(tmp_path, rows)
    got = q_events_funnel(sf).to_pandas().set_index("user_id")["stage"]
    assert got.to_dict() == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


def test_daily_new_users_counts_first_seen_day_only(tmp_path):
    rows = [
        (1, "2024-01-01T08:00:00", "view"),
        (1, "2024-01-03T08:00:00", "view"),   # not new on day 3
        (2, "2024-01-01T09:00:00", "view"),
        (3, "2024-01-02T10:00:00", "view"),
        (4, "2024-01-03T11:00:00", "view"),
    ]
    sf = _write_events(tmp_path, rows)
    df = q_events_daily_new_users(sf).to_pandas()
    assert list(df["day"]) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert list(df["new_users"]) == [2, 1, 1]
    assert list(df["cum_users"]) == [2, 3, 4]


def test_cohort_offsets_are_month_exact(tmp_path):
    t = pa.table({
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(np.array(
            ["2024-01-15", "2024-01-20", "2024-03-02",   # c1: offsets 0, 2
             "2024-02-28"], dtype=US)),                  # c2: offset 0
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    df = q_orders_cohorts(str(tmp_path)).to_pandas()
    got = {(r.cohort, r.offset_months): r.n_custs for r in df.itertuples()}
    assert got == {("2024-01", 0): 1, ("2024-01", 2): 1, ("2024-02", 0): 1}


def test_keep_best_breaks_ties_on_min_doc_id(tmp_path):
    # ids chosen indivisible by 5 and 7 so corpus() injects nothing
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["Same Text", "same text", "unique"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = q_dedup_keep_best(str(tmp_path)).to_pandas()
    by_id = df.set_index("doc_id")
    assert set(df["doc_id"]) == {1, 3}          # 2 deduped into 1's group
    assert by_id.loc[1, "n_copies"] == 2
    assert by_id.loc[3, "n_copies"] == 1


def test_centroid_sums_floor_quantization_and_one_based_dims(tmp_path):
    emb = [[0.15, -0.25], [0.35, 0.55], [1.0, -1.0]]
    t = pa.table({
        "label": pa.array([7, 7, 9], pa.int32()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    df = q_emb_centroid_sums(str(tmp_path)).to_pandas()
    got = {(r.label, r.dim): (r.qsum, r.n) for r in df.itertuples()}
    f = lambda x: int(np.floor(np.float64(np.float32(x)) * 1e6))
    assert got == {
        (7, 1): (f(0.15) + f(0.35), 2),
        (7, 2): (f(-0.25) + f(0.55), 2),
        (9, 1): (f(1.0), 1),
        (9, 2): (f(-1.0), 1),
    }
