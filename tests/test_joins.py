"""Distributed hash join vs pandas merge oracle (dups, misses, multi-key)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from __spider_ray.functions.joins import hash_join

rng = np.random.RandomState(7)


def _mk(n, keyspace, side):
    return pd.DataFrame({
        "k1": rng.randint(0, keyspace, n).astype(str),
        "k2": rng.randint(0, 3, n).astype(str),
        f"v_{side}": rng.randint(0, 1000, n),
    })


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).astype(object)
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(how):
    l = _mk(500, 40, "l")
    r = _mk(300, 40, "r")
    got = hash_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    on=["k1", "k2"], how=how, n_buckets=8).to_pandas()
    want = l.merge(r, on=["k1", "k2"], how=how)
    if how in ("left", "outer"):
        for c in (("v_r",) if how == "left" else ("v_l", "v_r")):
            want[c] = want[c].astype("object").where(want[c].notna(), "None")
            got[c] = got[c].astype("object").where(got[c].notna(), "None")
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_hash_join_inner():
    _check("inner")


def test_hash_join_left():
    _check("left")


def test_hash_join_full_outer():
    _check("outer")


def test_hash_join_full_outer_null_keys():
    # null keys match nothing but BOTH sides' null-key rows survive
    # a full outer join, each unmatched.
    l = pd.DataFrame({"k1": ["a", None], "k2": ["1", "1"], "v_l": [10, 20]})
    r = pd.DataFrame({"k1": ["c", None], "k2": ["1", "1"], "v_r": [100, 200]})
    got = hash_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    on=["k1", "k2"], how="outer", n_buckets=4).to_pandas()
    assert len(got) == 4
    assert sorted(got[got["v_r"].isna()]["v_l"]) == [10, 20]
    assert sorted(got[got["v_l"].isna()]["v_r"]) == [100, 200]


def test_hash_join_null_keys_sql_semantics():
    # SQL semantics: a null key matches nothing — inner drops the row,
    # left emits it unmatched (and never raises on the None-vs-str sort).
    l = pd.DataFrame({"k1": ["a", None, "b", None], "k2": ["1", "1", "1", "1"],
                      "v_l": [10, 20, 30, 40]})
    r = pd.DataFrame({"k1": ["a", None, "c"], "k2": ["1", "1", "1"],
                      "v_r": [100, 200, 300]})
    inner = hash_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                      on=["k1", "k2"], how="inner", n_buckets=4).to_pandas()
    assert inner[["k1", "v_l", "v_r"]].values.tolist() == [["a", 10, 100]]
    left = hash_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                     on=["k1", "k2"], how="left", n_buckets=4).to_pandas()
    assert len(left) == 4
    matched = left[left["v_r"].notna()]
    assert matched[["k1", "v_l", "v_r"]].values.tolist() == [["a", 10, 100.0]]
    assert sorted(left[left["v_r"].isna()]["v_l"]) == [20, 30, 40]


def test_hash_join_rejects_collisions():
    import pytest
    l = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [2]}))
    with pytest.raises(ValueError, match="collision"):
        hash_join(l, r, on=["k"])


# ------------------------------------------------------------- asof join
from __spider_ray.functions.joins import asof_join  # noqa: E402


def _asof_oracle(l: pd.DataFrame, r: pd.DataFrame) -> list[tuple]:
    """Per-left-row brute force: max rt ≤ t, tie → max tv."""
    out = []
    for _, row in l.iterrows():
        cand = r[(r["k"] == row["k"]) & (r["rt"] <= row["t"])]
        if len(cand):
            best = cand.sort_values(["rt", "tv"]).iloc[-1]
            out.append((row["k"], row["t"], row["v_l"],
                        int(best["tv"]), int(best["v_r"])))
    return sorted(out)


def test_asof_join_vs_brute_force():
    n_l, n_r = 400, 300
    l = pd.DataFrame({"k": rng.randint(0, 20, n_l).astype(str),
                      "t": rng.randint(0, 100, n_l),
                      "v_l": rng.randint(0, 1000, n_l)})
    r = pd.DataFrame({"k": rng.randint(0, 25, n_r).astype(str),
                      "rt": rng.randint(0, 100, n_r),      # many rt ties
                      "tv": np.arange(n_r),                # unique tie-break
                      "v_r": rng.randint(0, 1000, n_r)})
    got = asof_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    on=["k"], left_time="t", right_time="rt",
                    tie="tv", n_buckets=8).to_pandas()
    got_rows = sorted((row["k"], int(row["t"]), int(row["v_l"]),
                       int(row["tv"]), int(row["v_r"]))
                      for _, row in got.iterrows())
    assert got_rows == _asof_oracle(l, r)


def test_asof_join_left_and_nulls():
    l = pd.DataFrame({"k": ["a", "a", "b", None, "z"],
                      "t": [5, 1, 9, 5, 5],
                      "v_l": [1, 2, 3, 4, 5]})
    r = pd.DataFrame({"k": ["a", "a", "b"],
                      "rt": [3, 3, 10],            # (a,3) is a tie pair
                      "tv": [7, 9, 1],
                      "v_r": [70, 90, 10]})
    inner = asof_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                      on=["k"], left_time="t", right_time="rt",
                      tie="tv", n_buckets=4).to_pandas()
    # only (a, t=5) matches — tie resolves to tv=9; t=1 precedes rt=3,
    # b's order is after t=9, null key matches nothing, z has no rights
    assert inner[["v_l", "tv", "v_r"]].values.tolist() == [[1, 9, 90]]
    left = asof_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                     on=["k"], left_time="t", right_time="rt",
                     tie="tv", how="left", n_buckets=4).to_pandas()
    assert len(left) == 5
    assert sorted(left[left["v_r"].isna()]["v_l"]) == [2, 3, 4, 5]
    m = left[left["v_r"].notna()]
    assert m[["v_l", "v_r"]].values.tolist() == [[1, 90.0]]


# ------------------------------------------------------------ range join
import pyarrow as pa  # noqa: E402

from __spider_ray.functions.joins import _BandIndex, range_join_broadcast  # noqa: E402


def test_band_index_overlap_and_gaps():
    # bands: [1,5], [4,8] (overlap 4-5), [20,20]; gaps elsewhere
    idx = _BandIndex(np.array([1, 4, 20]), np.array([5, 8, 20]))
    v = np.array([0, 1, 4, 5, 6, 8, 9, 19, 20, 21])
    rows, bands = idx.lookup(v)
    got = sorted(zip(v[rows].tolist(), bands.tolist()))
    assert got == [(1, 0), (4, 0), (4, 1), (5, 0), (5, 1),
                   (6, 1), (8, 1), (20, 2)]


def test_range_join_broadcast():
    facts = pd.DataFrame({"qty": [0, 3, 22, 45, 27, 100],
                          "fid": [0, 1, 2, 3, 4, 5]})
    bands = pa.table({"band": pa.array(["low", "mid", "promo"]),
                      "lo": pa.array([1, 10, 20], pa.int64()),
                      "hi": pa.array([9, 24, 30], pa.int64())})
    out = range_join_broadcast(ray.data.from_pandas(facts), bands,
                               value_col="qty", lo_col="lo", hi_col="hi",
                               concurrency=2).to_pandas()
    got = sorted(zip(out["fid"], out["band"]))
    assert got == [(1, "low"), (2, "mid"), (2, "promo"),
                   (4, "promo")]  # 0,45,100 out of all bands
