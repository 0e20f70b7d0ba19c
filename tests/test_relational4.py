"""Hand-computed fixtures for the round-5 fourth relational batch —
grouped Pearson correlation (basis points from exact integer sums),
exact grouped median/MAD via value-frequency compression, and per-lang
vocabulary stats.  The DuckDB oracle (tools/selfcheck.py) verifies each
end-to-end; these pin corner semantics on by-eye-checkable inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from __spider_ray.pipelines.relational4 import (
    _median_from_counts,
    q_lineitem_corr,
    q_orders_mad,
    q_text_vocabulary,
)


def test_median_from_counts_matches_quantile_disc():
    # lower median: sorted index (N-1)//2, like DuckDB quantile_disc(.5)
    assert _median_from_counts(np.array([10, 20]),
                               np.array([1, 1])) == 10          # N=2
    assert _median_from_counts(np.array([1, 2, 3, 4]),
                               np.array([1, 1, 1, 1])) == 2     # N=4
    assert _median_from_counts(np.array([5, 1]),
                               np.array([3, 2])) == 5           # 1,1,5,5,5
    assert _median_from_counts(np.array([7]), np.array([9])) == 7


def test_corr_perfect_and_inverse(ray_session, tmp_path):
    # group A: y = 100*x  -> corr_bp 10000; group B: y = -100*x + 700
    # -> corr_bp -10000 (exact +/-1 correlations survive the fp path)
    t = pa.table({
        "l_returnflag": pa.array(["A"] * 4 + ["B"] * 4),
        "l_linestatus": pa.array(["O"] * 8),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0] * 2),
        "l_extendedprice": pa.array(
            [100.0, 200.0, 300.0, 400.0, 600.0, 500.0, 400.0, 300.0]),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    got = (q_lineitem_corr(str(tmp_path)).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    assert got["corr_bp"].tolist() == [10000, -10000]
    assert got["n"].tolist() == [4, 4]


def test_orders_mad_exact(ray_session, tmp_path):
    # priority P: totals 1.00 2.00 3.00 4.00 100.00 (cents 100..10000)
    #   lower median = 300; |c-300| = 200,100,0,100,9700 -> MAD = 100
    # priority Q: totals 5.00 5.00 9.00 -> med 500, devs 0,0,400 -> MAD 0
    t = pa.table({
        "o_orderpriority": pa.array(["P"] * 5 + ["Q"] * 3),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0, 100.0,
                                  5.0, 5.0, 9.0]),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = (q_orders_mad(str(tmp_path)).to_pandas()
           .sort_values("pr").reset_index(drop=True))
    assert got["med_cents"].tolist() == [300, 500]
    assert got["mad_cents"].tolist() == [100, 0]


def test_vocabulary_dedups_across_batches(ray_session, tmp_path):
    # 'en': 6 words total, 4 distinct ('a' and 'b' repeat across docs);
    # 'fr': double space yields an empty token that must be dropped
    t = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"]),
        "lang": pa.array(["en", "en", "fr"]),
        "text": pa.array(["a b c", "a b d", "x  y"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (q_text_vocabulary(str(tmp_path)).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    assert got["n_words"].tolist() == [6, 2]
    assert got["n_vocab"].tolist() == [4, 2]


def test_corpus_split_deterministic_and_partitioned(ray_session, tmp_path):
    t = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "lang": pa.array(["en"] * 40),
        "text": pa.array(["x"] * 40),
        "source": pa.array(["s"] * 40),
        "n_chars": pa.array([1] * 40, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from __spider_ray.pipelines.relational4 import q_corpus_split
    got = q_corpus_split(str(tmp_path)).to_pandas().set_index("split")
    assert got.loc["train", "n_docs"] == 32
    assert got.loc["val", "n_docs"] == 4
    assert got.loc["test", "n_docs"] == 4


def test_budget_sample_prefix_semantics(ray_session, tmp_path):
    # en docs (id asc): 20k, 20k, 20k chars, budget 50k -> keep 2 (40k)
    # fr: one 60k doc -> overshoots immediately -> keep 0
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 10], pa.int64()),
        "lang": pa.array(["en", "en", "en", "fr"]),
        "text": pa.array(["x"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([20000, 20000, 20000, 60000], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from __spider_ray.pipelines.relational4 import q_budget_sample
    got = (q_budget_sample(str(tmp_path)).to_pandas()
           .set_index("lang"))
    assert got.loc["en", "n_docs_kept"] == 2
    assert got.loc["en", "n_chars_kept"] == 40000
    assert got.loc["fr", "n_docs_kept"] == 0
    assert got.loc["fr", "n_chars_kept"] == 0
