"""Hot-host salting: output equivalence + key-spread property."""

from __future__ import annotations

import numpy as np

from conftest import SF_SMALL

from __spider_ray.pipelines import epoch
from __spider_ray.stages import expand


def test_salting_spreads_hot_host_without_changing_rows():
    fr = expand.frontier_dataset(SF_SMALL)
    base = fr.select_columns(["url", "host", "priority"]).to_pandas()
    salted = epoch.salt_hot_hosts(expand.frontier_dataset(SF_SMALL),
                                  hot_fraction=0.02)
    got = salted.select_columns(["url", "host", "priority",
                                 "sort_key"]).to_pandas()
    # same rows, same URLs — only sort_key values may differ
    assert sorted(got["url"]) == sorted(base["url"])
    # within a host, sort_key = host_base + salt·2^prio_bits + priority, so
    # (sort_key − priority) takes exactly one value per UNSALTED host and
    # >1 values (the sub-ranges) for at least one genuinely hot host.
    counts = base.groupby("host").size()
    hot = set(counts[counts > 0.02 * len(base)].index)
    assert hot, "fixture should contain a hot host"
    got["residue"] = got["sort_key"].to_numpy() - got["priority"].to_numpy().astype(np.int64)
    spread = got.groupby("host")["residue"].nunique()
    for h, s in spread.items():
        if h not in hot:
            assert s == 1, f"non-hot host {h} must not be salted"
    assert any(spread[h] > 1 for h in hot), \
        "expected at least one hot host split into multiple sub-ranges"
    # priority ORDER is preserved inside every salted sub-range
    h0 = max(hot, key=lambda h: counts[h])
    sub = got[got["host"] == h0].sort_values("sort_key")
    for _, grp in sub.groupby("residue"):
        assert (np.diff(grp["priority"].to_numpy()) >= 0).all()


def test_crawl_with_salting_same_outputs(tmp_path):
    import ray.data
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "salted")
    epoch.run_crawl(SF_SMALL, out_a, resume=False, max_depth=0)
    epoch.run_crawl(SF_SMALL, out_b, resume=False, max_depth=0, salt_hot=True)
    docs_a = ray.data.read_parquet(out_a + "/docs").to_pandas()
    docs_b = ray.data.read_parquet(out_b + "/docs").to_pandas()
    assert set(docs_a["doc_id"]) == set(docs_b["doc_id"])
