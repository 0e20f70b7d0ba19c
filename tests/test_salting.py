"""Hot-host salting: output equivalence + key-spread property."""

from __future__ import annotations

import numpy as np

from conftest import SF_SMALL

from __spider_ray.pipelines import epoch
from __spider_ray.stages import expand


def test_salting_spreads_hot_host_without_changing_rows():
    fr = expand.frontier_dataset(SF_SMALL)
    base = fr.select_columns(["url", "host", "sort_key"]).to_pandas()
    salted = epoch.salt_hot_hosts(expand.frontier_dataset(SF_SMALL),
                                  hot_fraction=0.02)
    got = salted.select_columns(["url", "host", "sort_key"]).to_pandas()
    # same rows, same URLs — only sort_key values may differ
    assert sorted(got["url"]) == sorted(base["url"])
    merged = base.merge(got, on="url", suffixes=("_a", "_b"))
    changed = merged[merged["sort_key_a"] != merged["sort_key_b"]]
    assert len(changed) > 0, "expected at least one hot host to be salted"
    # every changed row belongs to a genuinely hot host
    hot_hosts = set(changed["host_a"])
    counts = base.groupby("host").size()
    for h in hot_hosts:
        assert counts[h] > 0.02 * len(base)
    # the hot host's salted keys split into multiple distinct sub-ranges
    h0 = next(iter(hot_hosts))
    sub = got[got["host"] == h0]["sort_key"].to_numpy()
    spread = len(np.unique(sub >> 28))
    assert spread > 1


def test_crawl_with_salting_same_outputs(tmp_path):
    import ray.data
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "salted")
    epoch.run_crawl(SF_SMALL, out_a, resume=False, max_depth=0)
    epoch.run_crawl(SF_SMALL, out_b, resume=False, max_depth=0, salt_hot=True)
    docs_a = ray.data.read_parquet(out_a + "/docs").to_pandas()
    docs_b = ray.data.read_parquet(out_b + "/docs").to_pandas()
    assert set(docs_a["doc_id"]) == set(docs_b["doc_id"])
