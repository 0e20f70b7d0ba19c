"""End-to-end tests of the stateful epoch crawl loop: conformance vs
the simulator, two-hop detail fetch, checkpoint/resume."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import ray.data

from conftest import SF_SMALL

from __spider_ray.pipelines import epoch
from oracle_sim import simulate

OUT = "/tmp/spider_ray_test/epoch_crawl"


def _run_fresh(**kw):
    shutil.rmtree(OUT, ignore_errors=True)
    return epoch.run_crawl(SF_SMALL, OUT, resume=False, n_seen_shards=2,
                           fetch_concurrency=2, **kw)


def test_full_crawl_matches_simulator():
    res = _run_fresh()
    order, seen, sim_docs = simulate(SF_SMALL)
    docs = ray.data.read_parquet(os.path.join(OUT, "docs/epoch=0")).to_pandas()
    assert len(docs) == len(sim_docs)
    assert set(docs["doc_id"]) == set(sim_docs)
    # span-sequence equality on a sample of docs
    for doc_id, spans in list(zip(docs["doc_id"], docs["spans"]))[:200]:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        assert got == sim_docs[doc_id]
    # URL-seen set: every depth-0 URL claimed exactly once
    marker0 = json.load(open(os.path.join(OUT, "epoch=0.json")))
    assert res["last_epoch"] == 1
    assert res["totals"]["docs"] == len(sim_docs)
    assert res["totals"]["fares"] > 0


def test_detail_fares_schema_and_semantics():
    if not os.path.exists(os.path.join(OUT, "fares/epoch=1")):
        _run_fresh()
    fares = ray.data.read_parquet(os.path.join(OUT, "fares/epoch=1")).to_pandas()
    fares = fares.drop(columns=[c for c in ("epoch", "chunk")
                                if c in fares.columns])
    assert set(fares.columns) == {"host", "plane_no", "off_date", "lep_price",
                                  "is_meal", "baggage", "min_cabin_price"}
    assert (fares["lep_price"] > 0).all()
    # spot-check one flight against the pure derivation
    from __spider_ray import synth
    row = fares.iloc[0]
    # find the detail URL host by scanning records
    recs = ray.data.read_parquet(os.path.join(OUT, "records/epoch=0")).to_pandas()
    m = recs[(recs["plane_no"] == row["plane_no"]) & (recs["off_date"] == row["off_date"])]
    durl = synth.detail_url(m.iloc[0]["host"], row["plane_no"], row["off_date"])
    cabins = [synth.cabin_fields(durl, j) for j in range(synth.detail_n_cabins(durl))]
    elig = [c for c in cabins if c["ruleId"] == "00000"
            or c["limitLabel"] in synth.ELIGIBLE_LABELS]
    assert elig, "fixture should have eligible cabins for this flight"
    best = min(elig, key=lambda c: (c["clientTicketPrice"], c["cabin_idx"]))
    assert row["min_cabin_price"] == best["clientTicketPrice"]
    want_lep = int(best["lep"]) if best["lep"] != "" else int(best["lrp"])
    assert row["lep_price"] == want_lep


def test_resume_skips_completed_epochs():
    _run_fresh(max_depth=0)        # run only epoch 0, commit checkpoint
    rec_dir = os.path.join(OUT, "records/epoch=0")
    mtime_before = max(os.path.getmtime(os.path.join(rec_dir, f))
                       for f in os.listdir(rec_dir))
    assert not os.path.exists(os.path.join(OUT, "fares/epoch=1"))
    # resume with full depth: must run ONLY epoch 1
    res = epoch.run_crawl(SF_SMALL, OUT, resume=True, n_seen_shards=2,
                          fetch_concurrency=2, max_depth=1)
    assert res["last_epoch"] == 1
    mtime_after = max(os.path.getmtime(os.path.join(rec_dir, f))
                      for f in os.listdir(rec_dir))
    assert mtime_after == mtime_before, "epoch 0 must not be re-crawled"
    fares = ray.data.read_parquet(os.path.join(OUT, "fares/epoch=1"))
    assert fares.count() > 0
    # restored seen-filter: all depth-0 URLs still known
    order, seen, _ = simulate(SF_SMALL)
    from __spider_ray.state.url_seen import UrlSeenSet
    s = UrlSeenSet(n_shards=2)
    import __spider_ray.checkpoint as ckpt
    s.restore_all(ckpt.load_seen_snapshots(OUT, 1, 2))
    assert s.contains(sorted(seen)).all()


def test_resume_noop_when_complete():
    if not os.path.exists(os.path.join(OUT, "epoch=1.json")):
        _run_fresh()
    fares_dir = os.path.join(OUT, "fares/epoch=1")
    mtime = max(os.path.getmtime(os.path.join(fares_dir, f))
                for f in os.listdir(fares_dir))
    res = epoch.run_crawl(SF_SMALL, OUT, resume=True, n_seen_shards=2,
                          fetch_concurrency=2)
    after = max(os.path.getmtime(os.path.join(fares_dir, f))
                for f in os.listdir(fares_dir))
    assert after == mtime
    assert res["last_epoch"] == 1


def test_chunked_crawl_matches_unchunked():
    out_c = "/tmp/spider_ray_test/chunked"
    shutil.rmtree(out_c, ignore_errors=True)
    res = epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                          fetch_concurrency=2, n_chunks=3)
    _order, _seen, sim_docs = simulate(SF_SMALL)
    docs = ray.data.read_parquet(os.path.join(out_c, "docs/epoch=0")).to_pandas()
    assert set(docs["doc_id"]) == set(sim_docs)
    assert res["totals"]["docs"] == len(sim_docs)
    assert res["totals"]["fares"] > 0
    # three chunk markers per epoch + the epoch markers
    for e in (0, 1):
        for c in (0, 1, 2):
            assert os.path.exists(os.path.join(out_c, f"epoch={e}.chunk={c}.json"))


def test_mid_epoch_crash_resume():
    out_c = "/tmp/spider_ray_test/crash"
    shutil.rmtree(out_c, ignore_errors=True)
    import pytest
    with pytest.raises(RuntimeError, match="simulated crash"):
        epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                        fetch_concurrency=2, n_chunks=3, _fail_after_chunk=0)
    # chunk 0 of epoch 0 committed; chunks 1-2 and epoch 1 missing
    assert os.path.exists(os.path.join(out_c, "epoch=0.chunk=0.json"))
    assert not os.path.exists(os.path.join(out_c, "epoch=0.chunk=1.json"))
    c0 = os.path.join(out_c, "records/epoch=0/chunk=0")
    mtimes = {f: os.path.getmtime(os.path.join(c0, f)) for f in os.listdir(c0)}
    # resume: must NOT re-fetch chunk 0, must complete everything else
    res = epoch.run_crawl(SF_SMALL, out_c, resume=True, n_seen_shards=2,
                          fetch_concurrency=2, n_chunks=3)
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(c0, f)) == m, \
            "chunk 0 was re-fetched on resume"
    _order, _seen, sim_docs = simulate(SF_SMALL)
    docs = ray.data.read_parquet(os.path.join(out_c, "docs/epoch=0")).to_pandas()
    assert set(docs["doc_id"]) == set(sim_docs)        # no loss, no dups
    assert len(docs) == len(sim_docs)
    assert res["totals"]["docs"] == len(sim_docs)


def test_doc_store_manifest_on_crawl_path():
    """The epoch loop's doc writes go through the doc-store commit: each
    chunk's docs dir carries a verified manifest (A3 invariant,
    YlTwistPipeline.py:166-169) whose count matches the parquet rows."""
    out_u = "/tmp/spider_ray_test/verify_unique"
    shutil.rmtree(out_u, ignore_errors=True)
    epoch.run_crawl(SF_SMALL, out_u, resume=False, n_seen_shards=2,
                    fetch_concurrency=2, max_depth=0, verify_unique=True)
    OUT = out_u  # noqa: N806 — local shadow, checked dirs below
    from __spider_ray.sources import doc_store
    chunk_dir = os.path.join(OUT, "docs/epoch=0/chunk=0")
    m = doc_store.manifest(chunk_dir)
    assert m is not None and m["format"] in ("lance", "parquet")
    n = ray.data.read_parquet(chunk_dir, file_extensions=["parquet"]).count()
    assert m["rows"] == n
    assert m["unique"] == n        # one row per doc_id — no split/dup docs
    # the chunk marker carries the same commit record (lineage)
    marker = json.load(open(os.path.join(OUT, "epoch=0.chunk=0.json")))
    assert marker["doc_commit"]["rows"] == n


def test_frontier_dir_has_no_orphan_parts():
    """After a crash + resume with shifted work, frontier/epoch=1 must
    contain exactly the committed chunks' subdirs — a re-run clears its
    own chunk dir wholesale, so stale LINK parts cannot survive."""
    out_c = "/tmp/spider_ray_test/crash"       # produced by the crash test
    if not os.path.exists(os.path.join(out_c, "epoch=1.json")):
        import pytest
        shutil.rmtree(out_c, ignore_errors=True)
        with pytest.raises(RuntimeError, match="simulated crash"):
            epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                            fetch_concurrency=2, n_chunks=3, _fail_after_chunk=0)
        epoch.run_crawl(SF_SMALL, out_c, resume=True, n_seen_shards=2,
                        fetch_concurrency=2, n_chunks=3)
    fdir = os.path.join(out_c, "frontier/epoch=1")
    entries = sorted(os.listdir(fdir))
    assert entries == ["chunk=0", "chunk=1", "chunk=2"]
    for e in entries:
        assert all(f.endswith(".parquet")
                   for f in os.listdir(os.path.join(fdir, e)))


def test_robots_deny_path_end_to_end():
    """A deny-list robots fetcher plugged into run_crawl must keep every
    denied-host URL out of records, docs AND depth-1 fares, while the
    rest of the crawl completes normally."""
    out_c = "/tmp/spider_ray_test/robots_deny"
    shutil.rmtree(out_c, ignore_errors=True)
    deny = "bjs.flights.test"                   # the hot host
    res = epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                          fetch_concurrency=2,
                          robots_fetcher=lambda h: h != deny)
    recs = ray.data.read_parquet(os.path.join(out_c, "records/epoch=0")).to_pandas()
    assert len(recs) > 0
    assert (recs["host"] != deny).all()
    fares = ray.data.read_parquet(os.path.join(out_c, "fares/epoch=1")).to_pandas()
    assert (fares["host"] != deny).all()
    # the denied host genuinely existed in the frontier
    from __spider_ray.stages import expand
    fr_hosts = set(expand.frontier_dataset(SF_SMALL).to_pandas()["host"])
    assert deny in fr_hosts
    assert res["totals"]["docs"] > 0


def test_engine_respects_politeness_budget():
    """End-to-end rate limiting: a 1-day crawl with delay_s=0.05 and
    burst=2 must take at least the token-bucket wait of its hottest
    host (the reference budget semantics, settings.py:32-38)."""
    import time
    out_c = "/tmp/spider_ray_test/polite"
    shutil.rmtree(out_c, ignore_errors=True)
    # expected floor: hottest host's URL count beyond burst, at 20 tokens/s
    from __spider_ray.stages import expand
    fr = expand.frontier_dataset(SF_SMALL, 1).to_pandas()
    uniq = fr.drop_duplicates("url")
    hottest = uniq.groupby("host").size().max()
    floor = (hottest - 2) * 0.05
    t0 = time.monotonic()
    epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                    fetch_concurrency=2, max_depth=0, n_days=1, delay_s=0.05,
                    burst=2)
    elapsed = time.monotonic() - t0
    assert elapsed >= floor * 0.8, (elapsed, floor)


def test_v2_crawl_through_engine():
    """api='v2' runs the listCards crawl through the same seen/
    politeness/checkpoint machinery: docs and records must match the
    dataset-flavor v2 pipeline exactly (same URL-dedup semantics)."""
    from __spider_ray.pipelines import crawl
    out_c = "/tmp/spider_ray_test/v2_crawl"
    shutil.rmtree(out_c, ignore_errors=True)
    res = epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                          fetch_concurrency=2, api="v2")
    assert res["last_epoch"] == 0
    recs = ray.data.read_parquet(os.path.join(out_c, "records/epoch=0")).to_pandas()
    want = crawl.flight_records_v2(SF_SMALL).to_pandas()
    assert len(recs) == len(want)
    key = ["url", "flight_idx"]
    got_k = set(map(tuple, recs[key].values))
    want_k = set(map(tuple, want[key].values))
    assert got_k == want_k
    docs = ray.data.read_parquet(os.path.join(out_c, "docs/epoch=0")).to_pandas()
    assert set(docs["doc_id"]) == set(want["doc_id"])
    # v2 docs are text-only (no captcha artifacts in the listCards body)
    for spans_ in docs["spans"].head(50):
        assert all(s["kind"] == "text" for s in spans_)
    # no dangling frontier for a depth-0 api
    assert not os.path.exists(os.path.join(out_c, "fares"))


def test_api_mismatch_on_resume_rejected():
    import pytest
    out_c = "/tmp/spider_ray_test/api_guard"
    shutil.rmtree(out_c, ignore_errors=True)
    epoch.run_crawl(SF_SMALL, out_c, resume=False, n_seen_shards=2,
                    fetch_concurrency=2, max_depth=0, n_days=1)
    with pytest.raises(ValueError, match="api"):
        epoch.run_crawl(SF_SMALL, out_c, resume=True, n_seen_shards=2,
                        fetch_concurrency=2, api="v2")

def test_daily_partitioned_doc_store_and_cross_day_resume():
    """Table-per-day analog (ylutil.py:13-15): doc parts land under a
    date=YYYY_MM_DD layer, the commit manifest inventories per-day
    partitions, and a crash-resume on day 2 preserves day-1 partitions
    byte-for-byte while completing day 2 under its own date."""
    import pytest
    from __spider_ray.sources import doc_store

    out_d = "/tmp/spider_ray_test/daily"
    shutil.rmtree(out_d, ignore_errors=True)
    epoch.run_crawl(SF_SMALL, out_d, resume=False, n_seen_shards=2,
                    fetch_concurrency=2, max_depth=0,
                    crawl_date="2026_01_01")
    m = doc_store.manifest(os.path.join(out_d, "docs/epoch=0/chunk=0"))
    assert m["partitions"] == {"2026_01_01": m["rows"]} and m["rows"] > 0
    d1_dir = os.path.join(out_d, "docs/epoch=0/chunk=0/date=2026_01_01")
    assert os.path.isdir(d1_dir)

    # day 2: a FRESH daily crawl into its own store (the reference
    # starts a new table each day), crashing mid-epoch…
    out_d2 = "/tmp/spider_ray_test/daily2"
    shutil.rmtree(out_d2, ignore_errors=True)
    with pytest.raises(RuntimeError, match="simulated crash"):
        epoch.run_crawl(SF_SMALL, out_d2, resume=False, n_seen_shards=2,
                        fetch_concurrency=2, max_depth=0, n_chunks=2,
                        crawl_date="2026_01_02", _fail_after_chunk=0)
    # …and resuming under the SAME date completes without re-fetching
    res = epoch.run_crawl(SF_SMALL, out_d2, resume=True, n_seen_shards=2,
                          fetch_concurrency=2, max_depth=0, n_chunks=2,
                          crawl_date="2026_01_02")
    _order, _seen, sim_docs = simulate(SF_SMALL)
    total = 0
    for c in (0, 1):
        mc = doc_store.manifest(os.path.join(out_d2, f"docs/epoch=0/chunk={c}"))
        assert set(mc["partitions"]) <= {"2026_01_02"}
        total += mc["rows"]
    assert total == len(sim_docs) == res["totals"]["docs"]
    # hive read exposes the partition column for per-day pruning
    docs = ray.data.read_parquet(os.path.join(out_d2, "docs/epoch=0")).to_pandas()
    assert set(docs["date"].astype(str)) == {"2026_01_02"}
    assert set(docs["doc_id"]) == set(sim_docs)
