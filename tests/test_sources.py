"""Tests for seed file reading/sharding (S1/S2) and the doc store."""

from __future__ import annotations

import os

import pytest
import ray.data

from conftest import SF_SMALL

from __spider_ray.sources import doc_store
from __spider_ray.sources.seed_reader import read_seed_file

SEED_LINES = [
    "{'from_city_name': '广州', 'from_city_code': 'CAN', "
    "'to_city_name': '北京', 'to_city_code': 'PEK'}",
    '{"from_city_name": "上海", "from_city_code": "SHA", '
    '"to_city_name": "武隆", "to_city_code": "CQW"}',
    "{'from_city_name': '成都', 'from_city_code': 'CTU', "
    "'to_city_name': '深圳', 'to_city_code': 'SZX'}",
]


@pytest.fixture()
def seed_file(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("\n".join(SEED_LINES) + "\n", encoding="utf-8")
    return str(p)


def test_read_seed_file_both_syntaxes(seed_file):
    ds = read_seed_file(seed_file)
    rows = ds.to_pandas()
    assert list(rows["seed_id"]) == [0, 1, 2]
    # the reader canonicalizes: SHA collapses to PVG via AIRPORT_MAP so
    # alias destinations share one host bucket / seen identity
    assert list(rows["from_city_code"]) == ["CAN", "PVG", "CTU"]
    assert rows["to_city_name"][1] == "重庆"       # 武隆 renamed (ctripSpider.py:144)


def test_seed_shard_window(seed_file):
    ds = read_seed_file(seed_file, from_line=2, to_line=3)
    rows = ds.to_pandas()
    assert list(rows["seed_id"]) == [1, 2]
    full = read_seed_file(seed_file, from_line=-1, to_line=-1)
    assert full.count() == 3


def test_doc_store_roundtrip(tmp_path):
    from __spider_ray.pipelines import crawl
    docs = crawl.documents(SF_SMALL).limit(50)
    path = str(tmp_path / "docs")
    commit = doc_store.write_documents(docs, path, expected_rows=50)
    assert commit["rows"] >= 50
    assert commit["format"] in ("lance", "parquet")
    back = doc_store.read_documents(path)
    assert back.count() == commit["rows"]
    assert doc_store.manifest(path)["rows"] == commit["rows"]


def test_doc_store_count_verification(tmp_path):
    ds = ray.data.from_items([{"doc_id": "a", "x": 1}])
    with pytest.raises(RuntimeError, match="verification failed"):
        doc_store.write_documents(ds, str(tmp_path / "short"), expected_rows=10)


def test_engine_config_from_ini(tmp_path):
    """INI config surface (the reference's flight_spider_config.ini
    analog): partial files override only named keys; the deny list
    builds a robots fetcher; kwargs drive run_crawl end-to-end."""
    from __spider_ray.config import EngineConfig
    p = tmp_path / "engine.ini"
    p.write_text("""
[crawl]
delay_s = 0.25
burst = 3
n_chunks = 2
[state]
n_seen_shards = 2
[robots]
deny_hosts = bad.test, worse.test
""")
    cfg = EngineConfig.from_ini(str(p))
    assert cfg.delay_s == 0.25 and cfg.burst == 3 and cfg.n_chunks == 2
    assert cfg.n_seen_shards == 2
    assert cfg.fetch_batch_size == 4096          # untouched default
    fetcher = cfg.robots_fetcher()
    assert fetcher("bad.test") is False and fetcher("ok.test") is True
    kw = cfg.crawl_kwargs()
    assert kw["delay_s"] == 0.25
    assert kw["robots_fetcher"]("worse.test") is False
    import pytest
    with pytest.raises(FileNotFoundError):
        EngineConfig.from_ini(str(tmp_path / "missing.ini"))


def test_kmv_screen_catches_duplicate_parts(tmp_path):
    """The footer-sketch screening must escalate to the exact audit and
    fail the commit when parts carry heavily duplicated doc_ids, even
    with unique_key unset (the always-on path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from __spider_ray.functions.hashing import hash64, kmv_sketch
    from __spider_ray.sources.doc_store import commit_staged_documents

    d = tmp_path / "docs"
    d.mkdir()
    ids = pa.array([f"doc-{i}" for i in range(2000)])
    t = pa.table({"doc_id": ids, "payload": pa.array([1] * 2000)})
    sk = kmv_sketch(hash64(ids))
    t = t.replace_schema_metadata({b"kmv_doc_id": sk.tobytes()})
    pq.write_table(t, str(d / "a.parquet"))
    pq.write_table(t, str(d / "b.parquet"))      # exact duplicate part
    with pytest.raises(RuntimeError, match="distinct"):
        commit_staged_documents(str(d))


def test_kmv_screen_passes_clean_parts(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spider_ray.functions.hashing import hash64, kmv_sketch
    from __spider_ray.sources.doc_store import commit_staged_documents

    d = tmp_path / "docs"
    d.mkdir()
    for part in range(3):
        ids = pa.array([f"doc-{part}-{i}" for i in range(1500)])
        t = pa.table({"doc_id": ids})
        t = t.replace_schema_metadata(
            {b"kmv_doc_id": kmv_sketch(hash64(ids)).tobytes()})
        pq.write_table(t, str(d / f"p{part}.parquet"))
    commit = commit_staged_documents(str(d))
    assert commit["rows"] == 4500
    est = commit["kmv_distinct_est"]
    assert est is not None and abs(est - 4500) / 4500 < 0.3


def test_kmv_exact_regime_catches_small_duplication(tmp_path):
    """Below k=256 distinct values the merged sketch is the exact
    distinct set — even a handful of duplicate rows must fail the
    commit (no estimation slack in this regime)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from __spider_ray.functions.hashing import hash64, kmv_sketch
    from __spider_ray.sources.doc_store import commit_staged_documents

    d = tmp_path / "docs"
    d.mkdir()
    ids = [f"doc-{i}" for i in range(200)] + ["doc-0"] * 10   # 5% dup
    t = pa.table({"doc_id": pa.array(ids)})
    t = t.replace_schema_metadata(
        {b"kmv_doc_id": kmv_sketch(hash64(pa.array(ids))).tobytes(),
         b"n_docs": str(len(ids)).encode()})
    pq.write_table(t, str(d / "a.parquet"))
    with pytest.raises(RuntimeError, match="distinct"):
        commit_staged_documents(str(d))


def test_kmv_part_exact_catches_dup_despite_saturated_merge(tmp_path):
    """Per-part exactness screen (ADVICE r2): a small part with
    within-part duplicates must escalate even when a big clean part has
    pushed the MERGED sketch into estimate territory (where a <19%
    shortfall would otherwise pass)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from __spider_ray.functions.hashing import hash64, kmv_sketch
    from __spider_ray.sources.doc_store import commit_staged_documents

    d = tmp_path / "docs"
    d.mkdir()
    big_ids = pa.array([f"doc-big-{i}" for i in range(5000)])   # saturates k=256
    big = pa.table({"doc_id": big_ids}).replace_schema_metadata(
        {b"kmv_doc_id": kmv_sketch(hash64(big_ids)).tobytes(),
         b"n_docs": b"5000"})
    pq.write_table(big, str(d / "big.parquet"))
    ids = [f"doc-s-{i}" for i in range(100)] + ["doc-s-0"] * 10  # 10 dups
    small = pa.table({"doc_id": pa.array(ids)}).replace_schema_metadata(
        {b"kmv_doc_id": kmv_sketch(hash64(pa.array(ids))).tobytes(),
         b"n_docs": str(len(ids)).encode()})
    pq.write_table(small, str(d / "small.parquet"))
    # overall shortfall is 10/5110 ≈ 0.2% — far under the merged-sketch
    # 3σ threshold; only the per-part exact check can prove it
    with pytest.raises(RuntimeError, match="distinct"):
        commit_staged_documents(str(d))


def test_kmv_mixed_writer_parts_not_falsely_flagged(tmp_path):
    """Unsketched parts (non-epoch writers) are outside the screen's
    coverage: their rows must not count against the sketched parts'
    estimate (no false suspicion, no surprise full audit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spider_ray.functions.hashing import hash64, kmv_sketch
    from __spider_ray.sources.doc_store import commit_staged_documents

    d = tmp_path / "docs"
    d.mkdir()
    ids = pa.array([f"doc-{i}" for i in range(300)])
    t = pa.table({"doc_id": ids})
    t = t.replace_schema_metadata(
        {b"kmv_doc_id": kmv_sketch(hash64(ids)).tobytes(),
         b"n_docs": b"300"})
    pq.write_table(t, str(d / "sketched.parquet"))
    other = pa.table({"doc_id": pa.array([f"x-{i}" for i in range(5000)])})
    pq.write_table(other, str(d / "foreign.parquet"))   # no footer sketch
    commit = commit_staged_documents(str(d))
    assert commit["rows"] == 5300
    assert commit["kmv_covered_rows"] == 300


def test_commit_empty_staging_dir(tmp_path):
    """A chunk whose pass emitted nothing must commit a zero-row
    manifest instead of crashing on the empty-directory read."""
    from __spider_ray.sources.doc_store import (commit_staged_documents,
                                                manifest)
    d = tmp_path / "docs"
    d.mkdir()
    commit = commit_staged_documents(str(d))
    assert commit["rows"] == 0
    m = manifest(str(d))
    assert m is not None and m["rows"] == 0


def test_doc_store_date_partition_pruning(tmp_path):
    """Windowed reads open ONLY the delta partitions' files (round-4
    verdict stretch item #8): the date= directory name is the predicate,
    no finished day's parquet is handed to read_parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "docs")
    days = ["2026_08_01", "2026_08_02", "2026_08_03", "2026_08_04"]
    for i, d in enumerate(days):
        part = os.path.join(path, f"date={d}")
        os.makedirs(part)
        pq.write_table(pa.table({"doc_id": [f"d{i}a", f"d{i}b"],
                                 "day": [d, d]}),
                       os.path.join(part, "part0.parquet"))
    # an undated stray part must never enter a windowed read
    pq.write_table(pa.table({"doc_id": ["stray"], "day": ["?"]}),
                   os.path.join(path, "stray.parquet"))

    files = doc_store.partition_files(path, date_from="2026_08_03")
    assert [f for f in files if "date=2026_08_01" in f or
            "date=2026_08_02" in f or "stray" in f] == []
    assert len(files) == 2

    ds = doc_store.read_documents(path, date_from="2026_08_03",
                                  date_to="2026_08_03")
    assert sorted(ds.to_pandas()["doc_id"]) == ["d2a", "d2b"]
    opened = ds.input_files()
    assert all("date=2026_08_03" in f for f in opened) and len(opened) == 1

    # open-ended window + unfiltered read still sees everything dated
    assert doc_store.read_documents(path, date_from="2026_08_01").count() == 8
    assert doc_store.read_documents(path).count() == 9  # incl. stray

    # empty window → empty dataset, zero files opened
    assert doc_store.read_documents(path, date_from="2026_09_01").count() == 0


# ------------------------------------------------------------- compaction


def _write_store_parts(part_dir, n_parts, rows_per_part, start=0):
    """Small parts shaped like the epoch tee's output (KMV + n_docs
    footer metadata)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spider_ray.functions.hashing import hash64, kmv_sketch
    os.makedirs(part_dir, exist_ok=True)
    for p in range(n_parts):
        ids = pa.array([f"doc-{start + p * rows_per_part + i}"
                        for i in range(rows_per_part)])
        t = pa.table({"doc_id": ids,
                      "payload": pa.array(list(range(rows_per_part)))})
        sk = kmv_sketch(hash64(ids))
        t = t.replace_schema_metadata(
            {b"kmv_doc_id": sk.tobytes(),
             b"n_docs": str(rows_per_part).encode()})
        pq.write_table(t, os.path.join(part_dir, f"part-{p:04d}.parquet"))


def test_compact_partition_merges_and_preserves_rows(ray_session, tmp_path):
    import glob

    store = str(tmp_path / "docs")
    pdir = os.path.join(store, "date=2024_01_01")
    _write_store_parts(pdir, 12, 50)
    before = doc_store.read_documents(store).to_pandas()
    res = doc_store.compact_partition(store, "2024_01_01",
                                      target_bytes=1 << 62)
    assert res["bins"] == 1 and res["rows"] == 600
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    assert len(files) == 1 and "compact-" in files[0]
    after = doc_store.read_documents(store).to_pandas()
    assert sorted(after["doc_id"]) == sorted(before["doc_id"])
    # KMV screen still works on the merged footer: 600 distinct ids
    # saturate the k=256 sketch (estimate regime), estimate stays tight
    # and no false duplicate flag
    est, covered, is_exact, part_dup = doc_store._kmv_screen(pdir)
    assert covered == 600 and not is_exact and not part_dup
    assert est is not None and abs(est - 600) / 600 < 0.25
    # idempotent: nothing left to merge
    res2 = doc_store.compact_partition(store, "2024_01_01",
                                       target_bytes=1 << 62)
    assert res2["bins"] == 0


def test_compact_partition_bins_by_target_bytes(ray_session, tmp_path):
    import glob

    store = str(tmp_path / "docs")
    pdir = os.path.join(store, "date=2024_01_02")
    _write_store_parts(pdir, 8, 200)
    one = os.path.getsize(glob.glob(os.path.join(pdir, "*.parquet"))[0])
    res = doc_store.compact_partition(store, "2024_01_02",
                                      target_bytes=int(one * 3.5))
    assert res["bins"] == 2 and res["files_after"] < res["files_before"]
    got = doc_store.read_documents(store).to_pandas()
    assert len(got) == 1600 and got["doc_id"].nunique() == 1600


def test_compact_recovery_committed_and_aborted_bins(tmp_path):
    """Journal present with one committed bin (target renamed, sources
    still on disk) and one aborted bin (tmp staged, target missing):
    recovery must delete the committed bin's sources and the aborted
    bin's tmp, keeping the aborted bin's sources."""
    import glob
    import json
    import shutil

    store = str(tmp_path / "docs")
    pdir = os.path.join(store, "date=2024_01_03")
    _write_store_parts(pdir, 4, 10)
    srcs = sorted(os.path.basename(f)
                  for f in glob.glob(os.path.join(pdir, "*.parquet")))
    # committed bin: target = copy of part-0000 (stands in for the merge)
    shutil.copy(os.path.join(pdir, srcs[0]),
                os.path.join(pdir, "compact-0-aaaa.parquet"))
    # aborted bin: tmp staged only
    shutil.copy(os.path.join(pdir, srcs[2]),
                os.path.join(pdir, "compact-1-bbbb.parquet.tmp"))
    journal = {"bins": [
        {"target": "compact-0-aaaa.parquet", "sources": srcs[:2]},
        {"target": "compact-1-bbbb.parquet", "sources": srcs[2:]},
    ]}
    with open(os.path.join(pdir, "_compact_journal.json"), "w") as f:
        json.dump(journal, f)
    doc_store.recover_compaction(pdir)
    left = sorted(os.path.basename(f)
                  for f in glob.glob(os.path.join(pdir, "*.parquet*")))
    assert left == ["compact-0-aaaa.parquet"] + srcs[2:]
    assert not os.path.exists(os.path.join(pdir, "_compact_journal.json"))


def test_crawl_job_entrypoint_runs_and_resumes(tmp_path):
    """tools/crawl_job.py is the ray-job-submit entrypoint: one JSON
    line on stdout, resumable re-run yields identical totals."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "job")
    cmd = [sys.executable, "tools/crawl_job.py",
           "--sf-dir", SF_SMALL, "--out", out, "--days", "2"]
    r1 = subprocess.run(cmd + ["--fresh"], capture_output=True, text=True,
                        check=True, cwd=os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))))
    lines = [l for l in r1.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    m1 = json.loads(lines[0])
    assert m1["totals"]["docs"] > 0 and m1["urls_seen"] > 0
    r2 = subprocess.run(cmd, capture_output=True, text=True, check=True,
                        cwd=os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))))
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2 == m1
