"""Streaming epoch overlap (run_crawl(overlap=True)) — equivalence,
crash-resume, and resume-guard tests.

The overlapped scheduler pipelines depth-1 detail chunks behind
depth-0 chunk commits (two concurrent Dataset executions, per-depth
seen-set namespaces).  Its contract: identical OUTPUT CONTENT to the
serial scheduler (chunk assignment of detail URLs legitimately
differs — serial routes by URL hash, overlap by producing link
partition — so the hive `chunk` column is excluded from comparison),
and chunk-level crash-resume that never refetches or duplicates.

Scale note (why overlap exists even though the sf0.1 single-node bench
keeps the serial path): each extra chunk pass costs a fixed ~2 s ramp
(executor start + sort sample), which at sf0.1 exceeds the CPU-valley
fill it buys; at a 10^10-URL frontier a chunk runs for minutes-hours,
the ramp is noise, and depth-1 valley-filling is pure win.
"""

from __future__ import annotations

import shutil

import pytest
import ray.data as rd

from __spider_ray.pipelines import epoch

from conftest import SF_SMALL


def _content(d: str):
    df = rd.read_parquet(d).to_pandas().drop(columns=["chunk", "epoch"],
                                             errors="ignore")
    cols = sorted(df.columns)
    return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def serial_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ovl") / "serial")
    res = epoch.run_crawl(SF_SMALL, out, resume=False, n_chunks=3,
                          fetch_concurrency=2)
    return out, res


def test_overlap_matches_serial(serial_run, tmp_path):
    s_out, s_res = serial_run
    o_out = str(tmp_path / "overlap")
    o_res = epoch.run_crawl(SF_SMALL, o_out, resume=False, n_chunks=3,
                            fetch_concurrency=2, overlap=True)
    assert o_res["totals"] == s_res["totals"]
    # the union seen set (depth-0 + depth-1 namespaces) matches the
    # serial shared set's cardinality
    assert (sum(s["count"] for s in o_res["seen"])
            == sum(s["count"] for s in s_res["seen"]))
    assert _content(f"{o_out}/fares").equals(_content(f"{s_out}/fares"))
    assert _content(f"{o_out}/records").equals(_content(f"{s_out}/records"))
    assert (rd.read_parquet(f"{o_out}/docs").count()
            == rd.read_parquet(f"{s_out}/docs").count())


def test_overlap_crash_resume(serial_run, tmp_path):
    s_out, s_res = serial_run
    out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="simulated crash"):
        epoch.run_crawl(SF_SMALL, out, resume=False, n_chunks=3,
                        fetch_concurrency=2, overlap=True,
                        _fail_after_chunk=0)
    res = epoch.run_crawl(SF_SMALL, out, resume=True, n_chunks=3,
                          fetch_concurrency=2, overlap=True)
    assert res["totals"] == s_res["totals"]
    assert _content(f"{out}/fares").equals(_content(f"{s_out}/fares"))
    assert _content(f"{out}/records").equals(_content(f"{s_out}/records"))
    # resume again: a no-op (everything committed)
    res2 = epoch.run_crawl(SF_SMALL, out, resume=True, n_chunks=3,
                           fetch_concurrency=2, overlap=True)
    assert res2["totals"] == s_res["totals"]


def test_overlap_flag_mismatch_on_resume_rejected(tmp_path):
    out = str(tmp_path / "flagged")
    with pytest.raises(RuntimeError):
        epoch.run_crawl(SF_SMALL, out, resume=False, n_chunks=2,
                        fetch_concurrency=2, overlap=True,
                        _fail_after_chunk=0)
    with pytest.raises(ValueError, match="overlap"):
        epoch.run_crawl(SF_SMALL, out, resume=True, n_chunks=2,
                        fetch_concurrency=2, overlap=False)
    shutil.rmtree(out, ignore_errors=True)
