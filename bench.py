"""Benchmark harness (driver contract).

Default: run the headline crawl pipeline (seeds → frontier expansion →
URL dedup → fetch → parse → span docs → parquet sink) over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address='local', num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
print ONE JSON line.

``--scaling``: run the same job in two fresh processes at 8 and 32 CPUs
on the same input and report both throughputs + scaling efficiency
(the sandbox evidence for the N→4N cluster criterion, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging
    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __spider_ray.pipelines import crawl

    out_dir = "/tmp/bench_out/docs"
    shutil.rmtree("/tmp/bench_out", ignore_errors=True)

    # warm the page cache so we measure compute+shuffle, not first disk read
    crawl.frontier(SF_DIR).count()

    queries: dict[str, float] = {}

    t0 = time.perf_counter()
    fr = crawl.frontier(SF_DIR)
    n_urls = fr.count()
    queries["frontier"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    docs = crawl.documents(SF_DIR)
    docs.write_parquet(out_dir)
    queries["fetch_parse_write"] = time.perf_counter() - t1

    t2 = time.perf_counter()
    n_spans = crawl.exploded_spans(SF_DIR).count()
    queries["span_count"] = time.perf_counter() - t2

    total = time.perf_counter() - t0
    result = {
        "metric": "crawl fetch+parse pipeline wall time (sf frontier, dedup, fetch, parse, span docs)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "urls": n_urls,
        "spans": n_spans,
        "urls_per_sec": round(n_urls / queries["fetch_parse_write"], 1),
        "spans_per_sec": round(n_spans / queries["fetch_parse_write"], 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])
    lo, hi = run(8), run(32)
    rate_lo = lo["urls"] / lo["queries"]["fetch_parse_write"]
    rate_hi = hi["urls"] / hi["queries"]["fetch_parse_write"]
    eff = (rate_hi / rate_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency (urls/sec, 8 vs 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "urls_per_sec_8": round(rate_lo, 1), "urls_per_sec_32": round(rate_hi, 1),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
