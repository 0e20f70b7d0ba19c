"""Cluster job entrypoint — the script a user submits with

    ray job submit --working-dir . -- \
        python tools/crawl_job.py --sf-dir /data/seeds --out /data/crawl \
        --days 360 --chunks 16 --delay 2.0 --salt-hot

On a cluster the Ray Job API injects RAY_ADDRESS, so ``ray.init()``
connects to the running cluster; standalone it starts a local one.  All
sizing (seen shards, cuckoo buckets, fetch concurrency, exchange
partitions) auto-derives from the cluster's CPU count, so the SAME
command line runs at N and 4N nodes — the two-cluster-size scaling
protocol in BASELINE.md.  The run is resumable: re-submitting after a
failure continues from the last committed chunk (pass --fresh to start
over).  Prints one JSON line of final metrics on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", required=True,
                   help="input table directory (seed/customer parquet)")
    p.add_argument("--out", required=True, help="crawl output/state dir")
    p.add_argument("--days", type=int, default=None, help="crawl horizon")
    p.add_argument("--from-date", type=int, default=None)
    p.add_argument("--to-date", type=int, default=None)
    p.add_argument("--chunks", type=int, default=1,
                   help="checkpoint granularity (resume unit)")
    p.add_argument("--delay", type=float, default=0.0,
                   help="per-host politeness delay seconds (reference: 2-4)")
    p.add_argument("--burst", type=int, default=6)
    p.add_argument("--salt-hot", action="store_true",
                   help="salt hot hosts across the range partitioner")
    p.add_argument("--overlap", action="store_true",
                   help="pipeline the detail pass behind list chunks")
    p.add_argument("--api", choices=["v1", "v2"], default="v1")
    p.add_argument("--fresh", action="store_true",
                   help="wipe the output dir instead of resuming")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        # job-submit injects RAY_ADDRESS; standalone falls back to local
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __spider_ray.pipelines import epoch

    res = epoch.run_crawl(
        args.sf_dir, args.out, resume=not args.fresh,
        n_days=args.days, from_date=args.from_date, to_date=args.to_date,
        n_chunks=args.chunks, delay_s=args.delay, burst=args.burst,
        salt_hot=args.salt_hot, overlap=args.overlap, api=args.api)
    out = {"totals": res["totals"],
           "urls_seen": sum(s["count"] for s in res["seen"]),
           "last_epoch": res["last_epoch"]}
    ray.shutdown()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
