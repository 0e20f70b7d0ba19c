"""The streaming epoch loop — the engine's main crawl driver.

Per epoch (north_rule's "priority frontier as repeated groupby(host)/
aggregate/sort shuffles"):

1. depth-0 frontier → ``sort(sort_key)`` — ONE all-to-all shuffle that
   (a) co-locates each host's URLs (politeness locality: all URLs of a
   host meet one token bucket in few tasks) and (b) orders by priority
   = reference crawl order (§2.6 O4); depth ≥1 skips the sort (links
   inherit host locality from the sorted depth-0 pass and detail fetch
   has no ordering semantics);
2. URL-seen semi-join: ``seen_filter_batch`` stateless tasks — in-batch
   ``np.unique`` first-occurrence + one batched ``check_and_add``
   round-trip to the sharded cuckoo actors; FUSES with the downstream
   fetch→parse chain (no per-pass actor-pool spinup).  The fused pass
   runs with ``max_retries=0``: the test-and-set is not idempotent
   under task retry, so failures fail the pass and recover through the
   chunk commit/resume path;
3. robots mask via the HostPolicyActor TTL cache (reference semantics:
   allow-all, ``settings.py:21``; a ``robots_fetcher`` turns on deny);
4. fetch: stateless tasks with per-host sub-batch politeness pacing
   (``stages/fetch.paced_fetch``);
5. parse: depth-0 pages → flight records (v1 ``fltitem`` or, with
   ``api='v2'``, the double-encoded listCards format) + side-written
   span docs and detail links; depth-1 pages → cabin rows → fares;
6. commit: parquet partitions + next frontier + seen-shard snapshots +
   store-committed docs (count-verified manifest) + metrics marker
   (checkpoint.py).  Resume skips complete epochs and chunks.

Every intermediate an epoch needs twice is written once and re-read
(records), never ``materialize()``d in the object store — at 100 TB
the written partition IS the checkpoint artifact.

Skew note: the 北京(BJS) host is the deliberate hot key.  Fetch blocks
are host-sorted, so a hot host's URLs span several blocks — CPU load
balances across tasks while the *rate* stays globally capped because
all grants for that host come from one HostPolicyActor shard.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data

from .. import checkpoint as ckpt
from ..state.politeness import HostPolicyClient
from ..state.url_seen import UrlSeenSet
from ..stages import detail, expand, fetch, parse, spans


def seen_filter_batch(batch: pa.Table, seen: UrlSeenSet) -> pa.Table:
    """Task-flavor seen-filter: in-batch first-occurrence dedup on the
    vectorized URL hashes, then ONE batched test-and-set round-trip to
    the authoritative cuckoo shards for the batch's unique hashes.

    Runs as stateless tasks so it FUSES with the downstream fetch→parse
    chain into one task operator — no actor pool to spin up per pass
    (~2-4 s of serial startup per epoch), no extra stage boundary, no
    intermediate blocks through the object store.  Measured: the prior
    actor-pool flavor's worker-local recent-set saved shard calls only
    for intra-run repeats, which the in-batch np.unique already
    collapses; cross-batch repeats are exactly what the shards resolve.

    Exactness note (unchanged from round 1): any local pre-screen must
    be exact — a bloom pre-check would silently drop its false
    positives without consulting the shards, losing ~fp-rate of a
    10^10-URL frontier.  np.unique is exact."""
    if batch.num_rows == 0:
        return batch
    from ..functions.hashing import hash64
    urls = batch["url"].combine_chunks()
    h = hash64(urls)
    # first occurrence of each hash within the batch (np.unique returns
    # the smallest index per value)
    _, first_idx = np.unique(h, return_index=True)
    new = np.zeros(len(h), dtype=bool)
    new[first_idx] = seen.check_and_add_hashes(h[first_idx])
    return batch.filter(pa.array(new))


class SeenFilterWorker:
    """Actor-pool wrapper kept for API compatibility / stateful
    extensions; the epoch loop uses the fused task flavor
    (``seen_filter_batch``) for throughput."""

    def __init__(self, seen: UrlSeenSet):
        self.seen = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        return seen_filter_batch(batch, self.seen)


def _robots_filter(batch: pa.Table, policy: HostPolicyClient) -> pa.Table:
    mask = policy.robots_mask(batch["host"].combine_chunks())
    return batch.filter(pa.array(mask))


def salt_hot_hosts(frontier: "ray.data.Dataset", hot_fraction: float = 0.05,
                   salt_bits: int = 3) -> "ray.data.Dataset":
    """Skew mitigation (SURVEY.md §7.3): a hot host's URLs occupy one
    contiguous ``sort_key`` range, so its fetch/parse CPU lands on few
    tasks.  Hosts holding more than ``hot_fraction`` of the frontier get
    ``2^salt_bits`` sub-ranges — salt = hash(url) bits spliced ABOVE the
    priority bits, so each salted sub-range keeps crawl-order locality
    while the host's work spreads across the range partitioner.

    Politeness stays correct under salting: rate grants come from the
    ONE HostPolicyActor bucket for that host regardless of which salted
    partition issues the fetch (the actor is the single source of
    truth; salt only balances CPU).

    Cost: one aggregate over host counts (rows = distinct hosts) that
    STAYS distributed — only the ≤1/hot_fraction hosts that can exceed
    the threshold (pigeonhole bound) plus two scalars ever reach the
    driver, so an open-web crawl with millions of hosts doesn't
    materialize its host table here (VERDICT r2 minor #5).
    """
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.hashing import hash64
    agg = frontier.groupby("host").aggregate(Count(), Max("priority")) \
                  .materialize()        # consumed 3×; rows = distinct hosts
    tot_row = agg.aggregate(Sum("count()", alias_name="total"),
                            Max("max(priority)", alias_name="max_prio"))
    total = int(tot_row["total"])
    thresh = total * hot_fraction

    def _hot_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.select(["host"]).filter(
            pc.greater(t["count()"], pa.scalar(thresh)))
    hot_rows = agg.map_batches(_hot_only, batch_format="pyarrow").take_all()
    hot = {r["host"] for r in hot_rows}   # ≤ 1/hot_fraction rows
    if not hot:
        return frontier
    hot_arr = pa.array(sorted(hot), pa.string())
    # The salt must sit strictly ABOVE every priority bit or carries
    # corrupt it (priority = seed_index*N_DAYS + day exceeds any fixed
    # bit position at large scale factors) — so measure the actual
    # priority range (free: same aggregate as the hot-host counts) and
    # rebuild the key as host_hash | salt | priority with exact widths.
    max_prio = float(tot_row["max_prio"])
    prio_bits = max(1, int(np.ceil(np.log2(max_prio + 2))))
    if prio_bits + salt_bits > 52:        # keep within int64 with host bits
        salt_bits = max(1, 52 - prio_bits)
    host_shift = np.uint64(prio_bits + salt_bits)
    host_keep = np.uint64(63) - host_shift   # top host-hash bits that fit

    def salt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_hot = np.asarray(
            pc.is_in(t["host"], value_set=hot_arr).to_numpy(zero_copy_only=False),
            dtype=bool)
        s = (hash64(t["url"].combine_chunks(), seed=13)
             % np.uint64(1 << salt_bits)).astype(np.int64)
        host_part = (hash64(t["host"].combine_chunks())
                     >> (np.uint64(64) - host_keep)).astype(np.int64)
        prio = t["priority"].to_numpy().astype(np.int64)
        salted = (host_part << np.int64(host_shift)) \
            + np.where(is_hot, s, 0) * np.int64(1 << prio_bits) + prio
        return t.set_column(t.schema.get_field_index("sort_key"), "sort_key",
                            pa.array(salted))
    return frontier.map_batches(salt, batch_format="pyarrow")


# the only columns the depth-1 pass reads from the link frontier
_DETAIL_COLS = ["url", "host", "plane_no", "off_date"]


def _e1_block_mult() -> int:
    """Extra read-block multiplier for the depth-1 pass (vs the 2×-CPU
    default).  The detail chain has NO shuffle downstream, so finer
    blocks cost only task dispatch while turning the 2-wave task
    schedule into 4-8 waves — the straggler tail shrinks
    proportionally.  (The depth-0 pass cannot use this: its sort's
    intermediate object count grows quadratically with block count —
    measured worse at 4×.)

    CPU-proportional, measured both ways on the 120-day sf0.1 job:
    at 32 CPUs ×4 wins (16.4 s vs 17.2 s, and 34 s vs 44 s cold);
    at 8 CPUs ×4 LOSES (62-65 s vs 51-59 s) — with few executors the
    extra dispatch serializes into the critical path instead of
    shaving a tail.  So: ×1 at ≤8 CPUs, ×4 at ≥32, capped (block
    count is bounded by data size on a real cluster anyway)."""
    ov = os.environ.get("GRAFT_E1_BLOCK_MULT")
    if ov:
        return max(1, int(ov))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, min(4, cpus // 8))


def _detail_fetch(batch: pa.Table, policy: HostPolicyClient | None) -> pa.Table:
    # same per-host sub-batch pacing as the list fetch (stages/fetch.py)
    return fetch.paced_fetch(batch, policy, detail.fetch_detail_batch)


def _count_parquet(d: str) -> int:
    """Row count of a parquet dir, 0 for empty/missing dirs (a
    zero-row ``write_parquet`` creates no files, and Ray's read raises
    on an empty directory)."""
    import glob

    import pyarrow.parquet as pq
    return sum(pq.read_metadata(f).num_rows
               for f in glob.glob(os.path.join(d, "**/*.parquet"),
                                  recursive=True))


def _side_write(records: pa.Table, docs_dir: str, links_dir: str,
                links: bool = True, date: str | None = None) -> pa.Table:
    """Single-pass tee: derive span docs + detail links from a parse
    output batch and write them as parquet parts RIGHT HERE, then pass
    the records through to the main write_parquet sink.  Page rows are
    contiguous in parse output, so doc assembly needs no shuffle at all.
    Part filenames derive from the batch's first doc_id → a retried
    task overwrites its own file (idempotent), never duplicates.
    ``links=False`` for API variants without a detail hop (v2).
    ``date`` adds the daily partition layer (``date=YYYY_MM_DD/``) —
    the reference's table-per-day layout (``ylutils/ylutil.py:13-15``
    names a MySQL table per crawl day)."""
    import pyarrow.parquet as pq
    if records.num_rows == 0:
        return records
    stem = records["doc_id"][0].as_py()
    docs = spans.records_to_docs(records)
    # embed a KMV distinct-doc_id sketch in the part's footer metadata:
    # the commit merges footers only (no data re-read) to screen for
    # duplicate/split docs at near-zero cost; the exact groupby audit
    # runs only when the sketch flags (or verify_unique=True forces it)
    from ..functions.hashing import hash64, kmv_sketch
    sk = kmv_sketch(hash64(docs["doc_id"].combine_chunks()))
    docs = docs.replace_schema_metadata(
        {b"kmv_doc_id": sk.tobytes(), b"n_docs": str(docs.num_rows).encode()})
    part_dir = docs_dir if date is None \
        else os.path.join(docs_dir, f"date={date}")
    os.makedirs(part_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(part_dir, f"{stem}.parquet"))
    if links:
        link_rows = detail.expand_detail_links(records)
        pq.write_table(link_rows, os.path.join(links_dir, f"{stem}.parquet"))
    return records


def _auto_seen_shards(total_cpus: int) -> int:
    """Seen-shard count scales with the cluster (power of two for the
    ``h >> 32 % n`` routing): 4 shards serialize all membership
    traffic through 0.4 CPUs — fine at 8 CPUs, a fixed choke point at
    32+ where the fused fetch chain can outrun them.  Each shard costs
    only num_cpus=0.1, so scaling the pool is nearly free."""
    n = 4
    while n * 4 < total_cpus:
        n <<= 1
    return n


def _auto_seen_buckets(sf_dir: str, days: int, n_shards: int,
                       bucket_size: int = 4) -> int:
    """Size each cuckoo shard for ≤ ~1/3 load at the EXPECTED key
    volume.  Above ~50% load the vectorized append path starts
    overflowing into the per-item eviction walk and inserts go
    superlinear — measured on the 360-day sf0.1 job: 13.9 M keys in
    the old fixed 16.8 M slots (83% load) blew the 32-CPU epoch passes
    from 20 s to 116 s.  The estimate is seeds × days (depth-0) × 3
    (detail links run ≈ 1.6× depth-0; 2× margin) × 3 slots per key,
    floored at the old 2^20 default so small crawls are unchanged.
    At a 10^10-URL frontier the same rule just says: provision the
    shard fleet for the frontier you plan to crawl (~5 B/key)."""
    import pyarrow.parquet as pq
    floor = 1 << 20
    try:
        n_seeds = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    except Exception:
        return floor
    per_shard = (n_seeds * days * 3 * 3) // (bucket_size * n_shards)
    n = floor
    while n < per_shard:
        n <<= 1
    return n


def run_crawl(
    sf_dir: str,
    out_dir: str,
    *,
    n_seen_shards: int | None = None,
    seen_buckets: int | None = None,
    delay_s: float = 0.0,
    burst: int = 6,
    fetch_concurrency: int | None = None,
    # 16k: each fused-chain batch pays ~3 blocking actor round-trips
    # (seen shards, robots, politeness grant); quadrupling the batch
    # quarters the stall count per task — measured 16.4 s vs 18.8 s
    # median at 32 CPUs on the 120-day sf0.1 job, neutral at 8 CPUs
    # (the narrow leg is compute-bound, not stall-bound)
    fetch_batch_size: int = 16384,
    resume: bool = True,
    max_depth: int = 1,
    n_days: int | None = None,
    from_date: int | None = None,
    to_date: int | None = None,
    salt_hot: bool = False,
    n_chunks: int = 1,
    robots_fetcher=None,
    verify_unique: bool = False,
    api: str = "v1",
    crawl_date: str | None = None,
    overlap: bool = False,
    _fail_after_chunk: int | None = None,
) -> dict:
    """Run the full crawl; returns the final metrics dict.

    Resumable at two granularities: completed EPOCHS are skipped
    entirely; within an epoch, the frontier is hash-partitioned into
    ``n_chunks`` ranges, each committed (outputs + seen-filter
    snapshot + metrics marker) independently — a killed job resumes
    after its last complete chunk and re-fetches at most one in-flight
    chunk.  ``n_chunks=1`` keeps the single-pass fast path.

    ``overlap=True`` (v1, n_chunks>1): STREAMING EPOCH OVERLAP — the
    depth-1 detail pass consumes each chunk's link partition as soon as
    that depth-0 chunk commits, instead of waiting for the full epoch
    barrier.  The two depths run as concurrent Dataset executions (a
    one-worker thread drains depth-1 serially, pipelined behind
    depth-0), filling the CPU valleys each phase leaves (sort barrier,
    ramp, straggler tail).  Crash-consistency is preserved by giving
    each depth its OWN seen-set shard namespace: the URL spaces are
    disjoint (/flightlist/ vs /detail/), so dedup semantics and the
    union seen set are unchanged, while a depth-0 chunk snapshot can no
    longer capture a concurrent depth-1 chunk's partial insertions
    (which a resume would otherwise silently skip).  Chunk markers are
    per (epoch, chunk) exactly as in the serial path; depth-1 chunk i
    is only ever launched after depth-0 chunk i's commit, so every
    committed e1 chunk's dependency is itself committed.

    ``_fail_after_chunk`` is a test hook simulating a crash right after
    that chunk's commit (in overlap mode: after the DEPTH-1 chunk's
    commit — the trailing pass, so the crash leaves the interleaved
    marker state overlap resume must handle).  Resuming requires the
    same ``n_chunks`` (the chunk hash-partitioning must line up) and
    the same ``overlap`` flag (the seen-snapshot namespaces differ)."""
    # api="v2" crawls the listCards format end-to-end through the same
    # state machinery (the reference's ctripSpider02 is a sibling spider
    # over the same seeds); the v2 API has no detail hop, so the crawl
    # is single-epoch.
    assert api in ("v1", "v2")
    # daily doc partition (ylutil.py:13-15 table-per-day analog): the
    # synthetic web's fixed crawl timestamp by default; injectable so
    # multi-day stores and cross-day resume are testable
    if crawl_date is None:
        from .. import synth as _synth
        crawl_date = _synth.CREATE_TIME_STR[:10].replace("-", "_")
    if api == "v2":
        max_depth = 0
    if max_depth > 1:
        raise ValueError(
            "the crawl model is two-hop (list pages + detail API); "
            "max_depth > 1 has no depth-2 frontier to crawl")
    if not resume:
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # resume guard: an output dir is bound to one API variant AND one
    # seen-shard layout — mixing APIs would interleave incompatible
    # record schemas, and resuming with a different n_seen_shards would
    # mis-route the restored snapshots (h>>32 % n changes), silently
    # re-fetching URLs the old shards already claimed
    import json as _json
    import ray as _ray
    total_cpus = int(_ray.cluster_resources().get("CPU", 8))
    overlap = bool(overlap and api == "v1" and max_depth >= 1 and n_chunks > 1)
    run_marker = os.path.join(out_dir, "api.json")
    if os.path.exists(run_marker):
        prev = _json.load(open(run_marker))
        if prev.get("api") != api:
            raise ValueError(
                f"output dir {out_dir} was crawled with api={prev.get('api')!r}; "
                f"resume with the same api or pass resume=False")
        if n_seen_shards is None:
            # auto mode adopts the dir's committed layout — snapshots
            # are routed by h>>32 % n, so the count must not drift
            n_seen_shards = prev.get("n_seen_shards") or \
                _auto_seen_shards(total_cpus)
        elif prev.get("n_seen_shards") not in (None, n_seen_shards):
            raise ValueError(
                f"output dir {out_dir} was crawled with n_seen_shards="
                f"{prev.get('n_seen_shards')}; resume with the same value "
                f"or pass resume=False")
        # a marker without an 'overlap' key was written by the serial
        # scheduler (its chunk markers denote url-hash partitions, not
        # producer-chunk link partitions) — treat missing as False so a
        # serial dir can never be resumed under the overlap scheduler
        if bool(prev.get("overlap", False)) != bool(overlap):
            raise ValueError(
                f"output dir {out_dir} was crawled with overlap="
                f"{prev.get('overlap', False)}; the seen-snapshot namespaces "
                f"differ — resume with the same flag or pass resume=False")
    if n_seen_shards is None:
        n_seen_shards = _auto_seen_shards(total_cpus)
    if seen_buckets is None:
        from .. import synth as _synth_sz
        days = n_days if n_days is not None else (
            (to_date - from_date + 1)
            if (from_date is not None and to_date is not None)
            else _synth_sz.N_DAYS)
        seen_buckets = _auto_seen_buckets(sf_dir, days, n_seen_shards)
    # priority width of the packed sort key — must MATCH what
    # frontier_dataset packs (same footer-stat derivation) so the
    # analytic range exchange groups on exactly the host/salt field
    from .. import synth as _synth_pb
    _n_eff_days = (len(expand.day_window(from_date, to_date))
                   if from_date is not None and to_date is not None
                   else (n_days or _synth_pb.N_DAYS))
    _sort_low_bits = expand.prio_bits_for(sf_dir, _n_eff_days)
    if not os.path.exists(run_marker):
        with open(run_marker, "w") as f:
            _json.dump({"api": api, "n_seen_shards": n_seen_shards,
                        "overlap": overlap}, f)

    # size the actor pools to the cluster: the chained pools (seen →
    # fetch) plus state actors must leave CPUs free for the read/sort/
    # write TASKS, or the streaming executor starves (a pool that
    # reserves every CPU deadlocks the pipeline).  Budget ≈ half the
    # CPUs to pools at 0.5 each.
    if fetch_concurrency is None:
        fetch_concurrency = max(1, total_cpus // 4)

    seen = UrlSeenSet(n_shards=n_seen_shards, n_buckets=seen_buckets)
    # robots_fetcher=None reproduces the reference (allow-all,
    # settings.py:21); a callable host→bool turns on the deny path
    # through the same TTL-cached robots actors
    policy = HostPolicyClient(n_actors=2, delay_s=delay_s, burst=burst,
                              robots_fetcher=robots_fetcher)

    start_epoch = ckpt.last_complete_epoch(out_dir) + 1 if resume else 0
    if overlap:
        # the overlapped scheduler does its own per-depth restores
        # (seen0 from epoch-0/chunk-0 markers, seen1 from epoch-1/
        # chunk-1); restoring epoch-(start-1) here would load seen1's
        # shard snapshots into seen0 and misattribute its stats
        seen.reset_all()
    elif start_epoch > 0:
        seen.restore_all(ckpt.load_seen_snapshots(out_dir, start_epoch - 1,
                                                  n_seen_shards))
    else:
        seen.reset_all()

    totals: dict[str, int] = {"records": 0, "docs": 0, "fares": 0}
    if start_epoch > 0:
        totals.update(ckpt.read_marker(out_dir, start_epoch - 1).get("totals", totals))

    import time as _time
    _dbg = os.environ.get("GRAFT_DEBUG_TIMING")

    def _t(label: str, t0: float) -> float:
        if _dbg:
            print(f"[epoch-timing] {label}: {_time.perf_counter() - t0:.2f}s",
                  flush=True)
        return _time.perf_counter()

    def _chunk_filter(t: pa.Table, chunk: int) -> pa.Table:
        from ..functions.hashing import hash64
        c = ((hash64(t["url"].combine_chunks(), seed=29) >> np.uint64(8))
             % np.uint64(n_chunks)).astype(np.int64)
        return t.filter(pa.array(c == chunk))

    from .. import synth
    if api == "v2":
        url_path = "listcards"
        status_fn, body_fn = synth.page_status_v2, synth.page_body_v2

        def parse_fn(t: pa.Table) -> pa.Table:
            out = parse.parse_v2_batch(t)
            # v2 cards carry no captcha artifacts — null media_ref so the
            # span-doc assembler emits text-only docs
            return out.append_column("media_ref",
                                     pa.nulls(out.num_rows, pa.string()))
    else:
        url_path = "flightlist"
        status_fn = body_fn = None
        parse_fn = parse.parse_batch

    next_dir = os.path.join(out_dir, "frontier/epoch=1")
    _no_retry = {"max_retries": 0, "retry_exceptions": False}

    # ---------- per-chunk processors (shared by both schedulers) ----------
    def _fresh(frontier, seen_set, *, sort: bool):
        """1. priority shuffle (numeric key: host-hash high bits ⊕
        priority low bits)  2. seen semi-join  3. robots mask.
        The sort runs at depth 0 only: there it IS the crawl-order
        contract (§2.6 O4) and the host-locality shuffle.  Depth-1
        links inherit that locality for free — each link part is one
        parse batch of a host-sorted pass — and detail fetch has no
        ordering semantics, so re-sorting would be a pure all-to-all
        tax (NOTES_r1 #3, the top scaling cost).
        NO task-level retries on the fused pass: the seen filter's
        test-and-set is not idempotent (a retried task would see its
        own first attempt's hashes as "seen" and emit nothing,
        silently losing the batch).  A task failure must fail the
        PASS; recovery is the chunk commit/resume path, which restores
        the seen snapshot of the last committed chunk and re-runs the
        in-flight chunk exactly.
        The priority shuffle runs through the ANALYTIC range exchange
        (stages/exchange.py) rather than ds.sort(): the sampled sort
        measured 5× row skew across its reduce blocks on the sf0.1
        frontier, which turned into straggler waves in this fused chain
        (the depth-0 pass's dominant scaling leak at 32 CPUs).  The
        exchange computes exact per-host-group boundaries from the
        packed key's structure — same global order, near-perfect
        balance, one less barrier.  GRAFT_SORT_IMPL=ray restores the
        sampled sort for A/B."""
        if sort:
            if os.environ.get("GRAFT_SORT_IMPL", "analytic") == "ray":
                ordered = frontier.sort("sort_key")
            else:
                from ..stages.exchange import analytic_range_exchange
                from ..stages.expand import _default_blocks
                ovp = os.environ.get("GRAFT_SORT_PARTS")
                ordered = analytic_range_exchange(
                    frontier, "sort_key", _sort_low_bits,
                    # 3 task waves downstream: balanced parts make the
                    # waves clean, and the third wave shrinks the
                    # straggler tail (measured vs 2×CPU: 16.9 s vs
                    # 17.6 s median at 32 CPUs on the 120-day job)
                    n_parts=int(ovp) if ovp else total_cpus * 3)
        else:
            ordered = frontier
        return (
            ordered
            .map_batches(lambda b: seen_filter_batch(b, seen_set),
                         batch_format="pyarrow",
                         batch_size=fetch_batch_size,
                         **_no_retry)
            .map_batches(lambda b: _robots_filter(b, policy),
                         batch_format="pyarrow",
                         **_no_retry)
        )

    def _commit(epoch: int, chunk: int, seen_set, metrics: dict,
                t0: float) -> None:
        # shard actors write their own snapshot files in parallel
        # (driver-serial snapshot pull + savez was ~2 s/commit)
        state_dir = seen_set.snapshot_all_to(
            ckpt.chunk_state_dir(out_dir, epoch, chunk))
        t0 = _t(f"e{epoch}.c{chunk} snapshot", t0)
        ckpt.commit_chunk(out_dir, epoch, chunk, metrics,
                          state_dir=state_dir)
        _t(f"e{epoch}.c{chunk} commit", t0)

    def _process_chunk0(chunk: int, frontier, seen_set, totals_d: dict) -> None:
        t0 = _time.perf_counter()
        records_dir = os.path.join(out_dir, f"records/epoch=0/chunk={chunk}")
        docs_dir = os.path.join(out_dir, f"docs/epoch=0/chunk={chunk}")
        # links staged per-chunk: a re-run of an uncommitted chunk
        # clears ITS dir wholesale, so shifted batch boundaries can
        # never leave stale LINK parts behind
        links_dir = os.path.join(next_dir, f"chunk={chunk}")
        for d in (records_dir, docs_dir, links_dir):  # clear partial CHUNK
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
        # ONE streaming pass: fetch → parse → side-write docs + links →
        # records sink.  No mid-pipeline materialize.
        (
            _fresh(frontier, seen_set, sort=True)
            .map_batches(
                lambda b: fetch.fetch_with_policy(
                    b, policy, status_fn=status_fn, body_fn=body_fn),
                batch_format="pyarrow", batch_size=fetch_batch_size,
                **_no_retry)
            .map_batches(parse_fn, batch_format="pyarrow", **_no_retry)
            # side_write keeps the DEFAULT batch size deliberately: in a
            # fused chain it receives the task's whole concatenated
            # parse output (measured), so page rows stay contiguous and
            # complete — an explicit batch_size would slice mid-page and
            # split docs across parts (duplicate doc_ids)
            .map_batches(lambda t: _side_write(t, docs_dir, links_dir,
                                               links=api == "v1",
                                               date=crawl_date),
                         batch_format="pyarrow", **_no_retry)
            .write_parquet(records_dir)
        )
        t0 = _t(f"e0.c{chunk} pass", t0)
        n_rec = _count_parquet(records_dir)      # footer metadata only
        # store-commit the staged doc parts: Lance when present,
        # count-verify (A3) + distinct-doc_id idempotence check,
        # manifest written (sources/doc_store.py)
        from ..sources import doc_store
        doc_commit = doc_store.commit_staged_documents(
            docs_dir, unique_key="doc_id" if verify_unique else None)
        t0 = _t(f"e0.c{chunk} doc-commit", t0)
        n_docs = doc_commit["rows"]
        totals_d["records"] += n_rec
        totals_d["docs"] += n_docs
        # the chunk marker below is the commit manifest: rows +
        # lineage + filter snapshot (A3 invariant carrier)
        metrics = {"records": n_rec, "docs": n_docs,
                   "doc_commit": doc_commit, "totals": dict(totals_d)}
        _commit(0, chunk, seen_set, metrics, t0)

    def _process_chunk1(epoch: int, chunk: int, frontier, seen_set,
                        totals_d: dict) -> None:
        t0 = _time.perf_counter()
        fares_dir = os.path.join(out_dir, f"fares/epoch={epoch}/chunk={chunk}")
        shutil.rmtree(fares_dir, ignore_errors=True)
        os.makedirs(fares_dir, exist_ok=True)   # zero-fare chunks commit empty
        if frontier is not None:
            (
                _fresh(frontier, seen_set, sort=False)
                .map_batches(lambda b: _detail_fetch(b, policy),
                             batch_format="pyarrow",
                             batch_size=fetch_batch_size, **_no_retry)
                .map_batches(detail.parse_cabins_batch,
                             batch_format="pyarrow", **_no_retry)
                .map_batches(detail.lowest_fare_batch,
                             batch_format="pyarrow", **_no_retry)
                .write_parquet(fares_dir)
            )
        t0 = _t(f"e{epoch}.c{chunk} pass", t0)
        n_fares = _count_parquet(fares_dir)
        totals_d["fares"] += n_fares
        metrics = {"fares": n_fares, "totals": dict(totals_d)}
        _commit(epoch, chunk, seen_set, metrics, t0)

    def _commit_epoch(epoch: int, seen_set, extra_seen_stats=None) -> None:
        stats = seen_set.stats() + (extra_seen_stats or [])
        epoch_metrics = {"totals": dict(totals), "seen_stats": stats,
                         "policy_stats": policy.stats()}
        # the seen set hasn't changed since the final chunk's commit —
        # hardlink that snapshot instead of re-pulling every shard
        t0 = _time.perf_counter()
        ckpt.commit_epoch(out_dir, epoch, epoch_metrics,
                          reuse_state_dir=ckpt.chunk_state_dir(
                              out_dir, epoch, n_chunks - 1))
        ckpt.drop_chunk_state(out_dir, epoch)
        _t(f"e{epoch} epoch-commit", t0)

    def _depth0_frontier():
        # from_date/to_date select an absolute day-offset window
        # (expand.day_window, ctripSpider.py:148-153); n_days is the
        # rolling-horizon default.  Expand with FEWER, coarser blocks
        # than the 2×-CPU chain default when the analytic exchange
        # follows: the exchange re-fans the frontier into balanced
        # range parts anyway, so fine expand tasks only add dispatch
        # latency to the pass's startup valley (64 × ~45 ms tasks cost
        # ~2 s of wall at 32 CPUs — scheduling, not compute).
        exp_blocks = None
        if os.environ.get("GRAFT_SORT_IMPL", "analytic") != "ray":
            ov = os.environ.get("GRAFT_EXPAND_BLOCKS")
            exp_blocks = int(ov) if ov else max(8, total_cpus // 2)
        f = expand.frontier_dataset(sf_dir, n_days or synth.N_DAYS,
                                    path=url_path,
                                    from_date=from_date, to_date=to_date,
                                    n_blocks=exp_blocks)
        if salt_hot:
            # sort_key is only consumed by the depth-0 sort; salting
            # the link frontier would be a wasted driver-side aggregate
            # + rekey pass (the depth-1 sort is skipped)
            f = salt_hot_hosts(f)
        if n_chunks > 1:
            # pin the expanded frontier in the object store once: the
            # per-chunk filters otherwise re-run the whole seed read +
            # expansion lazily for EVERY chunk (n_chunks× the compute);
            # blocks spill to disk under pressure, so this stays safe
            # at scale
            f = f.materialize()
        return f

    if overlap:
        return _run_overlapped(
            out_dir=out_dir, n_chunks=n_chunks, n_seen_shards=n_seen_shards,
            seen_buckets=seen_buckets, seen0=seen, policy=policy,
            totals=totals, resume=resume,
            depth0_frontier=_depth0_frontier, chunk_filter=_chunk_filter,
            process_chunk0=_process_chunk0, process_chunk1=_process_chunk1,
            commit_epoch=_commit_epoch, timing=_t,
            fail_after_chunk=_fail_after_chunk)

    for epoch in range(start_epoch, max_depth + 1):
        if epoch == 0:
            frontier_full = _depth0_frontier()
        else:
            fdir = os.path.join(out_dir, f"frontier/epoch={epoch}")
            if not os.path.exists(fdir):
                break
            from ..stages.expand import _default_blocks
            # prune at the read: the detail pass touches only these four
            # columns (url for seen/fetch, host for robots/pacing,
            # plane_no/off_date for the fare key) — seed provenance and
            # sort_key stay on disk.  Explicit columns also excludes the
            # hive-partition `chunk` column the recursive read would add.
            frontier_full = ray.data.read_parquet(
                fdir, columns=_DETAIL_COLS,
                override_num_blocks=_default_blocks() * _e1_block_mult())
            if n_chunks > 1:
                frontier_full = frontier_full.materialize()

        done = set(ckpt.complete_chunks(out_dir, epoch)) if resume else set()
        if done:
            # mid-epoch resume: restore the seen set as of the last
            # complete chunk and carry its running totals forward
            last = max(done)
            seen.restore_all(ckpt.load_chunk_snapshots(out_dir, epoch, last,
                                                       n_seen_shards))
            totals.update(ckpt.read_chunk_marker(out_dir, epoch, last)
                          .get("totals", totals))

        if epoch == 0 and not done:
            shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)

        for chunk in range(n_chunks):
            if chunk in done:
                continue
            frontier = frontier_full if n_chunks == 1 else \
                frontier_full.map_batches(
                    lambda t, c=chunk: _chunk_filter(t, c),
                    batch_format="pyarrow")
            if epoch == 0:
                _process_chunk0(chunk, frontier, seen, totals)
            else:
                _process_chunk1(epoch, chunk, frontier, seen, totals)
            if _fail_after_chunk is not None and chunk >= _fail_after_chunk:
                raise RuntimeError(
                    f"simulated crash after epoch {epoch} chunk {chunk}")

        _commit_epoch(epoch, seen)

    return {"last_epoch": ckpt.last_complete_epoch(out_dir), "totals": totals,
            "seen": seen.stats(), "policy": policy.stats()}


def _run_overlapped(*, out_dir: str, n_chunks: int, n_seen_shards: int,
                    seen_buckets: int, seen0: UrlSeenSet, policy,
                    totals: dict, resume: bool,
                    depth0_frontier, chunk_filter, process_chunk0,
                    process_chunk1, commit_epoch, timing,
                    fail_after_chunk: int | None) -> dict:
    """The streaming-epoch-overlap scheduler (see run_crawl docstring).

    Depth-0 chunks run in the caller thread; a ONE-worker thread drains
    depth-1 chunks serially in commit order, each launched only after
    its depth-0 producer chunk committed.  Two concurrent Dataset
    executions share the cluster — depth-1 tasks fill the CPU valleys
    of depth-0's sort barrier / ramp / straggler tail (measured: the
    depth-0 pass averages ~1/3 CPU utilization at 32 CPUs).

    Crash-consistency: each depth owns its seen-set shard namespace
    (``seen0`` = list URLs, ``seen1`` = detail URLs — disjoint URL
    spaces, so the union seen set and all dedup semantics match the
    serial path).  A depth-0 chunk snapshot therefore never captures a
    concurrent depth-1 chunk's partial insertions; resume restores each
    depth from ITS last committed chunk independently.  Totals keys are
    also per-depth (records/docs vs fares): resume reads each key group
    only from its own depth's marker, so a merged snapshot written
    mid-overlap can't leak a torn value across depths.
    """
    import concurrent.futures as _cf
    import time as _time

    import ray.data  # noqa: F401  (thread uses Dataset ops)

    seen1 = UrlSeenSet(n_shards=n_seen_shards, n_buckets=seen_buckets)

    if resume and ckpt.last_complete_epoch(out_dir) >= 1:
        stored = ckpt.read_marker(out_dir, 1).get("totals", {})
        totals.update(stored)
        # per-namespace restore: epoch-0 snapshots are seen0's shards,
        # epoch-1 are seen1's — so the reported seen stats attribute
        # each depth's counts to the right namespace
        seen0.restore_all(ckpt.load_seen_snapshots(out_dir, 0, n_seen_shards))
        seen1.restore_all(ckpt.load_seen_snapshots(out_dir, 1, n_seen_shards))
        return {"last_epoch": 1, "totals": totals,
                "seen": seen0.stats() + seen1.stats(),
                "policy": policy.stats()}

    done0 = set(ckpt.complete_chunks(out_dir, 0)) if resume else set()
    done1 = set(ckpt.complete_chunks(out_dir, 1)) if resume else set()
    epoch0_done = resume and ckpt.last_complete_epoch(out_dir) >= 0

    # per-depth restores: each depth's seen shards and totals keys come
    # from ITS OWN last committed marker only
    if epoch0_done:
        seen0.restore_all(ckpt.load_seen_snapshots(out_dir, 0, n_seen_shards))
        m = ckpt.read_marker(out_dir, 0).get("totals", {})
        totals["records"] = m.get("records", 0)
        totals["docs"] = m.get("docs", 0)
        done0 = set(range(n_chunks))
    elif done0:
        last0 = max(done0)
        seen0.restore_all(ckpt.load_chunk_snapshots(out_dir, 0, last0,
                                                    n_seen_shards))
        m = ckpt.read_chunk_marker(out_dir, 0, last0).get("totals", {})
        totals["records"] = m.get("records", 0)
        totals["docs"] = m.get("docs", 0)
    if done1:
        last1 = max(done1)
        seen1.restore_all(ckpt.load_chunk_snapshots(out_dir, 1, last1,
                                                    n_seen_shards))
        totals["fares"] = ckpt.read_chunk_marker(out_dir, 1, last1) \
            .get("totals", {}).get("fares", 0)
    else:
        totals["fares"] = 0

    next_dir = os.path.join(out_dir, "frontier/epoch=1")
    if not done0:
        shutil.rmtree(next_dir, ignore_errors=True)
    os.makedirs(next_dir, exist_ok=True)

    frontier_full = depth0_frontier() if len(done0) < n_chunks else None

    def _e1(chunk: int) -> None:
        link_dir = os.path.join(next_dir, f"chunk={chunk}")
        has_parts = os.path.isdir(link_dir) and any(
            f.endswith(".parquet") for f in os.listdir(link_dir))
        frontier = ray.data.read_parquet(link_dir, columns=_DETAIL_COLS) \
            if has_parts else None
        process_chunk1(1, chunk, frontier, seen1, totals)
        if fail_after_chunk is not None and chunk >= fail_after_chunk:
            raise RuntimeError(
                f"simulated crash after epoch 1 chunk {chunk} (overlap)")

    ex = _cf.ThreadPoolExecutor(max_workers=1,
                                thread_name_prefix="spider-e1")
    futures: list[_cf.Future] = []

    def _raise_if_failed(wait: bool) -> None:
        for f in list(futures):
            if wait or f.done():
                exc = f.exception()      # blocks when wait=True
                if exc is not None:
                    ex.shutdown(wait=False, cancel_futures=True)
                    raise exc
                futures.remove(f)

    try:
        for chunk in range(n_chunks):
            if chunk not in done0:
                frontier = frontier_full.map_batches(
                    lambda t, c=chunk: chunk_filter(t, c),
                    batch_format="pyarrow")
                process_chunk0(chunk, frontier, seen0, totals)
            if chunk not in done1:
                futures.append(ex.submit(_e1, chunk))
            _raise_if_failed(wait=False)
        if not epoch0_done:
            commit_epoch(0, seen0)
        _raise_if_failed(wait=True)
    finally:
        ex.shutdown(wait=True, cancel_futures=True)
    commit_epoch(1, seen1, extra_seen_stats=seen0.stats())

    return {"last_epoch": ckpt.last_complete_epoch(out_dir), "totals": totals,
            "seen": seen0.stats() + seen1.stats(), "policy": policy.stats()}
