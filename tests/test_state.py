"""Unit tests for the distributed-state primitives (bloom/cuckoo/actors)."""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from __spider_ray.functions.hashing import hash64
from __spider_ray.state.bloom import BloomFilter
from __spider_ray.state.cuckoo import CuckooFilter
from __spider_ray.state.politeness import HostPolicyClient, TokenBucket
from __spider_ray.state.url_seen import UrlSeenSet


def _hashes(n, seed=0):
    return hash64(pa.array([f"url-{seed}-{i}" for i in range(n)]))


def test_bloom_no_false_negatives():
    b = BloomFilter(n_bits=1 << 16, k=5)
    h = _hashes(2000)
    b.add(h)
    assert b.contains(h).all()


def test_bloom_false_positive_rate():
    b = BloomFilter(n_bits=1 << 18, k=7)
    b.add(_hashes(5000, seed=1))
    fp = b.contains(_hashes(5000, seed=2)).mean()
    assert fp < 0.01, fp


def test_bloom_snapshot_roundtrip():
    b = BloomFilter(n_bits=1 << 14, k=3)
    h = _hashes(100)
    b.add(h)
    b2 = BloomFilter.restore(b.snapshot())
    assert b2.contains(h).all()


def test_cuckoo_check_and_add():
    f = CuckooFilter(n_buckets=1 << 12)
    h = _hashes(3000)
    new = f.check_and_add(h)
    assert new.all()
    assert f.contains(h).all()
    again = f.check_and_add(h)
    assert not again.any()


def test_cuckoo_in_batch_duplicates():
    f = CuckooFilter(n_buckets=1 << 10)
    h = np.concatenate([_hashes(50), _hashes(50)])   # each hash twice
    new = f.check_and_add(h)
    assert new[:50].all() and not new[50:].any()


def test_cuckoo_delete_and_load():
    f = CuckooFilter(n_buckets=1 << 10)
    h = _hashes(500)
    f.check_and_add(h)
    assert 0 < f.load_factor < 1
    ok = f.delete(h[:100])
    assert ok.all()
    # deleted keys read as absent (modulo fp collisions with remaining keys)
    assert f.contains(h[:100]).mean() < 0.1


def test_cuckoo_snapshot_roundtrip():
    f = CuckooFilter(n_buckets=1 << 10)
    h = _hashes(300)
    f.check_and_add(h)
    f2 = CuckooFilter.restore(f.snapshot())
    assert f2.contains(h).all()
    assert f2.count == f.count
    assert not f2.check_and_add(h).any()


def test_cuckoo_snapshot_sparse_and_dense_forms(tmp_path):
    """Below ~1/3 load the snapshot is sparse (idx/fps pairs, no table);
    above it, dense — and both survive the npz disk round-trip."""
    from __spider_ray.checkpoint import _load_snapshots, write_snapshot

    sparse = CuckooFilter(n_buckets=1 << 12)     # 16384 slots
    hs = _hashes(300)
    sparse.check_and_add(hs)
    s = sparse.snapshot()
    assert "idx" in s and "table" not in s
    assert len(s["idx"]) == sparse.count         # occupancy-proportional

    dense = CuckooFilter(n_buckets=1 << 8)       # 1024 slots
    hd = _hashes(700, seed=9)
    dense.check_and_add(hd)
    d = dense.snapshot()
    assert "table" in d and "idx" not in d

    for i, (snap, f0, h) in enumerate([(s, sparse, hs), (d, dense, hd)]):
        write_snapshot(str(tmp_path / f"seen_shard_{i}.npz"), snap)
    back = _load_snapshots(str(tmp_path), 2)
    for snap, f0, h in zip(back, [sparse, dense], [hs, hd]):
        f2 = CuckooFilter.restore(snap)
        assert f2.count == f0.count
        assert np.array_equal(f2.table, f0.table)
        assert not f2.check_and_add(h).any()


def test_url_seen_actor_pool():
    seen = UrlSeenSet(n_shards=2, n_buckets=1 << 12)
    urls = [f"https://h{i % 7}.test/p{i}" for i in range(4000)]
    assert seen.check_and_add(urls).all()
    assert not seen.check_and_add(urls).any()
    assert seen.contains(urls).all()
    stats = seen.stats()
    assert sum(s["count"] for s in stats) == 4000


def test_url_seen_snapshot_restore():
    seen = UrlSeenSet(n_shards=2, n_buckets=1 << 12)
    urls = [f"https://snap.test/{i}" for i in range(500)]
    seen.check_and_add(urls)
    snaps = seen.snapshot_all()
    seen2 = UrlSeenSet(n_shards=2, n_buckets=1 << 12)
    seen2.restore_all(snaps)
    assert not seen2.check_and_add(urls).any()


def test_exact_seen_no_false_positives_at_load():
    """The reason dedup_incremental moved off the cuckoo filter: at
    high load a 16-bit-fingerprint filter false-positives on
    never-seen keys, while the exact sorted-hash shards must not —
    at ANY load.  60k inserts into 4 shards is well past the load
    where cuckoo FPs become plausible (~60000/2^16 ≈ 0.9 expected
    hits per 1000 probes per bucket fingerprint)."""
    from __spider_ray.state.url_seen import ExactSeenSet

    seen = ExactSeenSet(n_shards=4)
    base = [f"doc-content-{i}" for i in range(60000)]
    seen.add(base)
    assert seen.count() == 60000
    # every inserted key is found (no false negatives)
    assert seen.contains(base[:5000]).all()
    # zero false positives on a disjoint probe set
    probe = [f"never-seen-{i}" for i in range(20000)]
    assert not seen.contains(probe).any()
    # idempotent re-insert
    seen.add(base[:1000])
    assert seen.count() == 60000


def test_token_bucket_rate():
    now = 0.0
    b = TokenBucket(rate=10.0, burst=5.0, now=now)   # 10 tokens/s, burst 5
    assert b.grant(5, now) == 0.0                    # burst absorbed
    w = b.grant(10, now)                             # 10 more → wait 1s
    assert abs(w - 1.0) < 1e-9
    assert b.grant(1, now + 2.0) == 0.0              # refilled (capped at burst)


def test_politeness_enforces_delay():
    pol = HostPolicyClient(n_actors=1, delay_s=0.05, burst=2)
    hosts = pa.array(["slow.test"] * 10)
    t0 = time.monotonic()
    pol.acquire_for_batch(hosts)      # 10 tokens at 20/s, burst 2 → ~0.4s wait
    elapsed = time.monotonic() - t0
    assert elapsed > 0.25, elapsed


def test_per_host_subbatch_pacing():
    """A batch spanning a rate-limited host and a free host must issue
    the free host's URLs immediately (first in output, before any
    sleep) and still wait out the slow host's own budget — per-host
    pacing, not batch-max sleeping."""
    from __spider_ray.stages.fetch import paced_fetch
    pol = HostPolicyClient(n_actors=1, delay_s=0.05, burst=2)
    # exhaust slow.test's burst so its NEXT grant carries a wait
    pol.acquire_waits(pa.array(["slow.test"] * 6))
    fetched_at = {}

    def fake_fetch(t: pa.Table) -> pa.Table:
        for h in set(t["host"].to_pylist()):
            fetched_at.setdefault(h, time.monotonic())
        return t

    batch = pa.table({"host": pa.array(["slow.test"] * 4 + ["fast.test"] * 2),
                      "url": pa.array([f"u{i}" for i in range(6)])})
    t0 = time.monotonic()
    out = paced_fetch(batch, pol, fake_fetch)
    assert out.num_rows == 6
    # fast host issued promptly; slow host waited out its own budget
    assert fetched_at["fast.test"] - t0 < 0.1
    assert fetched_at["slow.test"] - t0 > 0.25
    # output groups ordered by ascending wait → fast rows first
    assert out["host"][0].as_py() == "fast.test"


def test_robots_allow_all_default():
    pol = HostPolicyClient(n_actors=2, delay_s=0.0)
    mask = pol.robots_mask(pa.array([f"h{i}.test" for i in range(20)]))
    assert mask.all()


def test_robots_pluggable_fetcher_denies():
    deny = HostPolicyClient(
        n_actors=2, delay_s=0.0,
        robots_fetcher=lambda h: not h.startswith("blocked"))
    mask = deny.robots_mask(pa.array(["blocked.test", "ok.test", "blocked2.x"]))
    assert list(mask) == [False, True, False]
    # TTL cache: second call answers from cache (same result, no refetch crash)
    mask2 = deny.robots_mask(pa.array(["blocked.test", "ok.test"]))
    assert list(mask2) == [False, True]


def test_proxy_pool_ttl_rotation_and_overlap():
    """http_proxy.py semantics with a fake clock: hourly mint, 61-min
    expiry, a 1-minute two-batch overlap at each rollover, and never
    an empty pool."""
    from __spider_ray.state.proxy_pool import ProxyPool

    class Clock:
        t = 0.0

        def __call__(self):
            return self.t
    clk = Clock()
    pool = ProxyPool(pool_size=10, refresh_s=3600.0, ttl_s=61 * 60.0,
                     clock=clk)
    first = pool.get_pool()
    assert len(first) == 10 and all("proxy-0-" in p for p in first)

    clk.t = 3599.0                      # still within the first hour
    assert pool.get_pool() == first

    clk.t = 3600.0                      # rollover: batch 1 minted,
    both = pool.get_pool()              # batch 0 still has 60s of TTL
    assert len(both) == 20
    assert all("proxy-1-" in p for p in both[:10])    # newest first

    clk.t = 3660.0                      # 61 min: batch 0 expired
    second = pool.get_pool()
    assert len(second) == 10 and all("proxy-1-" in p for p in second)
    assert pool.stats()["minted_batches"] == 2

    for step in range(2, 6):            # long run: always non-empty
        clk.t = step * 3600.0 + 30.0
        assert len(pool.get_pool()) >= 10


def test_proxy_pool_client_and_fetch_worker(ray_session):
    """Actor-backed client: deterministic per-URL pick from the live
    pool; FetchWorker routes next_proxy through it when given."""
    from __spider_ray.stages.fetch import FetchWorker
    from __spider_ray.state.proxy_pool import ProxyPoolClient
    client = ProxyPoolClient(pool_size=5)
    p1 = client.pick("https://a.test/x")
    assert p1 == client.pick("https://a.test/x")      # deterministic
    assert p1 in client.pool()
    w = FetchWorker(proxy_pool=client)
    assert w.next_proxy("https://a.test/x") == p1
    assert client.stats()["live_proxies"] == 5


def test_async_fetch_overlaps_host_waits():
    """Round-4 verdict #7: at the reference politeness budget (seconds
    per host), the async fetch actor overlaps per-host waits across
    in-flight batches — wall time ≈ max host wait, not the sum — and
    emits exactly the rows the synchronous flavor would."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from __spider_ray.stages.fetch import AsyncFetchWorker
    from __spider_ray.state.politeness import HostPolicyClient

    # burst=1, delay 2 s/host → each host's SECOND row waits ~2 s
    pol = HostPolicyClient(n_actors=1, delay_s=2.0, burst=1)
    hosts = [f"h{i}.test" for i in range(4)]
    # ONE block, host-major rows; batch_size=2 slices it into one
    # batch per host, and the async UDF runs up to 4 batches
    # concurrently inside the task — their waits overlap
    t = pa.table({
        "url": [f"https://{h}/p{j}" for h in hosts for j in range(2)],
        "host": [h for h in hosts for _ in range(2)],
    })
    ds = rd.from_arrow(t)

    t0 = time.monotonic()
    out = ds.map_batches(AsyncFetchWorker,
                         fn_constructor_kwargs={"politeness": pol},
                         concurrency=1, batch_size=2,
                         batch_format="pyarrow").to_pandas()
    wall = time.monotonic() - t0

    assert len(out) == 8 and set(out["host"]) == set(hosts)
    assert (out["status"] > 0).all()
    # serial sleeps would be ≥ 4 hosts × 2 s = 8 s on ONE actor; the
    # overlapped wall is ~2 s + scheduling — a generous noise margin
    # still separates the two regimes cleanly
    assert wall < 6.0, f"host waits did not overlap: wall={wall:.1f}s"
