"""Per-host politeness: token-bucket rate limiting + robots cache actor.

Re-expresses the reference's politeness budget — ``DOWNLOAD_DELAY``
2-4 s and ``CONCURRENT_REQUESTS`` 4-6 randomized per process
(``settings.py:32-38``), plus the 1-3 s inter-seed sleep
(``spiders/ctripSpider.py:229``) — as an explicit per-host token
bucket: rate = 1/delay tokens/s, burst = max_concurrent.

Design for scale (SURVEY.md §7.4): the actor is the single source of
truth per host (politeness is a *global* per-host constraint even when
fetch tasks are spread across salted partitions), but it must never be
the bottleneck — grants are issued per (host, count) batch, ONE actor
round-trip per batch, and the *worker* sleeps out the returned wait,
not the actor.  Hosts are hash-sharded across a small actor pool so no
single actor serializes all hosts.

robots.txt: the reference disables it (``ROBOTSTXT_OBEY = False``,
``settings.py:21``) — conformance mode reproduces allow-all; the
engine supports a pluggable fetcher with TTL caching (north_rule).
"""

from __future__ import annotations

import time
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray


class TokenBucket:
    __slots__ = ("rate", "burst", "tokens", "t_last")

    def __init__(self, rate: float, burst: float, now: float):
        self.rate = rate          # tokens/sec (= 1/delay_s); <=0 → unlimited
        self.burst = burst
        self.tokens = burst
        self.t_last = now

    def grant(self, n: int, now: float) -> float:
        """Reserve n tokens; return seconds the caller must wait before
        issuing them.  Allows the balance to go negative so one batched
        call can reserve a whole batch (the caller paces itself)."""
        if self.rate <= 0:
            return 0.0
        self.tokens = min(self.burst, self.tokens + (now - self.t_last) * self.rate)
        self.t_last = now
        self.tokens -= n
        return max(0.0, -self.tokens / self.rate)


@ray.remote(num_cpus=0.1)
class HostPolicyActor:
    """One shard of the politeness/robots state (hosts hash-route here)."""

    def __init__(self, delay_s: float = 0.0, burst: int = 6,
                 robots_ttl_s: float = 3600.0,
                 robots_fetcher: Callable[[str], bool] | None = None):
        self.delay_s = delay_s
        self.burst = burst
        self.buckets: dict[str, TokenBucket] = {}
        self.robots: dict[str, tuple[bool, float]] = {}   # host → (allow, fetched_at)
        self.robots_ttl_s = robots_ttl_s
        self.robots_fetcher = robots_fetcher              # None → allow-all (settings.py:21)
        self.granted = 0

    def acquire(self, host_counts: dict[str, int]) -> float:
        """Batched token grant: reserve count tokens per host, return the
        max wait the calling worker must sleep before fetching the batch."""
        return max(self.acquire_per_host(host_counts).values(), default=0.0)

    def acquire_per_host(self, host_counts: dict[str, int]) -> dict[str, float]:
        """Batched token grant, per-host flavor: reserve count tokens per
        host and return each host's own wait, so the worker can pace
        sub-batches per host instead of sleeping the batch max."""
        now = time.monotonic()
        waits: dict[str, float] = {}
        rate = (1.0 / self.delay_s) if self.delay_s > 0 else 0.0
        for host, n in host_counts.items():
            b = self.buckets.get(host)
            if b is None:
                b = self.buckets[host] = TokenBucket(rate, float(self.burst), now)
            waits[host] = b.grant(n, now)
            self.granted += n
        return waits

    def robots_allowed(self, hosts: list[str]) -> list[bool]:
        """TTL-cached robots decisions, one bool per host."""
        now = time.monotonic()
        out = []
        for h in hosts:
            cached = self.robots.get(h)
            if cached is None or now - cached[1] > self.robots_ttl_s:
                allow = True if self.robots_fetcher is None else bool(self.robots_fetcher(h))
                self.robots[h] = (allow, now)
                cached = self.robots[h]
            out.append(cached[0])
        return out

    def stats(self) -> dict:
        return {"hosts": len(self.buckets), "granted": self.granted,
                "robots_cached": len(self.robots)}


class HostPolicyClient:
    """Serializable client for fetch workers: shards hosts across a
    small HostPolicyActor pool; one actor call per (shard, batch)."""

    def __init__(self, n_actors: int = 2, delay_s: float = 0.0, burst: int = 6,
                 robots_fetcher: Callable[[str], bool] | None = None):
        self.n_actors = n_actors
        # unnamed: one pool per crawl run, dies with its handles —
        # config (delay/burst) can never go stale across runs; the
        # client object itself (with its handle list) serializes into
        # task closures, so no injection path is needed
        self.actors = [HostPolicyActor.remote(delay_s, burst, 3600.0,
                                              robots_fetcher)
                       for _ in range(n_actors)]

    def _shard_of(self, host: str) -> int:
        # Deterministic across processes: builtin hash() is per-process
        # randomized (PYTHONHASHSEED unset in Ray workers), which would
        # route the same host to different shards from different fetch
        # workers — n_actors independent token buckets per host, silently
        # breaking the global per-host rate cap.  md5 is stable everywhere.
        import hashlib
        return int.from_bytes(hashlib.md5(host.encode()).digest()[:8], "little") % self.n_actors

    def acquire_for_batch(self, hosts: pa.Array | pa.ChunkedArray) -> None:
        """Group the batch by host, request grants, sleep out the max
        wait (coarse flavor; the fetch stage uses ``acquire_waits`` for
        per-host sub-batch pacing)."""
        waits = self.acquire_waits(hosts)
        w = max(waits.values(), default=0.0)
        if w > 0:
            time.sleep(w)

    def acquire_waits(self, hosts: pa.Array | pa.ChunkedArray) -> dict[str, float]:
        """Per-host grant waits for a batch — ONE actor call per shard,
        returning host → seconds-to-wait so the caller can issue each
        host's sub-batch after its own wait instead of the batch max."""
        # Counter is O(n) hashing — np.unique would sort an object array
        # per batch (and raise on a null host)
        per_shard = self._shard_counts(hosts)
        results = ray.get([self.actors[s].acquire_per_host.remote(hc)
                           for s, hc in per_shard.items()])
        waits: dict[str, float] = {}
        for r in results:
            waits.update(r)
        return waits

    def _shard_counts(self, hosts: pa.Array | pa.ChunkedArray
                      ) -> dict[int, dict[str, int]]:
        from collections import Counter
        counts = Counter(hosts.to_pylist())
        counts.pop(None, None)                 # null hosts get no grant
        per_shard: dict[int, dict[str, int]] = {}
        for h, c in counts.items():
            per_shard.setdefault(self._shard_of(h), {})[h] = int(c)
        return per_shard

    async def acquire_waits_async(self, hosts: pa.Array | pa.ChunkedArray
                                  ) -> dict[str, float]:
        """``acquire_waits`` for async fetch actors: the grant RPCs are
        awaited (ObjectRefs are awaitables), never ``ray.get``-blocked,
        so the actor's event loop keeps serving other in-flight batches
        during the round-trip."""
        import asyncio
        per_shard = self._shard_counts(hosts)
        results = await asyncio.gather(
            *[self.actors[s].acquire_per_host.remote(hc)
              for s, hc in per_shard.items()])
        waits: dict[str, float] = {}
        for r in results:
            waits.update(r)
        return waits

    def robots_mask(self, hosts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """Per-row allow mask, resolved via the TTL cache actors."""
        rows = hosts.to_pylist()
        uniq = set(rows)
        uniq.discard(None)
        per_shard: dict[int, list[str]] = {}
        for h in uniq:
            per_shard.setdefault(self._shard_of(h), []).append(h)
        allow: dict[str | None, bool] = {None: False}   # null host → deny
        results = ray.get([self.actors[s].robots_allowed.remote(hs)
                           for s, hs in per_shard.items()])
        for hs, res in zip(per_shard.values(), results):
            allow.update(zip(hs, res))
        return np.array([allow[h] for h in rows], dtype=bool)

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])
