"""S12 — proxy pool with the reference's TTL refresh semantics.

The reference's cron (``http_proxy.py:12-36``) pulls 80 proxies each
hour into a Redis set keyed ``proxies-{hour}`` with a **61-minute**
expiry — the extra minute overlaps consecutive batches so consumers
never observe an empty pool during rollover; spiders random-pick per
request (``CtripSpiderMiddleware.py:434-444``).

Here the pool is a singleton Ray actor (the Redis analog, same as the
credential store): ``get_pool`` refreshes hourly, expires 61 minutes
after mint, and returns the union of live batches (two during the
overlap minute).  Minting is deterministic per batch ordinal (replay
contract); fetch workers cache a local snapshot briefly and pick
per-URL by hash (deterministic stand-in for the random pick).

``ProxyPool`` is a plain class with an injectable clock so tests drive
rotation/expiry with a fake clock; ``ProxyPoolActor`` is its
``@ray.remote`` wrapper.
"""

from __future__ import annotations

import time

import numpy as np
import ray

REFRESH_S = 3600.0        # hourly cron (http_proxy.py runs on the hour)
TTL_S = 61 * 60.0         # redisUtil.set_expire(f'proxies-{hour}', 61*60)
POOL_SIZE = 80            # getip3?num=80


class ProxyPool:
    def __init__(self, pool_size: int = POOL_SIZE,
                 refresh_s: float = REFRESH_S, ttl_s: float = TTL_S,
                 clock=None):
        assert ttl_s >= refresh_s, \
            "ttl must cover the refresh interval or the pool goes empty"
        self.pool_size = pool_size
        self.refresh_s = refresh_s
        self.ttl_s = ttl_s
        self._clock = clock or time.monotonic
        self.batches: dict[int, tuple[float, list[str]]] = {}  # ord → (born, proxies)
        self.next_ordinal = 0
        self._refresh(self._clock())

    def _mint(self, ordinal: int) -> list[str]:
        # deterministic "provider response" per batch ordinal — the
        # stand-in for the getip3 API call
        return [f"https://proxy-{ordinal}-{i}.pool.test:{9000 + i}"
                for i in range(self.pool_size)]

    def _refresh(self, now: float) -> None:
        newest = max((born for born, _ in self.batches.values()),
                     default=-np.inf)
        if now - newest >= self.refresh_s:
            self.batches[self.next_ordinal] = (now, self._mint(self.next_ordinal))
            self.next_ordinal += 1
        for o in [o for o, (born, _) in self.batches.items()
                  if now - born >= self.ttl_s]:
            del self.batches[o]

    def get_pool(self) -> list[str]:
        """Live proxies, newest batch first (never empty: ttl ≥ refresh
        guarantees the newest batch is always alive)."""
        self._refresh(self._clock())
        out: list[str] = []
        for o in sorted(self.batches, reverse=True):
            out.extend(self.batches[o][1])
        return out

    def stats(self) -> dict:
        self._refresh(self._clock())
        return {"live_batches": len(self.batches),
                "live_proxies": sum(len(p) for _, p in self.batches.values()),
                "minted_batches": self.next_ordinal}


ProxyPoolActor = ray.remote(num_cpus=0.05)(ProxyPool)


class ProxyPoolClient:
    """Serializable handle for fetch workers.  Workers cache the pool
    locally for ``cache_s`` (the reference equivalent: spiders hit
    Redis per request, but Redis is LAN-local — an actor round-trip
    per URL would serialize the fetch pool, so the cache amortizes it
    to one call per actor per minute)."""

    def __init__(self, pool_size: int = POOL_SIZE,
                 refresh_s: float = REFRESH_S, ttl_s: float = TTL_S,
                 cache_s: float = 60.0):
        self.actor = ProxyPoolActor.remote(pool_size, refresh_s, ttl_s)
        self.cache_s = cache_s
        self._local: list[str] | None = None
        self._fetched_at = -np.inf

    def pool(self) -> list[str]:
        now = time.monotonic()
        if self._local is None or now - self._fetched_at >= self.cache_s:
            self._local = ray.get(self.actor.get_pool.remote())
            self._fetched_at = now
        return self._local

    def pick(self, key: str) -> str:
        """Deterministic per-request pick (hash of the URL) from the
        live pool — the random.choice stand-in."""
        import hashlib
        p = self.pool()
        i = int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "little")
        return p[i % len(p)]

    def stats(self) -> dict:
        return ray.get(self.actor.stats.remote())
