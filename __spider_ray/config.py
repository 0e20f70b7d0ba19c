"""Engine configuration from an INI file — the configuration surface of
the reference (``config/flight_spider_config.ini`` read through
``ylutils/ylFile.py:70-74`` ``reafConfig``/``getConfigDict``), re-keyed
to this engine's knobs: the reference's sections carried MySQL/Redis
endpoints and per-server shard ids; ours carry the crawl budget
(politeness delay/burst = ``settings.py:32-38``), state sizing (seen
shards/buckets) and checkpoint granularity.

Every key is optional — the defaults are ``run_crawl``'s own — so a
partial file configures only what it names.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Typed view of the ``[crawl]`` / ``[state]`` / ``[robots]``
    sections; ``crawl_kwargs()`` feeds ``pipelines.epoch.run_crawl``."""

    delay_s: float = 0.0
    burst: int = 6
    fetch_batch_size: int = 4096
    max_depth: int = 1
    n_days: int | None = None
    n_chunks: int = 1
    salt_hot: bool = False
    verify_unique: bool = False
    n_seen_shards: int = 4
    seen_buckets: int = 1 << 20
    deny_hosts: list[str] = field(default_factory=list)

    @classmethod
    def from_ini(cls, path: str) -> "EngineConfig":
        cp = configparser.ConfigParser()
        read = cp.read(path)
        if not read:
            raise FileNotFoundError(path)
        cfg = cls()
        crawl = cp["crawl"] if cp.has_section("crawl") else {}
        state = cp["state"] if cp.has_section("state") else {}
        robots = cp["robots"] if cp.has_section("robots") else {}
        if "delay_s" in crawl:
            cfg.delay_s = float(crawl["delay_s"])
        if "burst" in crawl:
            cfg.burst = int(crawl["burst"])
        if "fetch_batch_size" in crawl:
            cfg.fetch_batch_size = int(crawl["fetch_batch_size"])
        if "max_depth" in crawl:
            cfg.max_depth = int(crawl["max_depth"])
        if "n_days" in crawl:
            cfg.n_days = int(crawl["n_days"])
        if "n_chunks" in crawl:
            cfg.n_chunks = int(crawl["n_chunks"])
        if "salt_hot" in crawl:
            cfg.salt_hot = crawl.getboolean("salt_hot")
        if "verify_unique" in crawl:
            cfg.verify_unique = crawl.getboolean("verify_unique")
        if "n_seen_shards" in state:
            cfg.n_seen_shards = int(state["n_seen_shards"])
        if "seen_buckets" in state:
            cfg.seen_buckets = int(state["seen_buckets"])
        if "deny_hosts" in robots:
            cfg.deny_hosts = [h.strip() for h in robots["deny_hosts"].split(",")
                              if h.strip()]
        return cfg

    def robots_fetcher(self):
        """None (allow-all, the reference conformance default) unless a
        deny list is configured."""
        if not self.deny_hosts:
            return None
        denied = set(self.deny_hosts)
        return lambda host: host not in denied

    def crawl_kwargs(self) -> dict:
        return {
            "delay_s": self.delay_s,
            "burst": self.burst,
            "fetch_batch_size": self.fetch_batch_size,
            "max_depth": self.max_depth,
            "n_days": self.n_days,
            "n_chunks": self.n_chunks,
            "salt_hot": self.salt_hot,
            "verify_unique": self.verify_unique,
            "n_seen_shards": self.n_seen_shards,
            "seen_buckets": self.seen_buckets,
            "robots_fetcher": self.robots_fetcher(),
        }
