"""Sharded URL-seen set — cuckoo-filter Ray actors with bloom pre-check.

The scale path for frontier dedup (north_rule): 2^k ``UrlSeenShard``
actors, each owning one cuckoo filter; fetch/expansion tasks call
``UrlSeenSet.check_and_add`` with a whole Arrow batch of URLs and get
back the boolean new-mask.  Design points for the 10^10 frontier:

- shard routing uses hash bits 32..47, independent of the bits the
  cuckoo filter uses for bucket index (0..log2(n_buckets)) and
  fingerprint (48..63), so shard skew doesn't correlate with bucket
  collisions;
- ONE actor call per (shard, batch) — counts, not per-URL calls; the
  per-batch work on the shard is the vectorized cuckoo lookup;
- workers keep an EXACT local recent-set of resolved URL hashes
  (pipelines/epoch.SeenFilterWorker) to skip actor calls for repeats —
  a bloom pre-check would silently drop its false positives, which is
  why the approximate filters live on the authoritative shard side
  only;
- shards snapshot into the checkpoint (``snapshot_all``) and restore on
  resume — a killed job re-checks nothing it already fetched.

Replaces the reference's Redis-set dedup (``YlTwistPipeline.py:87-88``)
and the commented scrapy-redis dupefilter (``settings.py:23-28``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import hash64
from .bloom import BloomFilter
from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0.1)
class UrlSeenShard:
    """One cuckoo shard.  num_cpus=0.1: lookups are sub-millisecond
    vectorized gathers; up to ten shards share a core without starving
    the fetch tasks."""

    def __init__(self, shard_id: int, n_buckets: int = 1 << 20, bucket_size: int = 4):
        self.shard_id = shard_id
        self.filter = CuckooFilter(n_buckets=n_buckets, bucket_size=bucket_size)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.check_and_add(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains(hashes)

    def stats(self) -> dict:
        return {"shard": self.shard_id, "count": self.filter.count,
                "load": self.filter.load_factor}

    def snapshot(self) -> dict:
        return self.filter.snapshot()

    def snapshot_to(self, path: str) -> str:
        """Write this shard's snapshot npz DIRECTLY from the actor —
        the driver never holds the table bytes, and all shards
        serialize in parallel.  On a multi-node cluster the checkpoint
        dir must be shared storage (same requirement as every other
        out_dir artifact)."""
        from ..checkpoint import write_snapshot
        write_snapshot(path, self.filter.snapshot())
        return path

    def restore(self, snap: dict) -> None:
        self.filter = CuckooFilter.restore(snap)

    def reset(self) -> None:
        self.filter = CuckooFilter(n_buckets=self.filter.n_buckets,
                                   bucket_size=self.filter.bucket_size)


class UrlSeenSet:
    """Client handle: routes URL batches to shards.  Serializable into
    map_batches workers (holds only actor handles)."""

    def __init__(self, n_shards: int = 8, n_buckets: int = 1 << 20,
                 bucket_size: int = 4):
        assert n_shards & (n_shards - 1) == 0
        self.n_shards = n_shards
        # unnamed actors: owned by the driver that created the set,
        # die with it — no stale cross-run state; persistence across
        # runs goes through snapshot/restore (checkpoint.py)
        self.shards = [UrlSeenShard.remote(i, n_buckets, bucket_size)
                       for i in range(n_shards)]

    def _route(self, urls: pa.Array | list[str]) -> tuple[np.ndarray, np.ndarray]:
        h = hash64(urls if isinstance(urls, (pa.Array, pa.ChunkedArray))
                   else pa.array(urls, type=pa.string()))
        shard = ((h >> np.uint64(32)) % np.uint64(self.n_shards)).astype(np.int64)
        return h, shard

    def check_and_add(self, urls: pa.Array | list[str]) -> np.ndarray:
        """Bool mask: True = first sighting (caller should fetch)."""
        h, shard = self._route(urls)
        return self.check_and_add_hashes(h, shard)

    def check_and_add_hashes(self, h: np.ndarray,
                             shard: np.ndarray | None = None) -> np.ndarray:
        """Hash-level flavor: callers that already hold ``hash64(url)``
        (the seen-filter worker computes it for its local cache) skip
        the second vectorized hash pass."""
        if shard is None:
            shard = ((h >> np.uint64(32)) % np.uint64(self.n_shards)).astype(np.int64)
        new = np.zeros(len(h), dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(self.shards[s].check_and_add.remote(h[m]))
                idxs.append(np.nonzero(m)[0])
        for idx, res in zip(idxs, ray.get(refs)):
            new[idx] = res
        return new

    def contains(self, urls: pa.Array | list[str]) -> np.ndarray:
        h, shard = self._route(urls)
        out = np.zeros(len(h), dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(self.shards[s].contains.remote(h[m]))
                idxs.append(np.nonzero(m)[0])
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def snapshot_all(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def snapshot_all_to(self, state_dir: str) -> str:
        """All shards write their own snapshot files concurrently
        (parallel serialize + IO, nothing ships to the driver)."""
        import os
        os.makedirs(state_dir, exist_ok=True)
        ray.get([s.snapshot_to.remote(
            os.path.join(state_dir, f"seen_shard_{i}.npz"))
            for i, s in enumerate(self.shards)])
        return state_dir

    def restore_all(self, snaps: list[dict]) -> None:
        ray.get([s.restore.remote(snap) for s, snap in zip(self.shards, snaps)])

    def reset_all(self) -> None:
        ray.get([s.reset.remote() for s in self.shards])


@ray.remote(num_cpus=0.1)
class ExactSeenShard:
    """Exact per-shard seen set: FULL 64-bit content hashes in one
    sorted uint64 array (8 B/key, vectorized searchsorted probes).

    Zero false positives at any load, unlike the cuckoo shards whose
    16-bit fingerprints false-positive at ~2·b/2^16 per probe as the
    filter fills — the right structure when the membership answer is
    the QUERY RESULT (incremental content dedup checked against an
    exact SQL oracle) rather than a fetch-skip heuristic.  Memory is
    8 bytes/key/shard vs the cuckoo's ~2; both scale to 10^10 keys
    sharded, the cuckoo stays the frontier default."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self._keys = np.empty(0, dtype=np.uint64)
        self._pending: list[np.ndarray] = []

    def add(self, hashes: np.ndarray) -> int:
        self._pending.append(np.asarray(hashes, dtype=np.uint64))
        return len(hashes)

    def _consolidate(self) -> None:
        if self._pending:
            self._keys = np.unique(
                np.concatenate([self._keys, *self._pending]))
            self._pending = []

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        self._consolidate()
        h = np.asarray(hashes, dtype=np.uint64)
        if not len(self._keys):
            return np.zeros(len(h), dtype=bool)
        idx = np.searchsorted(self._keys, h)
        valid = idx < len(self._keys)
        out = np.zeros(len(h), dtype=bool)
        out[valid] = self._keys[idx[valid]] == h[valid]
        return out

    def count(self) -> int:
        self._consolidate()
        return int(len(self._keys))


class ExactSeenSet:
    """Client for ExactSeenShard pools — same hash routing as
    UrlSeenSet, exact membership (no fingerprint truncation)."""

    def __init__(self, n_shards: int = 4):
        assert n_shards & (n_shards - 1) == 0
        self.n_shards = n_shards
        self.shards = [ExactSeenShard.remote(i) for i in range(n_shards)]

    def _route(self, values: pa.Array | list[str]) -> tuple[np.ndarray, np.ndarray]:
        h = hash64(values if isinstance(values, (pa.Array, pa.ChunkedArray))
                   else pa.array(values, type=pa.string()))
        shard = ((h >> np.uint64(32)) % np.uint64(self.n_shards)).astype(np.int64)
        return h, shard

    def add(self, values: pa.Array | list[str]) -> None:
        h, shard = self._route(values)
        refs = [self.shards[s].add.remote(h[shard == s])
                for s in range(self.n_shards) if (shard == s).any()]
        ray.get(refs)

    def contains(self, values: pa.Array | list[str]) -> np.ndarray:
        h, shard = self._route(values)
        out = np.zeros(len(h), dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(self.shards[s].contains.remote(h[m]))
                idxs.append(np.nonzero(m)[0])
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))


def local_bloom(n_bits: int = 1 << 22) -> BloomFilter:
    """A worker-local bloom — ONLY for screens whose positives get
    re-verified downstream (e.g. candidate pruning before an exact
    join); never as the last word on membership (false positives)."""
    return BloomFilter(n_bits=n_bits, k=5)
