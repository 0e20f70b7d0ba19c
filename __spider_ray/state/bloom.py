"""Vectorized bloom filter (numpy bitmap) — the cheap pre-check in
front of the cuckoo shards (SURVEY.md §7.1 step 4).

The reference's vestigial dupefilter is the commented scrapy-redis
``RFPDupeFilter`` (``settings.py:23-28``) — a Redis set.  At 10^10 URLs
a set is ~1 TB; a bloom bitmap at 10 bits/key is ~12 GB cluster-wide,
sharded.  In the engine the bloom is used two ways:

- inside each fetch worker as a *local* recent-URL pre-check (false
  positives fall through to the authoritative cuckoo shard);
- snapshotted per epoch into the checkpoint (``np.packbits`` → bytes).

All operations are batch-vectorized: ``add``/``contains`` take uint64
hash arrays, never single values, so one actor call amortizes over a
whole Arrow batch.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import hash64_ints


class BloomFilter:
    """k-hash bloom over a power-of-two bit array.

    n_bits must be a power of two (mask instead of modulo).  The k
    probe positions derive from one 64-bit hash via the Kirsch-
    Mitzenmacher double-hashing construction (h1 + i*h2), which keeps
    the per-batch cost at two splitmix64 passes regardless of k.
    """

    def __init__(self, n_bits: int = 1 << 24, k: int = 7):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.mask = np.uint64(n_bits - 1)
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64)
        h2 = hash64_ints(h1, seed=1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) & self.mask   # (k, n)

    def add(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely new."""
        pos = self._positions(hashes)                            # (k, n)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return bit.all(axis=0)

    # ---------------------------------------------------------- snapshot
    def snapshot(self) -> dict:
        return {"n_bits": self.n_bits, "k": self.k, "bits": self.bits.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        f = cls(n_bits=snap["n_bits"], k=snap["k"])
        f.bits = np.frombuffer(snap["bits"], dtype=np.uint8).copy()
        return f
