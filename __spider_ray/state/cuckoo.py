"""Cuckoo filter — the authoritative URL-seen membership structure.

Direct descendant of the reference's disabled distributed dupefilter
(``settings.py:23-28``), engineered for the 10^10-URL frontier: 32-bit
fingerprints at 4 slots/bucket ≈ 5 bytes/key at 95% load → a 10^10
frontier fits in ~50 GB across 256 shards (~200 MB/actor), with an
expected lifetime false-dedup count of only O(100) at that scale
(n²/2^(32+log2 buckets)).  Unlike a bloom filter it supports deletion
(re-crawl scheduling) and bounded false-positive rate under load.

Hot-path design: ``contains``/``check_and_add`` take uint64 hash
*arrays*.  Lookup is fully vectorized (two gather passes).  Insertion
falls back to a per-NEW-item loop — each URL is inserted exactly once
in its lifetime, so the amortized cost per crawled URL is O(1) while
the membership test (executed for every frontier candidate every
epoch) stays vectorized.

Reference: Fan et al., "Cuckoo Filter: Practically Better Than Bloom"
(CoNEXT 2014) — public paper; implementation from scratch.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import hash64_ints

_EMPTY = np.uint32(0)
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 16, bucket_size: int = 4):
        assert n_buckets & (n_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint32)
        # occupancy per bucket — lets the bulk-insert fast path place
        # fingerprints append-style without scanning for empty slots.
        self.occ = np.zeros(n_buckets, dtype=np.int8)
        self.count = 0
        self._compact = True      # empties are a suffix until a delete happens
        self._rng = np.random.RandomState(42)     # eviction slot choice (deterministic)

    # ------------------------------------------------------------- keys
    def _fp(self, hashes: np.ndarray) -> np.ndarray:
        # 32-bit fingerprints from an INDEPENDENT hash pass (not a bit
        # slice of the key hash — shard routing and bucket index use
        # those bits).  16-bit fps collide ~n²/2^(16+log2 buckets):
        # measurably lossy at millions of URLs; 32-bit pushes the
        # expected false-dedup count at 10^10 keys to O(100).
        fp = (hash64_ints(hashes, seed=5) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        fp[fp == 0] = 1                            # 0 is the empty marker
        return fp

    def _i1(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes & self.mask).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = hash64_ints(fp.astype(np.uint64), seed=2) & self.mask
        return (i1.astype(np.uint64) ^ alt).astype(np.int64)

    # ------------------------------------------------------------- read
    def contains(self, hashes: np.ndarray) -> np.ndarray:
        fp = self._fp(hashes.astype(np.uint64))
        i1 = self._i1(hashes.astype(np.uint64))
        i2 = self._i2(i1, fp)
        b1 = self.table[i1]                        # (n, bucket_size) gather
        b2 = self.table[i2]
        return ((b1 == fp[:, None]).any(axis=1)
                | (b2 == fp[:, None]).any(axis=1))

    # ------------------------------------------------------------ write
    def _place(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        empty = np.nonzero(row == _EMPTY)[0]
        if len(empty):
            row[empty[0]] = fp
            self.occ[idx] += 1
            self.count += 1
            return True
        return False

    def _insert_one(self, i1: int, i2: int, fp: int) -> bool:
        if self._place(i1, fp) or self._place(i2, fp):
            return True
        # evict (swaps keep per-bucket occupancy unchanged)
        idx = i1 if self._rng.randint(2) else i2
        for _ in range(_MAX_KICKS):
            slot = self._rng.randint(self.bucket_size)
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int((np.uint64(idx)
                       ^ (hash64_ints(np.array([fp], np.uint64), seed=2)[0] & self.mask)))
            if self._place(idx, fp):
                return True
        raise RuntimeError("cuckoo filter full — grow n_buckets")

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Batched test-and-set: returns a bool mask of rows that were
        NEW (not seen before this call).  Duplicates *within* the batch
        are also resolved — only the first occurrence is new.

        Fast path (the 10^10-frontier hot loop): all-new placements go
        through ONE vectorized append — sort candidates by bucket, rank
        within bucket, scatter into ``occ[b] + rank`` slots.  Only rows
        whose primary bucket overflows fall back to the per-item cuckoo
        eviction walk (rare below ~80% load)."""
        h = hashes.astype(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        seen = self.contains(h)
        new = np.zeros(len(h), dtype=bool)
        cand = np.nonzero(~seen)[0]
        if not len(cand):
            return new
        # resolve in-batch duplicates on (i1, fp): keep first occurrence
        key = (i1[cand].astype(np.uint64) << np.uint64(32)) | fp[cand].astype(np.uint64)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.empty(len(ks), dtype=bool)
        first[0] = True
        first[1:] = ks[1:] != ks[:-1]
        ins = cand[np.sort(order[first])]           # original batch order
        new[ins] = True
        if self._compact:
            # stage 1: vectorized append into primary buckets
            miss = self._append_many(i1[ins], fp[ins])
            if miss.any():
                # stage 2: vectorized append into alternate buckets
                rows = ins[miss]
                alt = self._i2(i1[rows], fp[rows])
                miss2 = self._append_many(alt, fp[rows])
                rem = rows[miss2]
            else:
                rem = ins[:0]
        else:
            rem = ins
        for row in rem:                              # rare: eviction walk
            i2 = self._i2(i1[row:row + 1], fp[row:row + 1])[0]
            self._insert_one(int(i1[row]), int(i2), int(fp[row]))
        return new

    def _append_many(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized append of fps into prefix-occupied buckets.
        Returns the mask of items that did NOT fit (bucket full)."""
        so = np.argsort(buckets, kind="stable")
        bs = buckets[so]
        n = len(bs)
        grp_start = np.empty(n, dtype=bool)
        grp_start[0] = True
        grp_start[1:] = bs[1:] != bs[:-1]
        idx_of_start = np.maximum.accumulate(
            np.where(grp_start, np.arange(n), 0))
        rank = np.arange(n) - idx_of_start
        slot = self.occ[bs].astype(np.int64) + rank
        fits = slot < self.bucket_size
        self.table[bs[fits], slot[fits]] = fps[so][fits]
        np.add.at(self.occ, bs[fits], 1)
        self.count += int(fits.sum())
        miss = np.zeros(n, dtype=bool)
        miss[so[~fits]] = True
        return miss

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per hash; returns success mask."""
        h = hashes.astype(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        ok = np.zeros(len(h), dtype=bool)
        for j in range(len(h)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.table[idx]
                hit = np.nonzero(row == fp[j])[0]
                if len(hit):
                    row[hit[0]] = _EMPTY
                    self.occ[idx] -= 1
                    self.count -= 1
                    ok[j] = True
                    break
        if ok.any():
            self._compact = False     # holes may not be a suffix anymore
        return ok

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * self.bucket_size)

    # ---------------------------------------------------------- snapshot
    def snapshot(self) -> dict:
        """Occupancy-proportional when sparse: below ~1/3 load, ship
        (flat slot index, fingerprint) pairs — 12 B/key — instead of the
        whole 4 B/slot table.  A young 10^10-capacity filter (or any
        over-provisioned shard) snapshots in O(keys), not O(capacity);
        dense stays optimal above the crossover."""
        base = {
            "n_buckets": self.n_buckets,
            "bucket_size": self.bucket_size,
            "count": self.count,
        }
        flat = self.table.ravel()
        if self.count * 3 < flat.size:          # 12 B/key < 4 B/slot
            nz = np.nonzero(flat)[0]
            base["idx"] = nz.astype(np.uint64)
            base["fps"] = flat[nz]
        else:
            base["table"] = self.table.tobytes()
        return base

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        f = cls(n_buckets=snap["n_buckets"], bucket_size=snap["bucket_size"])
        if "table" in snap:
            t = snap["table"]
            flat = (np.frombuffer(t, dtype=np.uint32)
                    if isinstance(t, (bytes, bytearray))
                    else np.ascontiguousarray(t).view(np.uint32))
            f.table = flat.reshape(snap["n_buckets"],
                                   snap["bucket_size"]).copy()
        else:                                    # sparse form
            flat = np.zeros(snap["n_buckets"] * snap["bucket_size"],
                            dtype=np.uint32)
            idx = np.asarray(snap["idx"], dtype=np.uint64)
            fps = np.asarray(snap["fps"], dtype=np.uint32)
            flat[idx.astype(np.int64)] = fps
            f.table = flat.reshape(snap["n_buckets"], snap["bucket_size"])
        f.count = snap["count"]
        filled = f.table != _EMPTY
        f.occ = filled.sum(axis=1).astype(np.int8)
        # fast path is valid only if every bucket is prefix-occupied
        # (slot k+1 filled ⇒ slot k filled)
        f._compact = bool(np.all(filled[:, :-1] | ~filled[:, 1:]))
        return f
