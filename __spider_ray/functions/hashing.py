"""Deterministic, vectorized hashing primitives.

Every "random" choice in the reference (UA pick at
``spiders/ctripSpider.py:114-115``, proxy pick, delay jitter at
``settings.py:32-37``) becomes a pure hash of the row here, so replays
and the ordering/seen-set conformance oracle are deterministic
(SURVEY.md §7.4).

Two families:

- ``hash64`` — fast vectorized 64-bit hashes (FNV-1a over UTF-8 bytes,
  implemented with NumPy over Arrow buffers; no Python-per-row loop).
  Used for partitioning, bloom/cuckoo fingerprints, salting.
- ``md5_hex`` — per-row hashlib MD5.  Slower (Python loop) but exactly
  reproducible in DuckDB (``md5(...)``), so synthetic-web content and
  SQL-checkable derivations use it.  Only ever applied to small/seed
  data, never in the 100 TB hot path.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _string_array_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (data_bytes, starts, ends) views of a pyarrow string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    buf_offsets, buf_data = arr.buffers()[1], arr.buffers()[2]
    # A sliced array's offsets buffer still starts at element 0 of the
    # parent: skip arr.offset ENTRIES (the stored byte offsets are already
    # absolute into the data buffer — do not add arr.offset to them).
    offsets = np.frombuffer(buf_offsets, dtype=np.int64, count=len(arr) + 1,
                            offset=arr.offset * 8)
    data = np.frombuffer(buf_data, dtype=np.uint8) if buf_data is not None else np.empty(0, np.uint8)
    return data, offsets[:-1], offsets[1:]


def hash64(values: pa.Array | pa.ChunkedArray | Sequence[str] | np.ndarray,
           seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit FNV-1a hash of a string column → uint64 ndarray.

    Processes the column byte-plane position-by-position (max-string-len
    iterations of NumPy ops, not one Python iteration per row), so a
    block of 100k short strings hashes in a handful of vector passes.
    """
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array([str(v) for v in values], type=pa.string())
    data, starts, ends = _string_array_bytes(values)
    n = len(starts)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if seed:
        h ^= np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        h *= _FNV_PRIME
    lengths = ends - starts
    maxlen = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            active = lengths > i
            if not active.any():
                break
            idx = starts[active] + i
            h_active = h[active]
            h_active ^= data[idx].astype(np.uint64)
            h_active *= _FNV_PRIME
            h[active] = h_active
        # final avalanche (splitmix64 finish) to spread short-string hashes
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def hash64_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """splitmix64 over an integer ndarray (vectorized)."""
    x = values.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64((0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def uniform01(values: pa.Array | Sequence[str], salt: str = "") -> np.ndarray:
    """Deterministic per-row uniform [0,1) floats from a string column.

    Replaces the reference's ``random.choice`` / ``random.uniform`` calls
    so UA pick and delay jitter are pure functions of the row.
    """
    if salt:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            import pyarrow.compute as pc
            values = pc.binary_join_element_wise(values.cast(pa.string()), pa.scalar(salt), "\x1f")
        else:
            values = [f"{v}\x1f{salt}" for v in values]
    h = hash64(values)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


KMV_K = 256


def kmv_sketch(h: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """K-minimum-values distinct-count sketch of a uint64 hash array:
    the k smallest DISTINCT hash values (fewer if the input has fewer).
    Mergeable by union+re-min; O(n) per batch, k·8 bytes of state.
    (Bar-Yossef et al., "Counting distinct elements in a data stream",
    RANDOM 2002 — public; implemented from scratch.)"""
    u = np.unique(h)                    # sorted distinct
    return u[:k]


def kmv_merge(sketches: "Iterable[np.ndarray]", k: int = KMV_K) -> np.ndarray:
    parts = [np.asarray(s, dtype=np.uint64) for s in sketches if len(s)]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(sketch: np.ndarray, k: int = KMV_K) -> float:
    """Distinct-count estimate: with fewer than k values the sketch IS
    the exact distinct set; else (k-1) · 2^64 / kth_min (standard KMV,
    relative std ≈ 1/√(k-2))."""
    if len(sketch) < k:
        return float(len(sketch))
    kth = float(sketch[k - 1])
    return (k - 1) * (2.0 ** 64) / max(kth, 1.0)


def md5_hex(values: Iterable[str]) -> list[str]:
    """Per-row MD5 hex digests, bit-identical to DuckDB ``md5(col)``.

    Python-loop by design; use only on seed/synthetic data (SQL-oracle
    reproducibility), never in a 100 TB hot stage.
    """
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values]


def md5_u64(value: str, lo: int, hi: int) -> int:
    """An integer in [lo, hi] derived from md5(value) — reproducible in
    DuckDB as ``lo + (('0x' || substr(md5(v),1,8))::bigint % (hi-lo+1))``."""
    x = int(hashlib.md5(value.encode("utf-8")).hexdigest()[:8], 16)
    return lo + x % (hi - lo + 1)
