"""Analytic range exchange for packed frontier sort keys.

``ds.sort()`` picks reduce boundaries by SAMPLING keys; on the crawl
frontier (reference crawl-order contract, ``spiders/ctripSpider.py:136-229``
→ SURVEY.md §2.6 O4) that was measured to produce **5× row skew** across
reduce blocks at sf0.1 (9.6k–50.8k rows/block), which turns into straggler
waves in the fused seen→fetch→parse chain downstream — the dominant
scaling leak of the depth-0 pass at 32 CPUs.

The frontier key has exploitable structure (``expand.pack_sort_key``):

    key = host_field << low_bits | remainder

where ``host_field`` is hash-valued (top bits of ``hash64(host)``, plus
the optional hot-host salt spliced above the priority bits) and
``remainder`` (the priority) is near-uniform WITHIN each host by
construction (priority = seed_index·n_days + day_rank).  So exact
boundaries need no sampling:

1. one bounded summary pass — per block, (group, count, min/max
   remainder) where group = key >> shift.  The shift auto-coarsens
   (dropping low host-hash bits) until the per-block group count fits a
   cap, so the driver-side summary stays bounded at ANY host
   cardinality (27 hosts in the synthetic web, 10^7 on a real crawl —
   hash bits are uniform, so coarse groups stay balanced by LLN);
2. boundaries walk the merged per-group counts in key order and cut
   INSIDE a group by uniform interpolation over its remainder range;
3. the classic two-stage map/reduce exchange (raw Ray tasks — the one
   place the Dataset API can't express the semantics: analytic
   boundaries instead of sampled ones) splits each block at the
   boundaries and merges + locally sorts each range.

Output: a Dataset whose blocks are in global key order, each locally
sorted — exactly the layout ``ds.sort(key)`` yields, with near-perfect
row balance and one fewer barrier (no sampling stage).

Partitioning assumption (documented per the brief): the remainder is
~uniform within each group.  If it isn't, only BALANCE degrades —
boundaries at any values preserve global range order, so correctness
never depends on the assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


_GROUP_CAP = 4096        # max per-block summary groups shipped to the driver


def _block_summary(tbl: pa.Table, key: str, low_bits: int,
                   cap: int = _GROUP_CAP) -> dict:
    """Bounded per-block key summary: groups at an adaptive shift.

    Returns {shift, group (sorted), count, rmin, rmax} where
    group = key >> shift and rmin/rmax bound (key & ((1<<shift)-1))
    within each group.  shift starts at ``low_bits`` and coarsens in
    8-bit steps until the group count fits ``cap``."""
    k = tbl[key].to_numpy().astype(np.int64)
    shift = low_bits
    while True:
        g = k >> np.int64(shift)
        groups, inv = np.unique(g, return_inverse=True)
        if len(groups) <= cap or shift >= 62:
            break
        shift += 8
    rem = k - (g << np.int64(shift))
    count = np.bincount(inv, minlength=len(groups)).astype(np.int64)
    order = np.argsort(inv, kind="stable")
    bounds = np.concatenate([[0], np.cumsum(count)])
    rs = rem[order]
    rmin = np.minimum.reduceat(rs, bounds[:-1])
    rmax = np.maximum.reduceat(rs, bounds[:-1])
    return {"shift": int(shift), "group": groups, "count": count,
            "rmin": rmin, "rmax": rmax}


def _coarsen(s: dict, shift: int) -> dict:
    """Re-express a summary at a coarser shift (exact counts; remainder
    bounds derived from each fine group's position inside the coarse
    one)."""
    d = shift - s["shift"]
    if d == 0:
        return s
    assert d > 0
    low = s["group"] & np.int64((1 << d) - 1)     # fine bits that move down
    group = s["group"] >> np.int64(d)
    rmin = (low << np.int64(s["shift"])) + s["rmin"]
    rmax = (low << np.int64(s["shift"])) + s["rmax"]
    groups, inv = np.unique(group, return_inverse=True)
    count = np.zeros(len(groups), dtype=np.int64)
    np.add.at(count, inv, s["count"])
    gmin = np.full(len(groups), np.iinfo(np.int64).max)
    gmax = np.full(len(groups), np.iinfo(np.int64).min)
    np.minimum.at(gmin, inv, rmin)
    np.maximum.at(gmax, inv, rmax)
    return {"shift": int(shift), "group": groups, "count": count,
            "rmin": gmin, "rmax": gmax}


def _boundaries(summaries: list[dict], n_parts: int) -> np.ndarray:
    """n_parts-1 ascending boundary keys from merged group summaries.

    Equi-depth across groups (exact counts), uniform interpolation
    inside a group over its remainder range."""
    shift = max(s["shift"] for s in summaries)
    cs = [_coarsen(s, shift) for s in summaries]
    group = np.concatenate([c["group"] for c in cs])
    count = np.concatenate([c["count"] for c in cs])
    rmin = np.concatenate([c["rmin"] for c in cs])
    rmax = np.concatenate([c["rmax"] for c in cs])
    groups, inv = np.unique(group, return_inverse=True)
    gcount = np.zeros(len(groups), dtype=np.int64)
    np.add.at(gcount, inv, count)
    gmin = np.full(len(groups), np.iinfo(np.int64).max)
    gmax = np.full(len(groups), np.iinfo(np.int64).min)
    np.minimum.at(gmin, inv, rmin)
    np.maximum.at(gmax, inv, rmax)

    total = int(gcount.sum())
    cum = np.concatenate([[0], np.cumsum(gcount)])
    out = np.empty(n_parts - 1, dtype=np.int64)
    for i in range(1, n_parts):
        target = total * i / n_parts
        j = int(np.searchsorted(cum, target, side="right")) - 1
        j = min(max(j, 0), len(groups) - 1)
        span = int(gmax[j] - gmin[j]) + 1
        frac = (target - cum[j]) / max(int(gcount[j]), 1)
        cut = int(gmin[j]) + int(round(frac * span))
        cut = min(max(cut, int(gmin[j])), int(gmax[j]) + 1)
        out[i - 1] = (int(groups[j]) << shift) + cut
    return np.maximum.accumulate(out)      # enforce monotone boundaries


@ray.remote
def _summarize_task(tbl: pa.Table, key: str, low_bits: int) -> dict:
    return _block_summary(tbl, key, low_bits)


def _split_block(tbl: pa.Table, key: str, bounds: np.ndarray):
    """Locally sort a block by ``key`` and slice it at ``bounds``;
    returns one (possibly empty) table per output partition."""
    k = tbl[key].to_numpy().astype(np.int64)
    order = np.argsort(k, kind="stable")
    tbl = tbl.take(pa.array(order))
    ks = k[order]
    cuts = np.searchsorted(ks, bounds, side="left")
    lo = np.concatenate([[0], cuts])
    hi = np.concatenate([cuts, [len(ks)]])
    parts = []
    for a, b in zip(lo, hi):
        parts.append(tbl.slice(int(a), int(b - a)).combine_chunks())
    return tuple(parts) if len(parts) > 1 else parts[0]


@ray.remote
def _merge_task(key: str, *parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    if not live:
        return parts[0]
    t = pa.concat_tables(live)
    k = t[key].to_numpy().astype(np.int64)
    return t.take(pa.array(np.argsort(k, kind="stable")))


def analytic_range_exchange(ds: "ray.data.Dataset", key: str,
                            low_bits: int,
                            n_parts: int | None = None) -> "ray.data.Dataset":
    """Drop-in replacement for ``ds.sort(key)`` on a packed
    hash-structured int64 key (see module docstring)."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    n_parts = n_parts or len(refs)
    if n_parts <= 1 or mat.count() == 0:
        return mat.sort(key)
    summaries = ray.get([_summarize_task.remote(r, key, low_bits)
                         for r in refs])
    bounds = _boundaries(summaries, n_parts)
    split = ray.remote(num_returns=n_parts)(_split_block)
    outs = [split.remote(r, key, bounds) for r in refs]
    merged = [_merge_task.remote(key, *[outs[b][p] for b in range(len(refs))])
              for p in range(n_parts)]
    return ray.data.from_arrow_refs(merged)
