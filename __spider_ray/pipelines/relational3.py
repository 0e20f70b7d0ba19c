"""Third batch of relational operators (round-4 widening).

Same discipline as ``relational.py`` / ``relational2.py``: money in
integer cents, per-key ordered logic via hash-bucket shuffle + ONE
vectorized lexsort per bucket, dims broadcast, corpus joins through
``functions.joins.hash_join``.

New operator families this module adds:

- **rank / dense_rank windows** (per-user value ranking with ties —
  complements the existing row_number top-k and ntile);
- **bloom-accelerated semi-join**: a distributed-built bloom bitmap
  broadcast in front of the exact partitioned semi join — the
  standard shuffle-pruning pattern for corpus-scale ``EXISTS``
  (result is exact; the bloom only prunes what ships);
- **string-similarity join** (Levenshtein ≤ k over the distinct-name
  vocabulary) with LOSSLESS length-band blocking and a fully
  vectorized cummin-recurrence edit-distance kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import hash64_ints
from ..functions.joins import hash_join
from ..state.bloom import BloomFilter
from .queries import register
from .relational import _cents, _read

# ------------------------------------------------------------- rank windows


def q_events_rank(sf_dir: str):
    """rank() and dense_rank() per user over value DESC — the tied-rank
    complement of the row_number top-k (``q_orders_topk``) and ntile
    (``relational2``).  Hash-bucket by user (all rows of a user meet in
    one bucket), one lexsort per bucket, then both ranks fall out of
    two vectorized run-boundary scans: rank = run-start offset within
    the user group + 1, dense_rank = run ordinal within the group.
    Ties are real here (value is in cents; users repeat amounts), so
    rank ≠ row_number and the oracle exercises the tie semantics."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64_ints(t["user_id"].to_numpy().astype(np.uint64))
             % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def rank_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        if not len(uid):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64()),
                             "drnk": pa.array([], pa.int64())})
        order = np.lexsort((eid, -v, uid))
        u, e_, v_ = uid[order], eid[order], v[order]
        n = len(u)
        pos = np.arange(n)
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_run = new_user | np.r_[True, v_[1:] != v_[:-1]]
        gstart = np.maximum.accumulate(np.where(new_user, pos, 0))
        rstart = np.maximum.accumulate(np.where(new_run, pos, 0))
        rnk = rstart - gstart + 1
        run_id = np.cumsum(new_run)
        drnk = run_id - run_id[gstart] + 1
        return pa.table({"event_id": pa.array(e_),
                         "user_id": pa.array(u),
                         "rnk": pa.array(rnk.astype(np.int64)),
                         "drnk": pa.array(drnk.astype(np.int64))})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: rank_bucket(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_EVENTS_RANK = """
WITH w AS (
  SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS v FROM events)
SELECT event_id, user_id,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY v DESC) AS BIGINT)
         AS rnk,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY v DESC) AS BIGINT)
         AS drnk
FROM w
"""


# ------------------------------------------------------ bloom semi-join
SEMI_QTY = 45.0
SEMI_DISC = 0.05
_BLOOM_BITS = 1 << 20          # 128 KiB bitmap; size to expected keys


def q_orders_semi_bloom(sf_dir: str):
    """Orders with ≥1 heavily-discounted bulk lineitem — the same
    EXISTS semantics as a plain semi join, executed with the
    corpus-scale plan: build a bloom bitmap over the qualifying key
    set DISTRIBUTED (one partial bitmap per block, OR-reduced on the
    driver — bounded by bitmap-size × block-count, never by key
    count), broadcast the ~128 KiB bitmap into a stateless probe over
    the big side, and send only the surviving ~FP-inflated fraction
    through the exact partitioned semi ``hash_join``.  The result is
    EXACT — bloom false positives are removed by the verify join; the
    bloom only prunes what the shuffle ships (at 10 bits/key a
    1e9-key filter is ~1.2 GB, still broadcastable, vs shuffling the
    full orders table).  The qualifying-key lineage executes twice
    (bloom build + verify side) — two cheap column-pruned scans
    instead of one materialization, the right trade when the key set
    is corpus-sized."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_discount"])

    def qualifying(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_quantity"], SEMI_QTY),
                    pc.greater_equal(t["l_discount"], SEMI_DISC))
        return pa.table({"o_orderkey": t.filter(m)["l_orderkey"]})

    keys = li.map_batches(qualifying, batch_format="pyarrow")

    def partial_bits(t: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits=_BLOOM_BITS, k=7)
        f.add(hash64_ints(t["o_orderkey"].to_numpy().astype(np.uint64)))
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for b in (keys.map_batches(partial_bits, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
        for buf in b["bits"].to_pylist():
            bits |= np.frombuffer(buf, dtype=np.uint8)
    blob = bits.tobytes()

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def probe(t: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits=_BLOOM_BITS, k=7)
        f.bits = np.frombuffer(blob, dtype=np.uint8)
        m = f.contains(hash64_ints(t["o_orderkey"].to_numpy().astype(np.uint64)))
        t = t.filter(pa.array(m))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "price_cents": _cents(t["o_totalprice"])})

    survivors = orders.map_batches(probe, batch_format="pyarrow")
    return hash_join(survivors, keys, on=["o_orderkey"], how="semi")


SQL_ORDERS_SEMI_BLOOM = f"""
SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_quantity >= {SEMI_QTY}
                AND l.l_discount >= {SEMI_DISC})
"""


# ------------------------------------------------- string-similarity join
SIM_K = 2          # edit-distance threshold

_EMPTY_PAIRS = pa.table({"name_a": pa.array([], pa.string()),
                         "name_b": pa.array([], pa.string()),
                         "dist": pa.array([], pa.int64())})


def levenshtein_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for P (a[i], b[i]) pairs at once.

    Classic DP, but the row recurrence's sequential left-to-right
    dependency (``cur[j-1] + 1``) is folded into a vectorized
    ``np.minimum.accumulate`` over ``tent[j] - j`` (insertions only
    propagate rightward, +1 per column), so the whole kernel is
    max-len row iterations of O(P × len) numpy — no per-pair Python.
    Padding is safe: pair p's answer is captured at row ``len(a_p)``,
    column ``len(b_p)``; garbage beyond either bound only flows
    rightward/downward of the capture point."""
    P = len(a)
    if P == 0:
        return np.empty(0, dtype=np.int64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    La, Lb = int(la.max()), int(lb.max())
    Am = np.zeros((P, max(La, 1)), dtype=np.uint32)
    Bm = np.zeros((P, max(Lb, 1)), dtype=np.uint32)
    for p, s in enumerate(a):
        Am[p, :len(s)] = np.fromiter(map(ord, s), np.uint32, len(s))
    for p, s in enumerate(b):
        Bm[p, :len(s)] = np.fromiter(map(ord, s), np.uint32, len(s))
    cols = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(cols, (P, Lb + 1)).copy()
    res = np.full(P, -1, dtype=np.int64)
    done = la == 0
    res[done] = lb[done]
    for i in range(1, La + 1):
        cost = (Am[:, i - 1:i] != Bm[:, :Lb]).astype(np.int64)   # (P, Lb)
        tent = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        arr = np.concatenate([np.full((P, 1), i, dtype=np.int64), tent], axis=1)
        cur = np.minimum.accumulate(arr - cols, axis=1) + cols
        cap = la == i
        if cap.any():
            res[cap] = cur[cap, lb[cap]]
        prev = cur
    return res


def q_part_name_pairs(sf_dir: str, k: int = SIM_K):
    """String-similarity join: all pairs of DISTINCT part names within
    Levenshtein distance k — vocabulary matching, the string analog of
    the embedding near-dup family.  Joining the vocabulary (not the
    rows) keeps the output linear in distinct values instead of
    quadratic in duplicated rows.

    Blocking is LOSSLESS: distance ≤ k ⇒ |len(a)−len(b)| ≤ k, so each
    name is emitted to bands ``len−k .. len`` and a pair is verified
    exactly once, in band ``min(len_a, len_b)``.  Within a band the
    candidate set is all pairs over that 3-length window of the
    vocabulary — bounded by names-per-length, not the corpus (at a
    100 TB corpus, sub-block hot bands by a positional q-gram count
    filter, which is likewise lossless).  Verification is the
    vectorized ``levenshtein_pairs`` kernel."""
    ds = _read(sf_dir, "part", ["p_name"])
    names = (ds.groupby("p_name").count()
               .select_columns(["p_name"]))          # distributed distinct

    def to_bands(t: pa.Table) -> pa.Table:
        nm = t["p_name"]
        ln = pc.utf8_length(nm).to_numpy().astype(np.int64)
        parts = []
        for d in range(k + 1):
            b = ln - d
            # band 0 is real: an empty name (len 0) lives there, and
            # pairs ('', x) with len(x) <= k are verified in band
            # min(len)=0 — dropping it would silently diverge from the
            # SQL oracle if the vocabulary ever contains ''
            m = b >= 0
            parts.append(pa.table({"p_name": nm.filter(pa.array(m)),
                                   "band": pa.array(b[m]),
                                   "length": pa.array(ln[m])}))
        return pa.concat_tables(parts)

    def pair_verify(g: pa.Table) -> pa.Table:
        nm = g["p_name"].to_pylist()
        ln = g["length"].to_numpy()
        band = int(g["band"][0].as_py())
        n = len(nm)
        if n < 2:
            return _EMPTY_PAIRS
        i, j = np.triu_indices(n, 1)
        mn = np.minimum(ln[i], ln[j])
        mx = np.maximum(ln[i], ln[j])
        keep = (mn == band) & (mx - mn <= k)         # meet-once + len gate
        i, j = i[keep], j[keep]
        if not len(i):
            return _EMPTY_PAIRS
        a = [nm[x] for x in i]
        b = [nm[x] for x in j]
        dist = levenshtein_pairs(a, b)
        ok = dist <= k
        na = [min(x, y) for x, y, o in zip(a, b, ok) if o]
        nb = [max(x, y) for x, y, o in zip(a, b, ok) if o]
        return pa.table({"name_a": pa.array(na, pa.string()),
                         "name_b": pa.array(nb, pa.string()),
                         "dist": pa.array(dist[ok])})

    return (names.map_batches(to_bands, batch_format="pyarrow")
                 .groupby("band")
                 .map_groups(pair_verify, batch_format="pyarrow"))


SQL_PART_NAME_PAIRS = f"""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {SIM_K}
"""


# ------------------------------------------------------ winsorized mean
def q_events_winsorized(sf_dir: str):
    """Robust (winsorized) grouped aggregate: per event type, the sum
    of value clamped to the group's [p5, p95] — the outlier-resistant
    mean's integer-exact components (n_rows, sum_clamped_cents).
    Single hash-bucket shuffle; per bucket ONE lexsort yields the
    quantile cuts (same quantile_disc rank rule as
    ``q_events_quantiles``: smallest element with rank/n ≥ q), then
    the clamp + segment sums are np.clip / np.add.reduceat — the SQL
    oracle needs a quantile CTE + re-join that the engine fuses into
    one pass."""
    from ..functions.hashing import hash64
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        key = t["event_type"].combine_chunks() \
            if isinstance(t["event_type"], pa.ChunkedArray) else t["event_type"]
        b = (hash64(key) % np.uint64(16)).astype(np.int64)
        return pa.table({"event_type": key, "value_c": _cents(t["value"]),
                         "bucket": pa.array(b)})

    def win_bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "sum_clamped_cents": pa.array([], pa.int64())})
        denc = pc.dictionary_encode(g["event_type"].combine_chunks())
        codes = np.asarray(denc.indices).astype(np.int64)
        vc = np.asarray(g["value_c"].combine_chunks()).astype(np.int64)
        order = np.lexsort((vc, codes))
        c_, v_ = codes[order], vc[order]
        starts = np.nonzero(np.r_[True, c_[1:] != c_[:-1]])[0]
        counts = np.diff(np.append(starts, len(c_)))
        lo = v_[starts + np.ceil(0.05 * counts).astype(np.int64) - 1]
        hi = v_[starts + np.ceil(0.95 * counts).astype(np.int64) - 1]
        clamped = np.clip(v_, np.repeat(lo, counts), np.repeat(hi, counts))
        return pa.table({
            "event_type": denc.dictionary.take(pa.array(c_[starts], pa.int32())),
            "n_rows": pa.array(counts.astype(np.int64)),
            "sum_clamped_cents": pa.array(
                np.add.reduceat(clamped, starts).astype(np.int64))})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: win_bucket(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_EVENTS_WINSORIZED = """
WITH w AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events),
q AS (
  SELECT event_type, quantile_disc(v, 0.05) AS lo, quantile_disc(v, 0.95) AS hi
  FROM w GROUP BY event_type)
SELECT w.event_type, COUNT(*) AS n_rows,
       CAST(SUM(LEAST(GREATEST(w.v, q.lo), q.hi)) AS BIGINT)
         AS sum_clamped_cents
FROM w JOIN q USING (event_type)
GROUP BY w.event_type
"""


# --------------------------------------------------- running distinct
def q_events_running_distinct(sf_dir: str):
    """Cumulative COUNT(DISTINCT event_type) per user in event-time
    order — the running-vocabulary window (SQL has no windowed
    COUNT(DISTINCT); both sides express it as a first-occurrence flag
    summed over the ordered frame).  One hash-bucket shuffle by user;
    per bucket: lexsort to (user, ts, event_id) order, a second STABLE
    lexsort by (user, type) marks each (user, type)'s first sighting
    (stability preserves time order within the pair), scatter the
    flags back, then a per-user segmented cumsum."""
    from ..functions.hashing import hash64_ints
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64_ints(t["user_id"].to_numpy().astype(np.uint64))
             % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def rd_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if not n:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "n_distinct_types": pa.array([], pa.int64())})
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        code = np.asarray(pc.dictionary_encode(
            g["event_type"].combine_chunks()).indices).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, t_, e_, c_ = uid[order], ts[order], eid[order], code[order]
        o2 = np.lexsort((c_, u))               # stable: keeps time order
        fst2 = np.r_[True, (u[o2][1:] != u[o2][:-1]) | (c_[o2][1:] != c_[o2][:-1])]
        fst = np.empty(n, dtype=np.int64)
        fst[o2] = fst2.astype(np.int64)
        cs = np.cumsum(fst)
        starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        base = cs[starts] - fst[starts]
        nd = cs - np.repeat(base, np.diff(np.append(starts, n)))
        return pa.table({"event_id": pa.array(e_),
                         "user_id": pa.array(u),
                         "n_distinct_types": pa.array(nd)})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: rd_bucket(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_EVENTS_RUNNING_DISTINCT = """
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS fst
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(fst) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_distinct_types
FROM w
"""


# ----------------------------------------------------- grouped histogram
HIST_K = 8


def q_events_histogram(sf_dir: str, k: int = HIST_K):
    """Equi-width value histogram per event type — the two-pass +
    broadcast report shape: pass 1 is a grouped min/max (aggregate
    rows only), whose tiny result broadcasts into pass 2's stateless
    bucket-assignment (`((v − mn)·k) // (mx − mn + 1)`, integer-exact
    in both engines), pre-counted per batch and sum-merged.  Facts
    cross the wire once, as (type, bucket, n) partials."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def minmax_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"event_type": t["event_type"],
                       "v": _cents(t["value"])})
               .group_by("event_type").aggregate([("v", "min"), ("v", "max")]))
        return g.rename_columns(["event_type", "mn", "mx"])

    from ray.data.aggregate import Max, Min
    m = (ds.map_batches(minmax_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
           .to_pandas())                       # group-count-bounded
    mn = dict(zip(m["event_type"], m["mn"].astype(np.int64)))
    mx = dict(zip(m["event_type"], m["mx"].astype(np.int64)))

    def bucket_partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        v = _cents(t["value"]).to_numpy()
        denc = pc.dictionary_encode(et)       # bounds looked up per TYPE
        dvals = denc.dictionary.to_pylist()   # (≤ #groups), then gathered
        codes = np.asarray(denc.indices).astype(np.int64)
        lo = np.array([mn[x] for x in dvals], dtype=np.int64)[codes]
        hi = np.array([mx[x] for x in dvals], dtype=np.int64)[codes]
        b = ((v - lo) * k) // (hi - lo + 1)
        g = (pa.table({"event_type": et, "bucket": pa.array(b)})
               .group_by(["event_type", "bucket"])
               .aggregate([([], "count_all")]))
        return g.rename_columns(["event_type", "bucket", "n"])

    return (ds.map_batches(bucket_partial, batch_format="pyarrow")
              .groupby(["event_type", "bucket"])
              .aggregate(Sum("n", alias_name="n")))


SQL_EVENTS_HISTOGRAM = f"""
WITH w AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events),
m AS (SELECT event_type, min(v) AS mn, max(v) AS mx FROM w GROUP BY event_type)
SELECT w.event_type, (w.v - m.mn) * {HIST_K} // (m.mx - m.mn + 1) AS bucket,
       COUNT(*) AS n
FROM w JOIN m USING (event_type)
GROUP BY w.event_type, bucket
"""


# --------------------------------------------- percent_rank / cume_dist
def q_events_rank_pct(sf_dir: str):
    """percent_rank and cume_dist per user over value DESC, exposed as
    integer basis points (floor-div — associative, identical in
    DuckDB) so floats never reach the oracle hash.  Same bucket +
    lexsort shape as ``q_events_rank``; the extra work is the per-row
    run END (ties' last index), which gives cume_dist's ≥-count
    without a second pass."""
    from ..functions.hashing import hash64_ints
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64_ints(t["user_id"].to_numpy().astype(np.uint64))
             % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def pct_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        if not len(uid):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "pr_bp": pa.array([], pa.int64()),
                             "cd_bp": pa.array([], pa.int64())})
        order = np.lexsort((eid, -v, uid))
        u, e_, v_ = uid[order], eid[order], v[order]
        n = len(u)
        pos = np.arange(n)
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_run = new_user | np.r_[True, v_[1:] != v_[:-1]]
        gstart = np.maximum.accumulate(np.where(new_user, pos, 0))
        rstart = np.maximum.accumulate(np.where(new_run, pos, 0))
        gidx = np.nonzero(new_user)[0]
        ridx = np.nonzero(new_run)[0]
        g_id = np.cumsum(new_user) - 1
        r_id = np.cumsum(new_run) - 1
        gend = np.append(gidx[1:], n)[g_id] - 1      # per-row group end
        rend = np.append(ridx[1:], n)[r_id] - 1      # per-row tie-run end
        n_grp = gend - gstart + 1
        rnk = rstart - gstart + 1
        cnt_ge = rend - gstart + 1
        pr_bp = np.where(n_grp > 1,
                         (rnk - 1) * 10000 // np.maximum(n_grp - 1, 1), 0)
        cd_bp = cnt_ge * 10000 // n_grp
        return pa.table({"event_id": pa.array(e_),
                         "user_id": pa.array(u),
                         "pr_bp": pa.array(pr_bp.astype(np.int64)),
                         "cd_bp": pa.array(cd_bp.astype(np.int64))})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: pct_bucket(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_EVENTS_RANK_PCT = """
WITH w AS (
  SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS v FROM events),
r AS (
  SELECT event_id, user_id,
         rank() OVER (PARTITION BY user_id ORDER BY v DESC) AS rnk,
         count(*) OVER (PARTITION BY user_id ORDER BY v DESC
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cnt_ge,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM w)
SELECT event_id, user_id,
       CAST(CASE WHEN n > 1 THEN (rnk - 1) * 10000 // (n - 1)
                 ELSE 0 END AS BIGINT) AS pr_bp,
       CAST(cnt_ge * 10000 // n AS BIGINT) AS cd_bp
FROM r
"""


# -------------------------------------------------------------- registration
register("rel_events_rank", q_events_rank, SQL_EVENTS_RANK)
register("rel_events_rank_pct", q_events_rank_pct, SQL_EVENTS_RANK_PCT)
register("rel_events_histogram", q_events_histogram, SQL_EVENTS_HISTOGRAM)
register("rel_events_running_distinct", q_events_running_distinct,
         SQL_EVENTS_RUNNING_DISTINCT)
register("rel_events_winsorized", q_events_winsorized, SQL_EVENTS_WINSORIZED)
register("rel_orders_semi_bloom", q_orders_semi_bloom, SQL_ORDERS_SEMI_BLOOM)
register("rel_part_name_pairs", q_part_name_pairs, SQL_PART_NAME_PAIRS)
