"""Second batch of relational / window / similarity operators
(round 3 widening of SURVEY.md §2.5–§2.9 coverage).

Same discipline as ``relational.py``:

- money exact in integer cents; ratios exposed as integer basis points
  (``(a * 10_000) // b`` — associative, identical in DuckDB via ``//``);
- per-key ordered logic via hash-bucket shuffle + ONE vectorized
  lexsort per bucket (never one Python call per group);
- dims broadcast, corpus×corpus joins via ``functions.joins.hash_join``;
- every float the oracle would compare is either avoided (ranks,
  cents, bps) or threshold-filtered with a measured margin (see
  ``q_knn_range``).

New operator families this module adds:

- exact distributed **ntile** without a global sort (histogram-based
  rank selection — the classic distributed order-statistic pattern);
- **gaps-and-islands** (consecutive-day activity streaks);
- grouped **mode** with deterministic tie-break;
- **ratio-of-sums vs a window total** (market share per region);
- **stratified sampling** (per-stratum deterministic rates);
- cosine **range search** (all neighbors ≥ τ, the top-k dual).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from .queries import register
from .relational import _cents, _read

NTILE_T = 7     # deliberately not a divisor of the row count: proves
                # the remainder rule (first n%T tiles get the extra row)


# ---------------------------------------------------------------- ntile
def q_events_ntile(sf_dir: str, tiles: int = NTILE_T):
    """Exact global ntile over (value_cents, event_id) WITHOUT a global
    sort — the distributed order-statistic pattern:

    1. one streaming pass builds a value histogram (pre-aggregated per
       batch, then a tiny ``groupby``).  The histogram is bounded by
       the VALUE DOMAIN (distinct cents values), not the row count —
       ~18k rows at sf0.1 and O(price domain) at 100 TB, so collecting
       it on the driver is safe where collecting rows never is;
    2. the T−1 tile boundaries are positions in the cumulative
       histogram.  Boundaries interior to a value's run (only possible
       for values with multiplicity ≥ 2) are resolved to exact
       ``event_id``s by ONE extra filtered scan that keeps just the
       ≤ T−1 boundary values' rows, materialized small, then a
       sort+limit+max per cut over that subset — never the corpus;
    3. tile assignment is a broadcast of T−1 ``(value, last_event_id)``
       cut keys and a vectorized comparison per batch — no shuffle.

    Rows never leave their block; the only all-to-all is the
    domain-bounded histogram.  DuckDB oracle: ``ntile(T) OVER (ORDER BY
    value_cents, event_id)`` (remainder rows go to the FIRST tiles —
    mirrored by the divmod below, and exercised because T=7 does not
    divide the sf0.01 row count).
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def hist(t: pa.Table) -> pa.Table:
        g = pa.table({"value_cents": _cents(t["value"])}) \
              .group_by("value_cents").aggregate([("value_cents", "count")])
        return g.rename_columns(["value_cents", "n"])

    h = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby("value_cents").aggregate(Sum("n", alias_name="n"))
           .to_pandas())                       # value-domain-bounded
    h = h.sort_values("value_cents").reset_index(drop=True)
    counts = h["n"].to_numpy(dtype=np.int64)
    values = h["value_cents"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        # empty table: no cuts to resolve (cut_pos would be all zeros
        # and values[vi] would index an empty array) — every (zero)
        # row is tile 1, so just run the assign with no boundaries
        cut_v = np.empty(0, dtype=np.int64)
        cut_e = np.empty(0, dtype=np.int64)
        return _ntile_assign(ds, cut_v, cut_e)

    q_, r_ = divmod(n, tiles)
    sizes = np.array([q_ + 1 if i < r_ else q_ for i in range(tiles)],
                     dtype=np.int64)
    cut_pos = np.cumsum(sizes)[:-1]            # 1-based last row of tile i

    INT64_MAX = np.iinfo(np.int64).max
    cut_keys: list[tuple[int, int]] = []       # (value, last_event_id)
    interior: list[tuple[int, int, int]] = []  # (cut index, value, k)
    for ci, p in enumerate(cut_pos):
        vi = int(np.searchsorted(cum, p))      # first value with cum >= p
        v = int(values[vi])
        c_lt = int(cum[vi - 1]) if vi else 0
        k = int(p) - c_lt                      # k-th smallest event of v
        if k == int(counts[vi]):
            cut_keys.append((v, INT64_MAX))    # cut at end of the value run
        else:
            cut_keys.append((v, -1))           # placeholder, resolved below
            interior.append((ci, v, k))

    if interior:
        # ONE filtered scan resolves every interior cut: keep only rows
        # whose value is a boundary value (≤ T−1 values; with unique
        # values a cut is never interior, so this subset is the
        # boundary values' multiplicities — tiny), materialize it, then
        # a sort+limit+max per cut runs on that subset, not the corpus.
        bvals = pa.array(sorted({v for _, v, _ in interior}), pa.int64())

        def keep_boundary(t: pa.Table) -> pa.Table:
            vc = _cents(t["value"])
            m = pc.is_in(vc, value_set=bvals)
            return pa.table({"event_id": t.filter(m)["event_id"],
                             "value_cents": vc.filter(m)})

        sub = ds.map_batches(keep_boundary, batch_format="pyarrow") \
                .materialize()
        for ci, v, k in interior:
            kth = (sub.filter(expr=f"value_cents == {v}")
                      .sort("event_id").limit(k).max("event_id"))
            cut_keys[ci] = (v, int(kth))

    cut_v = np.array([c[0] for c in cut_keys], dtype=np.int64)
    cut_e = np.array([c[1] for c in cut_keys], dtype=np.int64)
    return _ntile_assign(ds, cut_v, cut_e)


def _ntile_assign(ds, cut_v: np.ndarray, cut_e: np.ndarray):
    """Broadcast the (≤ T−1) resolved cut keys and assign tiles with a
    per-row comparison against each boundary — rows never shuffle."""
    def assign(t: pa.Table) -> pa.Table:
        vc = np.asarray(_cents(t["value"].combine_chunks()))
        eid = t["event_id"].to_numpy()
        tile = np.ones(len(vc), dtype=np.int64)
        for v, e in zip(cut_v, cut_e):
            tile += ((vc > v) | ((vc == v) & (eid > e))).astype(np.int64)
        return pa.table({"event_id": pa.array(eid),
                         "value_cents": pa.array(vc),
                         "tile": pa.array(tile)})

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_EVENTS_NTILE = f"""
SELECT event_id, CAST(round(value*100) AS BIGINT) AS value_cents,
  CAST(ntile({NTILE_T}) OVER (ORDER BY CAST(round(value*100) AS BIGINT),
                              event_id) AS BIGINT) AS tile
FROM events
"""


# ------------------------------------------------------- gaps and islands
def streaks_kernel(uid: np.ndarray, day: np.ndarray) -> pa.Table:
    """Pure kernel (unit-tested): per user, count of distinct active
    days, number of consecutive-day streaks, and the longest streak.
    ``day`` is integer days-since-epoch; one lexsort handles every
    user in the bucket."""
    if not len(uid):
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_active_days": pa.array([], pa.int64()),
                         "n_streaks": pa.array([], pa.int64()),
                         "longest_streak": pa.array([], pa.int64())})
    order = np.lexsort((day, uid))
    u, d = uid[order], day[order]
    keep = np.empty(len(u), dtype=bool)        # distinct (user, day)
    keep[0] = True
    keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
    u, d = u[keep], d[keep]
    new_user = np.empty(len(u), dtype=bool)
    new_user[0] = True
    new_user[1:] = u[1:] != u[:-1]
    # a streak starts at a user boundary or a day gap > 1
    brk = np.empty(len(u), dtype=bool)
    brk[0] = True
    brk[1:] = new_user[1:] | ((d[1:] - d[:-1]) != 1)
    starts = np.nonzero(new_user)[0]
    n_days = np.diff(np.append(starts, len(u)))
    s_starts = np.nonzero(brk)[0]
    s_lens = np.diff(np.append(s_starts, len(u)))
    # per user: number of streaks and the max streak length
    user_of_streak = np.searchsorted(starts, s_starts, side="right") - 1
    n_streaks = np.bincount(user_of_streak, minlength=len(starts))
    longest = np.zeros(len(starts), dtype=np.int64)
    np.maximum.at(longest, user_of_streak, s_lens)
    return pa.table({"user_id": pa.array(u[starts]),
                     "n_active_days": pa.array(n_days.astype(np.int64)),
                     "n_streaks": pa.array(n_streaks.astype(np.int64)),
                     "longest_streak": pa.array(longest)})


def q_events_streaks(sf_dir: str):
    """Gaps-and-islands (§2.9): per user, active-day count, number of
    consecutive-day streaks, and longest streak — hash-bucket shuffle
    keyed by user, one vectorized kernel per bucket."""
    from ..functions.hashing import hash64_ints
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32()) \
                .cast(pa.int32())
        b = (hash64_ints(t["user_id"].to_numpy().astype(np.uint64))
             % np.uint64(64)).astype(np.int64)
        return pa.table({"user_id": t["user_id"], "day": day,
                         "bucket": pa.array(b)})

    def f(g: pa.Table) -> pa.Table:
        return streaks_kernel(g["user_id"].to_numpy(),
                              g["day"].to_numpy().astype(np.int64))

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: f(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_EVENTS_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events),
isl AS (
  SELECT user_id, d,
    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
             AS INTEGER) AS grp
  FROM days),
st AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM st GROUP BY user_id
"""


# ----------------------------------------------------------------- mode
def q_part_brand_mode(sf_dir: str):
    """Grouped mode with deterministic tie-break (count desc, brand
    asc) — DuckDB's bare ``mode()`` is order-dependent, so both sides
    spell the tie-break explicitly.  Counts pre-aggregate per batch;
    the argmax runs bucketed-vectorized on the (type, brand) aggregate,
    which is domain-bounded (|types| × |brands|), never row-bounded."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash64
    ds = _read(sf_dir, "part", ["p_type", "p_brand"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_type", "p_brand"]).aggregate([("p_brand", "count")])
        return g.rename_columns(["p_type", "p_brand", "n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["p_type", "p_brand"])
             .aggregate(Sum("n", alias_name="n")))

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64(t["p_type"].combine_chunks()) % np.uint64(16)) \
            .astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def mode_bucket(g: pa.Table) -> pa.Table:
        ty = np.asarray(g["p_type"].combine_chunks())
        br = np.asarray(g["p_brand"].combine_chunks())
        n = g["n"].to_numpy()
        order = np.lexsort((br, -n, ty))       # count desc, brand asc
        ty, br, n = ty[order], br[order], n[order]
        first = np.empty(len(ty), dtype=bool)
        first[0] = True
        first[1:] = ty[1:] != ty[:-1]
        return pa.table({"p_type": pa.array(ty[first], pa.string()),
                         "mode_brand": pa.array(br[first], pa.string()),
                         "n_parts": pa.array(n[first].astype(np.int64))})

    return (agg.map_batches(bucketize, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(lambda g: mode_bucket(g.drop_columns(["bucket"])),
                           batch_format="pyarrow"))


SQL_PART_BRAND_MODE = """
WITH c AS (SELECT p_type, p_brand, count(*) AS n FROM part GROUP BY 1, 2)
SELECT p_type, p_brand AS mode_brand, CAST(n AS BIGINT) AS n_parts
FROM c
QUALIFY row_number() OVER (PARTITION BY p_type ORDER BY n DESC, p_brand) = 1
"""


# -------------------------------------------------------- market share
def q_nation_market_share(sf_dir: str):
    """Ratio-of-sums vs a window total: each nation's share of its
    REGION's order revenue, in integer basis points (exact: cents are
    int64, share = cents·10⁴ // region_cents — `//` in DuckDB).

    Shape: orders pre-aggregated per custkey inside each batch, ONE
    partitioned hash_join against customer (both corpus-scale), then
    the 25-row nation⋈region dim applied broadcast (``index_in+take``)
    and a tiny two-level rollup; the share division runs inside a
    ``map_groups`` over the 25-row aggregate — nothing touches the
    driver."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def oprep(t: pa.Table) -> pa.Table:
        g = pa.table({"c_custkey": t["o_custkey"],
                      "cents": _cents(t["o_totalprice"])}) \
              .group_by("c_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["c_custkey", "cents"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cprep(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                         "n_nationkey": t["c_nationkey"].cast(pa.int64())})

    joined = hash_join(orders.map_batches(oprep, batch_format="pyarrow"),
                       cust.map_batches(cprep, batch_format="pyarrow"),
                       on=["c_custkey"], how="inner")

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    ridx = pc.index_in(nation["n_regionkey"].combine_chunks().cast(pa.int64()),
                       value_set=region["r_regionkey"].combine_chunks()
                                                      .cast(pa.int64()))
    nat_keys = nation["n_nationkey"].combine_chunks().cast(pa.int64())
    nat_names = nation["n_name"].combine_chunks()
    nat_rnames = pc.take(region["r_name"].combine_chunks(), ridx)

    def to_nation(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["n_nationkey"].combine_chunks().cast(pa.int64()),
                          value_set=nat_keys)
        g = pa.table({"n_name": pc.take(nat_names, idx),
                      "r_name": pc.take(nat_rnames, idx),
                      "cents": t["cents"]}) \
              .group_by(["n_name", "r_name"]).aggregate([("cents", "sum")])
        return g.rename_columns(["n_name", "r_name", "revenue_cents"])

    agg = (joined.map_batches(to_nation, batch_format="pyarrow")
                 .groupby(["n_name", "r_name"])
                 .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))

    def share(g: pa.Table) -> pa.Table:      # one group = one region (≤25 rows)
        cents = g["revenue_cents"].to_numpy().astype(np.int64)
        total = int(cents.sum())
        bps = (cents.astype(object) * 10_000) // total   # exact big-int
        return pa.table({"n_name": g["n_name"], "r_name": g["r_name"],
                         "revenue_cents": g["revenue_cents"],
                         "share_bps": pa.array(
                             np.array([int(b) for b in bps], dtype=np.int64))})

    return agg.groupby("r_name").map_groups(share, batch_format="pyarrow")


SQL_NATION_MARKET_SHARE = """
WITH nat AS (
  SELECT n_name, r_name,
    SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY n_name, r_name)
SELECT n_name, r_name, CAST(revenue_cents AS BIGINT) AS revenue_cents,
  CAST((revenue_cents * 10000) //
       SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_bps
FROM nat
"""


# ------------------------------------------------------ stratified sample
STRATA_PERMILLE = {"purchase": 500, "click": 80, "view": 20}
DEFAULT_PERMILLE = 100


def q_events_stratified(sf_dir: str):
    """Stratified deterministic sampling: each event_type keeps its own
    per-mille rate (rare strata oversampled — the class-balance pattern
    for training-data curation).  Same md5-bucket trick as
    ``q_events_sample`` so DuckDB reproduces the sample bit-for-bit;
    the engine's hot-path flavor would use ``functions.hashing.hash64``
    (vectorized) with the same CASE rates."""
    from ..functions.hashing import md5_hex
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def f(t: pa.Table) -> pa.Table:
        hexes = md5_hex(t["event_id"].to_pylist())   # oracle-parity helper
        buckets = np.array([int(h[:4], 16) for h in hexes], dtype=np.int64)
        et = np.asarray(t["event_type"].combine_chunks())
        rates = np.full(len(et), DEFAULT_PERMILLE, dtype=np.int64)
        for k, v in STRATA_PERMILLE.items():
            rates[et == k] = v
        t = t.filter(pa.array(buckets % 1000 < rates))
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "value_cents": _cents(t["value"])})

    return ds.map_batches(f, batch_format="pyarrow")


SQL_EVENTS_STRATIFIED = f"""
SELECT event_id, event_type,
  CAST(round(value*100) AS BIGINT) AS value_cents
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 1000
  < CASE event_type WHEN 'purchase' THEN {STRATA_PERMILLE['purchase']}
                    WHEN 'click' THEN {STRATA_PERMILLE['click']}
                    WHEN 'view' THEN {STRATA_PERMILLE['view']}
                    ELSE {DEFAULT_PERMILLE} END
"""


# ----------------------------------------------------------- range search
KNN_RANGE_TAU = 0.3


def q_knn_range(sf_dir: str, n_queries: int = 10, tau: float = KNN_RANGE_TAU):
    """Cosine RANGE search (the top-k dual): every corpus vector with
    cosine ≥ τ to any of the query vectors.  Pure streaming filter —
    broadcast query matrix, one matmul per batch, NO shuffle at all
    (top-k needed a merge; range search doesn't).

    Float-threshold discipline: the oracle recomputes the score in
    DuckDB float32 list kernels while we use float64 matmuls; measured
    cross-engine score deviation is ≤ 2e-7 and the nearest score to
    τ=0.3 on the driver tables is ≥ 5e-4 away — three orders of margin
    (tests assert the margin so a data regen that violates it fails
    loudly, not silently)."""
    from ..stages import knn as knn_mod
    # query matrix ships as a VALUE in the constructor kwargs (≤100 KiB
    # rides the actor-creation spec) — an ObjectRef here is the
    # restart-fragility of ray#53727 (see stages/knn.BruteForceTopK)
    queries = knn_mod.load_queries(sf_dir, n_queries)

    class RangeScorer:
        def __init__(self, queries, tau: float):
            self.q_ids, self.Q = queries
            self.tau = tau

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = knn_mod._embs(t)
            scores = knn_mod._normalize(m) @ self.Q.T     # (batch, nq)
            hit = scores >= self.tau
            hit &= ids[:, None] != self.q_ids[None, :]    # drop self-match
            vi, qi = np.nonzero(hit)
            return pa.table({
                "query_id": pa.array(self.q_ids[qi].astype(np.int64)),
                "vec_id": pa.array(ids[vi].astype(np.int64)),
            })

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(RangeScorer,
                          fn_constructor_kwargs={"queries": queries,
                                                 "tau": tau},
                          batch_format="pyarrow", batch_size=4096,
                          concurrency=2, num_cpus=0.5)


SQL_KNN_RANGE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT 10
)
SELECT q.query_id, e.vec_id
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> q.query_id
  AND list_cosine_similarity(e.embedding, q.qe) >= {KNN_RANGE_TAU}
"""


# -------------------------------------------------------------- registration
register("rel_events_ntile", q_events_ntile, SQL_EVENTS_NTILE)
register("rel_events_streaks", q_events_streaks, SQL_EVENTS_STREAKS)
register("rel_part_brand_mode", q_part_brand_mode, SQL_PART_BRAND_MODE)
register("rel_nation_market_share", q_nation_market_share,
         SQL_NATION_MARKET_SHARE)
register("rel_events_stratified", q_events_stratified, SQL_EVENTS_STRATIFIED)
register("knn_range_search", q_knn_range, SQL_KNN_RANGE)
