"""Fourth batch of relational/text operators (round-5 widening).

Same discipline as ``relational.py``..``relational3.py``: money in
integer cents, floats only as deterministic basis-point integers
derived from exact integer sums, partial aggregation inside
``map_batches`` before any shuffle.

New operator families this module adds:

- **grouped Pearson correlation** — six-sum monoid partials
  (n, Σx, Σy, Σx², Σy², Σxy) per batch, ONE tiny groupby, and the
  correlation emitted as basis points computed from the exact integer
  sums with an identical floor(x·10⁴ + 0.5) on both engines (DuckDB
  ``round()`` is half-away-from-zero while numpy is half-to-even, so
  neither engine's ``round`` is used);
- **exact grouped median / MAD via value-frequency compression** —
  the scale-right EXACT median shape: aggregate (group, value)
  counts first (bounded by the value domain, not the row count),
  then select the quantile by cumulative counts per group; MAD
  repeats the trick on |value − median| with the 5-row median map
  broadcast.  No per-group row materialization anywhere;
- **per-language vocabulary stats** — total and DISTINCT word counts:
  words are deduped per batch BEFORE the shuffle, so the exchange
  carries (lang, word) pairs bounded by the batch vocabulary, not the
  token count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .queries import register
from .relational import _cents, _read

# ----------------------------------------------------- grouped correlation


def q_lineitem_corr(sf_dir: str):
    """Pearson correlation of quantity vs extended price per
    (l_returnflag, l_linestatus), in basis points.

    x = l_quantity (exact int), y = round(l_extendedprice) whole
    dollars (dollars, not cents, keep Σy² inside int64 out to ~sf100;
    the docstring budget: |y|≤10⁶ ⇒ Σy² ≤ 10¹² per 1e6-row group-block,
    int64 overflows past ~9·10⁶ such blocks — re-widen to two-level
    sums before that).  Per batch: SIX integer sums per group (a
    monoid), so the shuffle carries one row per (block × group); the
    final ratio is computed from the exact BIGINT sums in DOUBLE with
    the same expression shape on both engines and floored to basis
    points."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].cast(pa.int64())
        y = pc.cast(pc.round(t["l_extendedprice"]), pa.int64())
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        }).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "n", "sx", "sy", "sxx", "syy", "sxy"])

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = cov / np.sqrt(vx * vy)
        bp = np.floor(corr * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"],
                         "n": t["n"].cast(pa.int64()),
                         "corr_bp": pa.array(bp)})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxx", alias_name="sxx"),
                         Sum("syy", alias_name="syy"),
                         Sum("sxy", alias_name="sxy"))
              .map_batches(finalize, batch_format="pyarrow"))


SQL_LINEITEM_CORR = """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem),
s AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM b GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
       CAST(floor(
         (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
         / sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy))
         * 10000 + 0.5) AS BIGINT) AS corr_bp
FROM s
"""


# ------------------------------------- exact grouped median/MAD (compressed)


def _median_from_counts(c: np.ndarray, n: np.ndarray) -> int:
    """Lower median (DuckDB ``quantile_disc(0.5)``: sorted index
    ⌊(N−1)/2⌋) from a (value, count) frequency table."""
    order = np.argsort(c, kind="stable")
    c, n = c[order], n[order]
    total = int(n.sum())
    k = (total - 1) // 2
    cum = np.cumsum(n)
    return int(c[np.searchsorted(cum, k, side="right")])


def q_orders_mad(sf_dir: str):
    """Exact median and median-absolute-deviation of the order total
    (cents) per o_orderpriority.

    Exact quantiles don't need per-group row materialization: pass 1
    aggregates (priority, cents) COUNTS — bounded by the value DOMAIN
    (≲6·10⁷ distinct cents at any corpus size), not the row count —
    and picks the lower median per group from the cumulative counts
    inside ``map_groups`` over the compressed table.  Pass 2 broadcasts
    the ≤5-row median map and repeats the same compression on
    |cents − median|.  Two keyed shuffles of compressed values total;
    matches DuckDB ``quantile_disc(0.5)`` exactly."""
    from ray.data.aggregate import Sum

    def counts(col_name: str, derive):
        ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

        def partial(t: pa.Table) -> pa.Table:
            v = derive(t)
            g = pa.table({"pr": t["o_orderpriority"], "c": v}) \
                  .group_by(["pr", "c"]).aggregate([("c", "count")])
            return g.rename_columns(["pr", "c", "n"])

        return (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(["pr", "c"])
                  .aggregate(Sum("n", alias_name="n")))

    def pick_median(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"pr": pa.array([], pa.string()),
                             "med": pa.array([], pa.int64())})
        med = _median_from_counts(g["c"].to_numpy(), g["n"].to_numpy())
        return pa.table({"pr": [g["pr"][0].as_py()],
                         "med": pa.array([med], pa.int64())})

    cents_counts = counts("c", lambda t: _cents(t["o_totalprice"]))
    med_tbl = (cents_counts.groupby("pr").map_groups(
        pick_median, batch_format="pyarrow"))
    # ≤5 rows (one per priority) — bounded driver pull, then broadcast
    med_map = {r["pr"]: r["med"] for r in med_tbl.take_all()}

    dev_counts = counts("c", lambda t: pc.abs(pc.subtract(
        _cents(t["o_totalprice"]),
        pa.array(np.array([med_map[p] for p in
                           t["o_orderpriority"].to_pylist()],
                          dtype=np.int64)))))

    def pick_mad(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"pr": pa.array([], pa.string()),
                             "mad_cents": pa.array([], pa.int64())})
        mad = _median_from_counts(g["c"].to_numpy(), g["n"].to_numpy())
        return pa.table({"pr": [g["pr"][0].as_py()],
                         "mad_cents": pa.array([mad], pa.int64())})

    mad_tbl = dev_counts.groupby("pr").map_groups(
        pick_mad, batch_format="pyarrow")

    def attach_med(t: pa.Table) -> pa.Table:
        med = pa.array(np.array([med_map[p] for p in t["pr"].to_pylist()],
                                dtype=np.int64))
        return t.append_column("med_cents", med)

    return mad_tbl.map_batches(attach_med, batch_format="pyarrow")


SQL_ORDERS_MAD = """
WITH c AS (
  SELECT o_orderpriority AS pr,
         CAST(round(o_totalprice*100) AS BIGINT) AS c
  FROM orders),
m AS (
  SELECT pr, quantile_disc(c, 0.5) AS med FROM c GROUP BY pr)
SELECT c.pr,
       CAST(quantile_disc(abs(c.c - m.med), 0.5) AS BIGINT) AS mad_cents,
       CAST(m.med AS BIGINT) AS med_cents
FROM c JOIN m USING (pr)
GROUP BY c.pr, m.med
"""


# ------------------------------------------------------ vocabulary stats


def q_text_vocabulary(sf_dir: str):
    """Total and DISTINCT word counts per language over ``documents``.

    The dedup happens in two stages so the shuffle never carries raw
    tokens: each batch splits vectorially (Arrow ``split_pattern``),
    emits its per-batch DISTINCT (lang, word) pairs plus a per-batch
    total-count partial; the global distinct then costs ONE keyed
    shuffle bounded by the batch-level vocabulary (Heaps'-law sublinear
    in tokens), and totals ride a tiny sum-monoid groupby."""
    from ray.data.aggregate import Count, Sum

    def pairs(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        n_per = pc.list_value_length(words).to_numpy().astype(np.int64)
        lang = np.repeat(np.asarray(t["lang"].to_pylist(), dtype=object),
                         n_per)
        flat = words.combine_chunks().flatten()
        keep = pc.not_equal(flat, "")
        tbl = pa.table({"lang": pa.array(lang, pa.string()), "word": flat}) \
                .filter(keep)
        return tbl.group_by(["lang", "word"]).aggregate([("word", "count")]) \
                  .rename_columns(["lang", "word", "n"])

    per_batch = _read(sf_dir, "documents", ["lang", "text"]) \
        .map_batches(pairs, batch_format="pyarrow")
    # totals: sum the per-batch counts (monoid) — one tiny groupby
    totals = per_batch.groupby("lang").aggregate(Sum("n", alias_name="n_words"))
    # distinct: dedupe pairs globally, then count per lang
    vocab = (per_batch.groupby(["lang", "word"])
             .aggregate(Sum("n", alias_name="n"))
             .groupby("lang").aggregate(Count(alias_name="n_vocab")))
    # both sides are ≤ n_langs rows — bounded pull, joined in-memory
    tot_map = {r["lang"]: r["n_words"] for r in totals.take_all()}

    def attach(t: pa.Table) -> pa.Table:
        tw = pa.array(np.array([tot_map[v] for v in t["lang"].to_pylist()],
                               dtype=np.int64))
        return pa.table({"lang": t["lang"],
                         "n_words": tw,
                         "n_vocab": t["n_vocab"].cast(pa.int64())})

    return vocab.map_batches(attach, batch_format="pyarrow")


SQL_TEXT_VOCABULARY = """
WITH w AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT lang, COUNT(*) AS n_words, COUNT(DISTINCT word) AS n_vocab
FROM w WHERE word <> '' GROUP BY lang
"""


# -------------------------------------------------------------- registration
register("rel_lineitem_corr", q_lineitem_corr, SQL_LINEITEM_CORR)
register("rel_orders_mad", q_orders_mad, SQL_ORDERS_MAD)
register("text_vocabulary", q_text_vocabulary, SQL_TEXT_VOCABULARY)


# ----------------------------------------------- corpus split / budgeting


def q_corpus_split(sf_dir: str):
    """Deterministic train/val/test assignment (80/10/10 by
    doc_id mod 10 — the reproducible-split recipe every training
    pipeline needs) with per-(lang, split) counts.  Pure map + one tiny
    groupby; the assignment is a total function of the key, so
    re-running on a grown corpus never reshuffles old docs between
    splits."""
    from ray.data.aggregate import Count
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        m = t["doc_id"].to_numpy().astype(np.int64) % 10
        split = np.where(m < 8, "train", np.where(m == 8, "val", "test"))
        return pa.table({"lang": t["lang"],
                         "split": pa.array(split, pa.string())})

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby(["lang", "split"])
            .aggregate(Count(alias_name="n_docs")))


SQL_CORPUS_SPLIT = """
SELECT lang,
       CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


def q_budget_sample(sf_dir: str):
    """Per-language char-budget selection: keep documents in doc_id
    order until each language's running character total exceeds the
    budget (the 'first N chars per language' corpus-sizing recipe).

    One hash-bucket shuffle keyed by lang, one lexsort + cumsum per
    bucket — the budgeted-prefix flavor of a window frame (cumulative
    SUM ... <= budget), reported as per-lang kept counts."""
    from ray.data.aggregate import Sum
    from ..functions.hashing import hash64
    BUDGET = 50_000
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64(t["lang"].combine_chunks()) % np.uint64(16)) \
            .astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def keep_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n_docs_kept": pa.array([], pa.int64()),
                             "n_chars_kept": pa.array([], pa.int64())})
        lang = np.asarray(g["lang"].to_pylist(), dtype=object)
        did = g["doc_id"].to_numpy().astype(np.int64)
        nch = g["n_chars"].to_numpy().astype(np.int64)
        order = np.lexsort((did, lang))
        lang, did, nch = lang[order], did[order], nch[order]
        starts = np.concatenate([[0], np.nonzero(lang[1:] != lang[:-1])[0] + 1])
        cum = np.cumsum(nch)
        base = np.repeat(np.concatenate([[0], cum[starts[1:] - 1]]),
                         np.diff(np.concatenate([starts, [len(lang)]])))
        run_cum = cum - base
        keep = run_cum <= BUDGET
        out_l, out_n, out_c = [], [], []
        bounds = np.concatenate([starts, [len(lang)]])
        for i in range(len(starts)):
            sl = slice(bounds[i], bounds[i + 1])
            out_l.append(lang[sl][0])
            out_n.append(int(keep[sl].sum()))
            out_c.append(int(run_cum[sl][keep[sl]][-1]) if keep[sl].any() else 0)
        return pa.table({"lang": pa.array(out_l, pa.string()),
                         "n_docs_kept": pa.array(np.array(out_n, np.int64)),
                         "n_chars_kept": pa.array(np.array(out_c, np.int64))})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(keep_bucket, batch_format="pyarrow")
            .select_columns(["lang", "n_docs_kept", "n_chars_kept"]))


SQL_BUDGET_SAMPLE = """
WITH w AS (
  SELECT lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS run
  FROM documents)
SELECT lang, COUNT(*) FILTER (WHERE run <= 50000) AS n_docs_kept,
       CAST(COALESCE(MAX(run) FILTER (WHERE run <= 50000), 0) AS BIGINT)
         AS n_chars_kept
FROM w GROUP BY lang
"""

register("text_corpus_split", q_corpus_split, SQL_CORPUS_SPLIT)
register("text_budget_sample", q_budget_sample, SQL_BUDGET_SAMPLE)
