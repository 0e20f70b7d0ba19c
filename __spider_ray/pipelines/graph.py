"""Link-graph analytics over the crawl output — distributed PageRank.

The crawl's records induce a directed city graph (one edge per distinct
(from_city_code, to_city_code) pair).  PageRank over that graph is the
frontier-prioritization signal a web-scale crawler feeds back into its
priority queue (the reference's priority ordering is static; this is
the dynamic analog), and it exercises the one operator class the rest
of the repo lacks an ORACLE for: an iterative fixed-point algorithm as
repeated Dataset joins.

Exactness discipline: ranks are int64 scaled by 10^12 and every step
uses floor division — ``r' = (15·S)//(100·N) + (85·Σ r_u//outdeg_u)//100``
— so the Ray side and the DuckDB side (the same recurrence unrolled as
K CTE stages) produce bit-identical integers; no float-hashing hazard.

Scale shape: edges/ranks move through the same partitioned
``hash_join`` + grouped-sum shuffles as everything else; per-iteration
rank tables are materialized (they are O(nodes), never O(corpus) —
the documented bound).  Dangling nodes contribute nothing (rank leaks,
identically on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import hash64
from ..functions.joins import hash_join
from . import crawl

PR_SCALE = 10 ** 12
PR_ITERS = 5
_NB = 32


def _distinct_on(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Distinct rows by string key columns: hash-bucket shuffle + one
    vectorized sort/compare per bucket (collisions only route)."""
    def add_bucket(t: pa.Table) -> pa.Table:
        key = t[cols[0]].combine_chunks()
        for c in cols[1:]:
            key = pc.binary_join_element_wise(key, t[c], "\x1f")
        b = (hash64(key) % np.uint64(_NB)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def dedup(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in cols])
        s = g.take(idx)
        n = s.num_rows
        if n == 0:
            return s
        same = None
        for c in cols:
            a = s[c].combine_chunks()
            eq = pc.equal(a.slice(1), a.slice(0, n - 1))
            same = eq if same is None else pc.and_(same, eq)
        first = pa.concat_arrays([pa.array([True]),
                                  pc.invert(same).fill_null(True)])
        return s.filter(first)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(dedup, batch_format="pyarrow"))


def city_edges(sf_dir: str) -> ray.data.Dataset:
    recs = crawl.flight_records(sf_dir)
    proj = recs.map_batches(
        lambda t: pa.table({"u": t["from_city_code"],
                            "v": t["to_city_code"]}),
        batch_format="pyarrow")
    return _distinct_on(proj, ["u", "v"])


def q_city_pagerank(sf_dir: str, iters: int = PR_ITERS):
    edges = city_edges(sf_dir).materialize()      # O(city pairs), not corpus

    def count_group(g: pa.Table) -> pa.Table:
        if "bucket" in g.column_names:
            g = g.drop_columns(["bucket"])
        return pa.table({"u": g["u"][:1],
                         "outdeg": pa.array([g.num_rows], pa.int64())})

    deg = edges.groupby("u").map_groups(count_group, batch_format="pyarrow")
    edges_deg = hash_join(edges, deg, on=["u"], n_buckets=8).map_batches(
        lambda t: pa.table({"node": t["u"], "v": t["v"],
                            "outdeg": t["outdeg"]}),
        batch_format="pyarrow").materialize()   # loop-invariant: join once,
    #                                             not once per iteration

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()])})

    nodes = _distinct_on(edges.map_batches(both_ends, batch_format="pyarrow"),
                         ["node"]).materialize()
    n_nodes = nodes.count()
    base = (15 * PR_SCALE) // (100 * n_nodes)
    r0 = PR_SCALE // n_nodes

    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, r0, dtype=np.int64))),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = hash_join(edges_deg, ranks, on=["node"], n_buckets=8)

        def share(t: pa.Table) -> pa.Table:
            s = t["r"].to_numpy() // t["outdeg"].to_numpy()
            return pa.table({"node": t["v"], "s": pa.array(s)})

        def sum_group(g: pa.Table) -> pa.Table:
            if "bucket" in g.column_names:
                g = g.drop_columns(["bucket"])
            return pa.table({"node": g["node"][:1],
                             "s": pa.array([int(g["s"].to_numpy().sum())],
                                           pa.int64())})

        contrib = (joined.map_batches(share, batch_format="pyarrow")
                         .groupby("node")
                         .map_groups(sum_group, batch_format="pyarrow"))

        def update(t: pa.Table) -> pa.Table:
            s = t["s"].combine_chunks().fill_null(0).cast(pa.int64()).to_numpy()
            return pa.table({"node": t["node"],
                             "r": pa.array(base + (85 * s) // 100)})

        ranks = (hash_join(nodes, contrib, on=["node"], how="left",
                           n_buckets=8)
                 .map_batches(update, batch_format="pyarrow")
                 .materialize())                  # O(nodes) per iteration

    return ranks.map_batches(
        lambda t: pa.table({"city_code": t["node"], "pr": t["r"]}),
        batch_format="pyarrow")


def pagerank_sql(iters: int = PR_ITERS) -> str:
    """The identical integer recurrence unrolled as CTE stages."""
    from . import oracle_sqlgen as osql

    s = PR_SCALE
    steps = [f"""edges AS (SELECT DISTINCT from_city_code AS u,
       to_city_code AS v FROM records),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY u),
nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, {s} // nn.n AS r FROM nodes CROSS JOIN nn)"""]
    prev = "r0"
    for k in range(1, iters + 1):
        steps.append(f"""c{k} AS (SELECT e.v AS node,
  CAST(SUM({prev}.r // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN {prev} ON {prev}.node = e.u
  JOIN deg d ON d.u = e.u GROUP BY e.v),
r{k} AS (SELECT nodes.node,
  (15 * {s}) // (100 * nn.n) + (85 * COALESCE(c{k}.s, 0)) // 100 AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c{k} ON c{k}.node = nodes.node)""")
        prev = f"r{k}"
    return (f"{osql.CRAWL_FULL}, " + ",\n".join(steps) +
            f" SELECT node AS city_code, CAST(r AS BIGINT) AS pr FROM {prev}")
