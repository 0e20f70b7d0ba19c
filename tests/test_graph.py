"""Distributed integer-exact PageRank: the Ray pipeline must match an
independent single-process reference of the same recurrence."""

from __future__ import annotations

import numpy as np

from __spider_ray.pipelines.graph import (
    PR_SCALE,
    city_edges,
    q_city_pagerank,
)

SF = "/root/testdata/sf0.001"


def _reference_pagerank(pairs: list[tuple[str, str]], iters: int) -> dict[str, int]:
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    for u, _ in pairs:
        outdeg[idx[u]] += 1
    base = (15 * PR_SCALE) // (100 * n)
    r = np.full(n, PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        for u, v in pairs:
            s[idx[v]] += r[idx[u]] // outdeg[idx[u]]
        r = base + (85 * s) // 100
    return {nodes[i]: int(r[i]) for i in range(n)}


def test_pagerank_matches_local_reference(ray_session):
    pairs = [(row["u"], row["v"])
             for row in city_edges(SF).to_pandas().to_dict("records")]
    assert len(pairs) == len(set(pairs))        # edges are distinct
    expect = _reference_pagerank(pairs, 2)

    got = {row["city_code"]: row["pr"]
           for row in q_city_pagerank(SF, iters=2).to_pandas().to_dict("records")}
    assert got == expect
    # probability mass conserved to within N floor-division drops
    assert abs(sum(got.values()) - PR_SCALE) < 100 * len(got)
