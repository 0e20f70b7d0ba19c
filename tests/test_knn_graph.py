"""Graph ANN (stages/knn_graph.py): NN-descent build quality, the
search criterion (recall ≥0.9 at ≤1/3 touched on the driver's
ISOTROPIC embeddings — where tests/test_textops.py shows cell-probe
methods top out ~0.85 at ~0.40), and determinism."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from __spider_ray.stages import knn_graph as KG

SF = "/root/testdata/sf0.001"          # 500 vectors, dim 64 (isotropic)


def _corpus(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(ids), -1)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


@pytest.fixture(scope="module")
def built(ray_session):
    """Build once per module: the graph, the index, and brute truth."""
    ids, m = _corpus(SF)
    edges = KG.nn_descent_graph(SF).materialize()
    vectors = KG._vectors_ds(SF)
    index = KG.GraphIndex(n_shards=2)
    index.load(edges, vectors)
    return ids, m, edges, index, vectors


def test_nn_descent_converges_to_exact_knn(built):
    """Final graph edges ≥0.9 overlap with the exact K-NN graph, every
    node has exactly K unique self-free neighbors."""
    ids, m, edges, _, _ = built
    df = edges.to_pandas()
    S = m @ m.T
    np.fill_diagonal(S, -2)
    k = KG.K_NEIGHBORS
    exact = np.argsort(-S, axis=1)[:, :k]
    id2pos = {int(v): i for i, v in enumerate(ids)}
    ov = []
    for src, grp in df.groupby("src"):
        assert len(grp) == k == grp["dst"].nunique()
        assert int(src) not in set(grp["dst"])
        ov.append(len(set(grp["dst"])
                      & set(ids[exact[id2pos[int(src)]]])) / k)
    assert len(ov) == len(ids)                 # every node has a list
    assert np.mean(ov) >= 0.9


def test_graph_search_recall_and_touch_budget(built):
    """The headline criterion: ≥0.9 recall vs brute-force cosine top-5
    while touching ≤ n/3 of the corpus per query."""
    ids, m, _, index, vectors = built
    q_ids, Q = KG.load_queries(SF, 10)
    entries = KG._entry_points(vectors, 8)
    table, stats = KG.graph_search(index, q_ids, Q, entries, len(ids), k=5)
    assert stats["touched_frac_max"] <= 1 / 3 + 1e-9
    # brute truth
    S = m @ Q.T                                  # (n, nq)
    got = table.to_pandas()
    recs = []
    id2pos = {int(v): i for i, v in enumerate(ids)}
    for qi, qid in enumerate(q_ids):
        col = S[:, qi].copy()
        col[id2pos[int(qid)]] = -2
        true = set(ids[np.argsort(-col)[:5]].tolist())
        mine = set(got[got["query_id"] == int(qid)]["vec_id"])
        recs.append(len(mine & true) / 5)
    assert np.mean(recs) >= 0.9


def test_graph_search_deterministic(built):
    ids, _, _, index, vectors = built
    q_ids, Q = KG.load_queries(SF, 5)
    entries = KG._entry_points(vectors, 8)
    t1, _ = KG.graph_search(index, q_ids, Q, entries, len(ids), k=5)
    t2, _ = KG.graph_search(index, q_ids, Q, entries, len(ids), k=5)
    assert t1.equals(t2)


def test_init_edges_connected_across_partitions(ray_session):
    """The disconnected-init regression: the union of the independent
    ring partitions must form ONE weakly-connected component (a single
    partition's rings seal each hash bucket — NN-descent then stalls
    at the per-bucket KNN, measured 0.14 overlap)."""
    vectors = KG._vectors_ds(SF)
    nb = KG._build_buckets(vectors.count(), KG.K_NEIGHBORS)
    df = KG._init_edges(vectors, KG.K_NEIGHBORS, nb).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(df["src"], df["dst"]):
        parent[find(int(s))] = find(int(d))
    roots = {find(x) for x in parent}
    assert len(roots) == 1
