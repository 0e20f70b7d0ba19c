"""Graph ANN — distributed NN-descent build + sharded-index greedy
beam search.  The ANN flavor that works on ISOTROPIC embeddings, where
cell-probe methods (LSH buckets, kmeans-IVF cells) provably cannot
reach 0.9 recall at 1/3 of the corpus touched (measured in
tests/test_textops.py; the driver's synthetic embeddings have median
pairwise cosine 0.0 and a flat spectrum).  Greedy descent over a K-NN
graph routes BY the metric itself, so it needs no cluster structure:
measured on the driver's embeddings, recall ≥0.9 vs brute force while
touching well under 1/3 (tests/test_knn_graph.py).

Build — NN-descent (Dong, Moses & Li, WWW 2011) as Ray Data rounds:
each iteration is (1) ONE ``hash_join`` attaching member vectors to
the adjacency, (2) one ``groupby`` whose per-bucket kernel scores every
group's (K+1)×(K+1) member-pair cosine block in a single batched
einsum (the "local join": pairs among {node} ∪ neighbors(node), both
directions — reverse edges come free from the member×self pairs),
(3) one ``groupby`` doing vectorized per-source top-K re-selection.
All three are all-to-alls keyed by node id — no driver-side graph, no
per-node Python.  Candidate volume is n·K(K+1) rows/iteration of
24 B — linear in the corpus.

Random init must be CROSS-BLOCK: nodes are first shuffled into
hash-random buckets and ring-linked within each bucket — a per-block
init would strand NN-descent inside read partitions (the local join
can only ever recombine ids that some group already connects).

Search — the graph + vectors load into hash-sharded ``GraphShard``
actors (each holds 1/S of the adjacency and vectors; memory per shard
= n/S·(K·8 + dim·4) bytes — the distributed index a 100 TB corpus
needs).  The driver runs the beam loop holding only (query → scored
node ids): per round it expands the best unexpanded beam nodes via a
keyed ``neighbors`` lookup and scores ONLY the new candidates inside
the shards (vectors never leave the actors).  Per-query touched work
is a constant ``rounds·expand·K + entries``, hard-capped at n/3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import hash64_ints
from .knn import _embs, _normalize, load_queries

K_NEIGHBORS = 24    # build/search degree: 16 plateaued at 0.86 overlap (synchronous
# rounds lack the prototype's in-place Gauss-Seidel acceleration); 24 reaches
# 0.97 overlap in 5 rounds and search recall 1.0 at ~0.19 touched (sf0.1)
N_BUCKETS = 64            # pair-gen / top-K shuffle width
SCORE_SCALE = 10_000_000  # score_bp int64 fixed-point (1e-7 cosine steps)


# ------------------------------------------------------------------ build
def _vectors_ds(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _build_buckets(n_rows: int, k: int) -> int:
    """Shuffle width scaled so each random bucket holds ≥ ~4K members —
    the ring init needs K+1 members per bucket to give every node K
    initial edges, and tiny buckets also make the pair-gen groupbys
    pure overhead (shuffle cost is per-block, not per-row)."""
    return max(1, min(N_BUCKETS, n_rows // (4 * k)))


INIT_PARTITIONS = 4


def _init_edges(vectors: ray.data.Dataset, k: int,
                n_buckets: int) -> ray.data.Dataset:
    """Globally-random initial K edges per node as the union of
    ``INIT_PARTITIONS`` INDEPENDENT hash partitions: each pass shuffles
    nodes into its own random buckets and ring-links k/P successors
    within each bucket.  One partition alone seals every bucket into a
    disconnected component — the local join propagates only along
    existing edges, so NN-descent would converge to the per-bucket KNN
    and stall (measured: overlap plateaued at 0.14).  Overlapping
    buckets from independent partitions make the union connected (an
    expander w.h.p.), which is what lets descent reach the global KNN."""
    per = max(1, k // INIT_PARTITIONS)

    def one_pass(seed: int):
        def bucketize(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            b = (hash64_ints(ids.astype(np.uint64), seed=seed)
                 % np.uint64(n_buckets)).astype(np.int64)
            return pa.table({"bucket": pa.array(b),
                             "vec_id": pa.array(ids.astype(np.int64))})

        def ring(g: pa.Table) -> pa.Table:
            ids = g["vec_id"].to_numpy()
            order = np.argsort(hash64_ints(ids.astype(np.uint64),
                                           seed=seed + 1), kind="stable")
            ids = ids[order]
            n = len(ids)
            kk = min(per, n - 1)
            if kk <= 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            src = np.repeat(ids, kk)
            off = np.tile(np.arange(1, kk + 1), n)
            dst = ids[(np.repeat(np.arange(n), kk) + off) % n]
            return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

        return (vectors.map_batches(bucketize, batch_format="pyarrow")
                       .groupby("bucket")
                       .map_groups(lambda g: ring(g.drop_columns(["bucket"])),
                                   batch_format="pyarrow"))

    out = one_pass(101)
    for p in range(1, INIT_PARTITIONS):
        out = out.union(one_pass(101 + 10 * p))
    return out


def _pairs_bucket(g: pa.Table, k: int) -> pa.Table:
    """Local join for every group in one bucket: groups are (node,
    K members + self); score ALL ordered member pairs per group with
    one batched einsum when group sizes agree (the common case), a
    padded fallback otherwise."""
    grp = g["grp"].to_numpy()
    member = g["member"].to_numpy()
    ids, vecs = _embs(pa.table({"vec_id": g["member"],
                                "embedding": g["embedding"]}))
    vecs = _normalize(vecs)
    order = np.lexsort((member, grp))
    grp, member, vecs = grp[order], member[order], vecs[order]
    # drop duplicate (grp, member) rows — symmetrization emits v twice
    # into grp u when u→v and v→u both exist
    dup = np.zeros(len(grp), dtype=bool)
    dup[1:] = (grp[1:] == grp[:-1]) & (member[1:] == member[:-1])
    grp, member, vecs = grp[~dup], member[~dup], vecs[~dup]
    uniq, starts, counts = np.unique(grp, return_index=True,
                                     return_counts=True)
    out_s, out_d, out_sc = [], [], []
    if counts.min() == counts.max():
        size = int(counts[0])
        V = vecs.reshape(len(uniq), size, -1)
        S = np.einsum("gid,gjd->gij", V, V)            # (G, size, size)
        M = member.reshape(len(uniq), size)
        ii, jj = np.nonzero(~np.eye(size, dtype=bool))
        out_s.append(M[:, ii].ravel())
        out_d.append(M[:, jj].ravel())
        out_sc.append(S[:, ii, jj].ravel())
    else:                                              # ragged tail groups
        for s, c in zip(starts, counts):
            V = vecs[s:s + c]
            S = V @ V.T
            M = member[s:s + c]
            ii, jj = np.nonzero(~np.eye(c, dtype=bool))
            out_s.append(M[ii])
            out_d.append(M[jj])
            out_sc.append(S[ii, jj])
    src = np.concatenate(out_s)
    dst = np.concatenate(out_d)
    sc = np.concatenate(out_sc)
    keep = src != dst                                  # dup members guard
    return pa.table({
        "src": pa.array(src[keep].astype(np.int64)),
        "dst": pa.array(dst[keep].astype(np.int64)),
        "score_bp": pa.array(np.round(sc[keep] * SCORE_SCALE)
                             .astype(np.int64)),
    })


def _topk_bucket(g: pa.Table, k: int) -> pa.Table:
    """Per-source top-K re-selection, vectorized over the whole bucket:
    lexsort (src, -score, dst), drop duplicate (src, dst), keep each
    source's first K survivors."""
    src = g["src"].to_numpy()
    dst = g["dst"].to_numpy()
    sc = g["score_bp"].to_numpy()
    order = np.lexsort((dst, -sc, src))
    src, dst, sc = src[order], dst[order], sc[order]
    dup = np.zeros(len(src), dtype=bool)
    dup[1:] = (src[1:] == src[:-1]) & (dst[1:] == dst[:-1])
    src, dst, sc = src[~dup], dst[~dup], sc[~dup]
    new = np.empty(len(src), dtype=bool)
    if len(new):
        new[0] = True
        new[1:] = src[1:] != src[:-1]
    rank = np.arange(len(src)) - np.repeat(
        np.nonzero(new)[0], np.diff(np.append(np.nonzero(new)[0], len(src))))
    keep = rank < k
    return pa.table({"src": pa.array(src[keep]),
                     "dst": pa.array(dst[keep]),
                     "score_bp": pa.array(sc[keep])})


def nn_descent_graph(sf_dir: str, k: int = K_NEIGHBORS,
                     iters: int = 5) -> ray.data.Dataset:
    """Build the K-NN graph → Dataset (src, dst, score_bp)."""
    import pyarrow.parquet as pq

    from ..functions.joins import hash_join
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    nb = _build_buckets(n_rows, k)
    vectors = _vectors_ds(sf_dir)
    edges = _init_edges(vectors, k, nb)               # (src, dst)

    def as_member(t: pa.Table) -> pa.Table:
        return pa.table({"member": t["vec_id"].cast(pa.int64()),
                         "embedding": t["embedding"]})
    # loop-invariant: pin once, not re-read+re-projected every round
    member_vecs = vectors.map_batches(as_member,
                                      batch_format="pyarrow").materialize()

    def self_rows(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].cast(pa.int64())
        return pa.table({"grp": ids, "member": ids,
                         "embedding": t["embedding"]})
    selfs = vectors.map_batches(self_rows,
                                batch_format="pyarrow").materialize()

    for _ in range(iters):
        # SYMMETRIZED groups — {u} ∪ out(u) ∪ in(u): in-neighbors in
        # the group is what lets good edges propagate both ways (the
        # out-only variant converges ~2× slower, measured)
        ed = edges.map_batches(
            lambda t: pa.table({
                "grp": pa.concat_arrays([t["src"].combine_chunks(),
                                         t["dst"].combine_chunks()]),
                "member": pa.concat_arrays([t["dst"].combine_chunks(),
                                            t["src"].combine_chunks()])}),
            batch_format="pyarrow")
        adj = hash_join(ed, member_vecs, on=["member"],
                        n_buckets=nb)        # + vec_member
        # project to ONE column order before union (Ray unions blocks
        # as-is; mixed layouts poison downstream schema handling)
        adj = adj.map_batches(
            lambda t: t.select(["grp", "member", "embedding"]),
            batch_format="pyarrow")
        groups = adj.union(selfs)

        def gbucket(t: pa.Table) -> pa.Table:
            b = (hash64_ints(t["grp"].to_numpy().astype(np.uint64), seed=103)
                 % np.uint64(nb)).astype(np.int64)
            return t.append_column("bucket", pa.array(b))

        pairs = (groups.map_batches(gbucket, batch_format="pyarrow")
                       .groupby("bucket")
                       .map_groups(lambda g: _pairs_bucket(
                           g.drop_columns(["bucket"]), k),
                           batch_format="pyarrow"))

        def sbucket(t: pa.Table) -> pa.Table:
            b = (hash64_ints(t["src"].to_numpy().astype(np.uint64), seed=104)
                 % np.uint64(nb)).astype(np.int64)
            return t.append_column("bucket", pa.array(b))

        edges = (pairs.map_batches(sbucket, batch_format="pyarrow")
                      .groupby("bucket")
                      .map_groups(lambda g: _topk_bucket(
                          g.drop_columns(["bucket"]), k),
                          batch_format="pyarrow")
                      .materialize())   # each round feeds the next; without
        # this the lazy lineage re-executes EVERY prior round per consumer
    return edges


# ------------------------------------------------------------------ index
@ray.remote(num_cpus=0.25)
class GraphShard:
    """One hash shard of the search index: adjacency lists + vectors
    for the node ids routed here.  Vectors never leave the shard —
    ``score`` runs the matmul locally and returns only scores."""

    def __init__(self):
        self.nbrs: dict[int, np.ndarray] = {}
        self.vecs: dict[int, np.ndarray] = {}

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.nonzero(np.r_[True, src[1:] != src[:-1]])[0]
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(src)
            u = int(src[s])
            cur = self.nbrs.get(u)
            self.nbrs[u] = dst[s:e] if cur is None \
                else np.concatenate([cur, dst[s:e]])
        return len(src)

    def add_vectors(self, ids: np.ndarray, mat: np.ndarray) -> int:
        for i, v in zip(ids, mat):
            self.vecs[int(i)] = v
        return len(ids)

    def neighbors(self, ids: list[int]) -> dict[int, np.ndarray]:
        return {i: self.nbrs.get(i, np.empty(0, np.int64)) for i in ids}

    def score(self, ids: list[int], q: np.ndarray) -> dict[int, np.ndarray]:
        """cosine of each requested node vs every query row of q."""
        out = {}
        for i in ids:
            v = self.vecs.get(i)
            if v is not None:
                out[i] = v @ q.T
        return out


class GraphIndex:
    """Client over S GraphShard actors; routing = hash(id) % S."""

    def __init__(self, n_shards: int = 4):
        self.n = n_shards
        self.shards = [GraphShard.remote() for _ in range(n_shards)]

    def _route(self, ids: np.ndarray) -> np.ndarray:
        return (hash64_ints(ids.astype(np.uint64), seed=105)
                % np.uint64(self.n)).astype(np.int64)

    def load(self, edges: ray.data.Dataset, vectors: ray.data.Dataset) -> None:
        shards, route = self.shards, self._route

        def push_edges(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy().astype(np.int64)
            dst = t["dst"].to_numpy().astype(np.int64)
            sh = route(src)
            ray.get([shards[s].add_edges.remote(src[sh == s], dst[sh == s])
                     for s in set(sh.tolist())])
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        def push_vecs(t: pa.Table) -> pa.Table:
            ids, m = _embs(t)
            ids = np.asarray(ids, dtype=np.int64)
            mn = _normalize(m)
            sh = route(ids)
            ray.get([shards[s].add_vectors.remote(ids[sh == s], mn[sh == s])
                     for s in set(sh.tolist())])
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        edges.map_batches(push_edges, batch_format="pyarrow",
                          batch_size=65536).count()
        vectors.map_batches(push_vecs, batch_format="pyarrow",
                            batch_size=4096).count()

    def neighbors(self, ids: np.ndarray) -> dict[int, np.ndarray]:
        sh = self._route(ids)
        refs = [self.shards[s].neighbors.remote(
            [int(i) for i in ids[sh == s]]) for s in set(sh.tolist())]
        out: dict[int, np.ndarray] = {}
        for r in ray.get(refs):
            out.update(r)
        return out

    def score(self, ids: np.ndarray, q: np.ndarray) -> dict[int, np.ndarray]:
        sh = self._route(ids)
        refs = [self.shards[s].score.remote(
            [int(i) for i in ids[sh == s]], q) for s in set(sh.tolist())]
        out: dict[int, np.ndarray] = {}
        for r in ray.get(refs):
            out.update(r)
        return out


# ----------------------------------------------------------------- search
def _entry_points(vectors: ray.data.Dataset, n_entries: int) -> np.ndarray:
    """Deterministic pseudo-random entries: the n ids with the smallest
    scrambled hash — per-block local top-n, then a tiny driver merge
    (bounded by n_entries × blocks, never the corpus)."""
    def local(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy().astype(np.int64)
        h = hash64_ints(ids.astype(np.uint64), seed=106)
        top = np.argsort(h, kind="stable")[:n_entries]
        return pa.table({"vec_id": pa.array(ids[top]),
                         "h": pa.array(h[top].astype(np.int64))})
    rows = vectors.map_batches(local, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    h = np.array([r["h"] for r in rows])
    return ids[np.argsort(h, kind="stable")[:n_entries]]


def graph_search(index: GraphIndex, q_ids: np.ndarray, Q: np.ndarray,
                 entries: np.ndarray, n_total: int, k: int = 5,
                 beam_w: int = 10, expand_per: int = 3,
                 rounds: int = 16) -> tuple[pa.Table, dict]:
    """Beam search for all queries at once; returns (top-k table,
    stats incl. max touched fraction).  Touch budget hard-capped at
    n_total/3 per query (the ≤1/3 criterion's ceiling; typical touch
    is the constant rounds·expand·K)."""
    nq = len(q_ids)
    budget = max(1, n_total // 3)
    ent_scores = index.score(entries, Q)              # {id: (nq,) scores}
    state = []                                        # per query dicts
    for qi in range(nq):
        state.append({
            "scores": {int(i): float(s[qi]) for i, s in ent_scores.items()},
            "expanded": set(),
        })
    for _ in range(rounds):
        todo: dict[int, list[int]] = {}
        for qi, st in enumerate(state):
            if len(st["scores"]) >= budget:
                continue
            beam = sorted(st["scores"], key=lambda v: -st["scores"][v])[:beam_w]
            picks = [v for v in beam if v not in st["expanded"]][:expand_per]
            for v in picks:
                st["expanded"].add(v)
                todo.setdefault(v, []).append(qi)
        if not todo:
            break
        nbr = index.neighbors(np.array(sorted(todo), dtype=np.int64))
        want: dict[int, set[int]] = {}                # node → queries
        for v, qis in todo.items():
            for w in nbr.get(v, ()):
                for qi in qis:
                    st = state[qi]
                    if int(w) not in st["scores"] \
                            and len(st["scores"]) < budget:
                        want.setdefault(int(w), set()).add(qi)
        if not want:
            continue
        got = index.score(np.array(sorted(want), dtype=np.int64), Q)
        for w, qis in want.items():
            s = got.get(w)
            if s is None:
                continue
            for qi in qis:
                if len(state[qi]["scores"]) < budget:
                    state[qi]["scores"][w] = float(s[qi])
    out_q, out_v, out_r = [], [], []
    touched = []
    for qi, st in enumerate(state):
        touched.append(len(st["scores"]))
        top = [v for v in sorted(st["scores"], key=lambda v: -st["scores"][v])
               if v != int(q_ids[qi])][:k]
        out_q.extend([int(q_ids[qi])] * len(top))
        out_v.extend(top)
        out_r.extend(range(1, len(top) + 1))
    table = pa.table({"query_id": pa.array(out_q, pa.int64()),
                      "vec_id": pa.array(out_v, pa.int64()),
                      "rank": pa.array(out_r, pa.int64())})
    stats = {"touched_max": max(touched), "touched_mean": float(np.mean(touched)),
             "n_total": n_total,
             "touched_frac_max": max(touched) / max(1, n_total)}
    return table, stats


def graph_topk(sf_dir: str, n_queries: int = 10, k: int = 5,
               k_graph: int = K_NEIGHBORS, iters: int = 5,
               n_shards: int = 4,
               _stats_out: dict | None = None) -> ray.data.Dataset:
    """End-to-end graph ANN: NN-descent build → sharded index → beam
    search → (query_id, vec_id, rank), same contract as
    ``brute_force_topk``."""
    import pyarrow.parquet as pq
    n_total = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    edges = nn_descent_graph(sf_dir, k=k_graph, iters=iters)
    vectors = _vectors_ds(sf_dir)
    index = GraphIndex(n_shards=n_shards)
    index.load(edges, vectors)
    q_ids, Q = load_queries(sf_dir, n_queries)
    entries = _entry_points(vectors, 8)
    table, stats = graph_search(index, q_ids, Q, entries, n_total, k=k)
    if _stats_out is not None:
        _stats_out.update(stats)
    return ray.data.from_arrow(table)
