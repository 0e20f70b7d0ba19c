"""Accuracy tests for the non-SQL-checkable ops: MinHash/SimHash dedup
vs brute-force Jaccard, LSH ANN recall vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from conftest import SF_SMALL

from __spider_ray.pipelines import textops
from __spider_ray.stages import dedup as dd


def _corpus_texts():
    t = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    corpus = {int(i): s for i, s in zip(ids, texts)}
    for i, s in zip(ids, texts):
        if i % 5 == 0:
            corpus[int(i) + 100000] = s
        if i % 7 == 0:
            corpus[int(i) + 200000] = s + textops.NEAR_SUFFIX
    return corpus


def test_minhash_finds_planted_duplicates():
    pairs = textops.q_dedup_minhash(SF_SMALL).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    corpus = _corpus_texts()
    # every planted exact pair must be found (identical signatures)
    for i in corpus:
        if i < 100000 and i % 5 == 0:
            assert (i, i + 100000) in got, f"exact dup pair {i} missed"
    # planted near-dups (high Jaccard) should be found at high recall
    near = [(i, i + 200000) for i in corpus if i < 100000 and i % 7 == 0]
    found = sum((p in got) for p in near)
    assert found / len(near) >= 0.9, (found, len(near))
    # precision: every reported pair is genuinely similar
    for a, b in list(got)[:300]:
        inter, union = dd.exact_jaccard_pair(corpus[a], corpus[b])
        assert inter / union >= 0.5, (a, b, inter / union)


def test_minhash_estimate_close_to_true_jaccard():
    corpus = _corpus_texts()
    pairs = textops.q_dedup_minhash(SF_SMALL).to_pandas()
    errs = []
    for a, b, est in zip(pairs["a"], pairs["b"], pairs["est_jaccard_pct"]):
        inter, union = dd.exact_jaccard_pair(corpus[int(a)], corpus[int(b)])
        errs.append(abs(est / 100 - inter / union))
    assert np.mean(errs) < 0.1, np.mean(errs)


def test_simhash_finds_exact_duplicates():
    pairs = textops.q_dedup_simhash(SF_SMALL).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    corpus = _corpus_texts()
    for i in corpus:
        if i < 100000 and i % 5 == 0:
            assert (i, i + 100000) in got, f"exact dup {i} missed by simhash"
    ham0 = pairs[pairs["hamming"] == 0]
    assert len(ham0) >= len([i for i in corpus if i < 100000 and i % 5 == 0])


def test_hot_bucket_star_emission_is_linear():
    """Degenerate band: 10^4 docs with IDENTICAL signatures in one LSH
    bucket.  The clique would be ~5·10^7 pair rows; the hot-bucket cap
    must emit a star — O(m) pairs, full connectivity, canonical a<b —
    from BOTH pair kernels (minhash band-hash and sig64 chunk)."""
    import pyarrow as pa

    m = 10_000
    ids = np.arange(m, dtype=np.int64)
    rng = np.random.RandomState(3)
    ids = rng.permutation(ids)            # emission must not rely on order

    g = pa.table({"band_id": np.zeros(m, np.int32),
                  "band_hash": np.full(m, 42, np.int64),
                  "doc_id": ids})
    out = dd.pairs_from_hash_bucket(g, ("band_id", "band_hash"))
    assert out.num_rows == m - 1          # star, not clique
    a = out["a"].to_numpy(); b = out["b"].to_numpy()
    assert (a < b).all()
    assert set(a) == {0}                  # min member is the center
    assert set(b) == set(range(1, m))     # every other member connected

    g2 = pa.table({"chunk_id": np.zeros(m, np.int32),
                   "chunk_val": np.full(m, 7, np.int64),
                   "doc_id": ids,
                   "simhash": np.full(m, 0x1234, np.int64)})
    out2 = dd._simhash_pairs_hash_bucket(g2)
    assert out2.num_rows == m - 1
    a2 = out2["a"].to_numpy(); b2 = out2["b"].to_numpy()
    assert (a2 < b2).all()
    assert (out2["hamming"].to_numpy() == 0).all()  # identical sigs
    assert set(a2) == {0} and set(b2) == set(range(1, m))

    # below the cap the clique is unchanged
    small = pa.table({"band_id": np.zeros(5, np.int32),
                      "band_hash": np.full(5, 42, np.int64),
                      "doc_id": np.arange(5, dtype=np.int64)})
    assert dd.pairs_from_hash_bucket(
        small, ("band_id", "band_hash")).num_rows == 10


def test_knn_brute_matches_numpy_oracle():
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array([np.array(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    got = textops.q_knn_brute(SF_SMALL).to_pandas()
    for q in ids[:10]:
        scores = m @ m[list(ids).index(q)]
        cand = [(s, v) for s, v in zip(scores, ids) if v != q]
        cand.sort(key=lambda x: (-x[0], x[1]))
        want = [v for _s, v in cand[:5]]
        sub = got[got["query_id"] == q].sort_values("rank")
        assert list(sub["vec_id"]) == want, q


def test_lsh_ann_recall():
    brute = textops.q_knn_brute(SF_SMALL).to_pandas()
    approx = textops.q_knn_lsh(SF_SMALL).to_pandas()
    bset = {(int(q), int(v)) for q, v in zip(brute["query_id"], brute["vec_id"])}
    aset = {(int(q), int(v)) for q, v in zip(approx["query_id"], approx["vec_id"])}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.4, recall        # multiprobe hamming<=2 over 64 buckets


def test_ivf_ann_recall_isotropic_floor():
    """IVF on the driver's embeddings.  These are isotropic-random (no
    cluster structure; median pairwise cosine ≈ 0), where no cell-probe
    method reaches 0.9 recall at 1/3 of the corpus — assert the
    measured floor instead; the ≥0.9 @ ≤1/3 property is asserted on
    structured data in test_ivf_ann_recall_clustered."""
    brute = textops.q_knn_brute(SF_SMALL).to_pandas()
    approx = textops.q_knn_ivf(SF_SMALL).to_pandas()
    bset = {(int(q), int(v)) for q, v in zip(brute["query_id"], brute["vec_id"])}
    aset = {(int(q), int(v)) for q, v in zip(approx["query_id"], approx["vec_id"])}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.6, recall


def test_ivf_ann_recall_clustered(tmp_path):
    """kmeans-IVF must reach recall ≥0.9 while touching ≤1/3 of the
    corpus on embeddings with any cluster structure (the realistic
    case for model embeddings)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spider_ray.stages import knn as knn_mod
    rng = np.random.RandomState(11)
    centers = rng.normal(size=(20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for i in range(3000):
        v = centers[i % 20] + 0.55 * rng.normal(size=64) / 8
        pts.append(v / np.linalg.norm(v))
    m = np.array(pts)
    path = str(tmp_path / "clustered.parquet")
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(m.astype(np.float32).reshape(-1)), 64)
    pq.write_table(pa.table({"vec_id": pa.array(np.arange(3000, dtype=np.int64)),
                             "embedding": emb}), path)

    n_cells, spill, nprobe = 32, 2, 4
    approx = knn_mod.ivf_topk(SF_SMALL, n_queries=10, k=5, n_cells=n_cells,
                              nprobe=nprobe, spill=spill, path=path).to_pandas()
    # ground truth + probed fraction, recomputed with the same
    # deterministic centroids the stage trains
    cent = knn_mod.train_ivf_centroids(m, n_cells)
    Q = m[:10]
    S = Q @ m.T
    assign = np.argsort(-(m @ cent.T), axis=1)[:, :spill]
    recall, frac = 0.0, 0.0
    for qi in range(10):
        true_top = list(np.argsort(-S[qi]))
        true_top.remove(qi)
        true_top = set(true_top[:5])
        got = set(approx[approx["query_id"] == qi]["vec_id"].astype(int))
        recall += len(true_top & got) / 5
        probe = np.argsort(-(Q[qi] @ cent.T))[:nprobe]
        probed = np.isin(assign, probe).any(axis=1)
        probed[qi] = False
        frac += probed.sum() / len(m)
    recall /= 10
    frac /= 10
    assert recall >= 0.9, recall
    assert frac <= 1 / 3, frac


def test_embedding_near_dup_buckets_stay_bounded_at_10x():
    """The banded-LSH near-dup bucketing must keep per-bucket pair work
    ~constant as the corpus grows: band_bits scales with n, so a 10×
    corpus gets proportionally more buckets, not bigger ones."""
    from __spider_ray.stages.knn import (band_buckets, near_dup_band_bits)
    rng = np.random.RandomState(3)
    stats = {}
    for n in (1000, 10000):
        m = rng.normal(size=(n, 64))
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        bb = near_dup_band_bits(n)
        planes = np.random.RandomState(7).normal(size=(4 * bb, 64))
        buckets = band_buckets(m, planes, 4, bb)
        _, counts = np.unique(buckets, return_counts=True)
        pairs = (counts * (counts - 1) // 2).sum()
        stats[n] = (counts.mean(), counts.max(), pairs)
    # mean bucket size bounded by ~2× target regardless of corpus size
    assert stats[1000][0] <= 64 and stats[10000][0] <= 64, stats
    # total candidate-pair work grows ~linearly (≈10× for a 10× corpus;
    # allow 12×), not quadratically (which would be ~100×)
    assert stats[10000][2] <= 12 * stats[1000][2], stats


def test_winnow_matches_naive_reference():
    """The batch-vectorized winnowing must equal the plain-Python
    reference on every doc: same distinct-fp count, same XOR digest,
    same minimum fingerprint."""
    import pyarrow as pa

    from __spider_ray.stages.text import winnow_batch, winnow_naive
    docs = ["the quick brown fox jumps over the lazy dog",
            "a" * 30,                     # degenerate repeated content
            "short",                      # below k → no fingerprints
            "the quick brown fox jumps over the lazy dog today",  # near-dup
            "数字 mixed 内容 with unicode 字符 and spaces here ok"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = winnow_batch(t).to_pandas().set_index("doc_id")
    for i, d in enumerate(docs):
        want = winnow_naive(d)
        assert got.loc[i, "n_fps"] == len(want), (i, d)
        xor = 0
        for f in want:
            xor ^= f
        assert got.loc[i, "xor_fp"] == np.int64(np.uint64(xor).astype(np.int64)), i
        if want:
            assert np.uint64(got.loc[i, "min_fp"]) == min(want), i


def test_winnow_shared_substring_guarantee():
    """Winnowing's core property: documents sharing a substring of
    length ≥ w+k-1 share at least one fingerprint; unrelated random
    docs share (almost) none."""
    from __spider_ray.stages.text import WINNOW_K, WINNOW_W, winnow_naive
    shared = "this exact phrase is long enough to guarantee overlap"
    assert len(shared) >= WINNOW_W + WINNOW_K - 1
    a = winnow_naive("prefix one " + shared + " suffix alpha")
    b = winnow_naive("totally different start " + shared + " another end")
    assert a & b, "shared substring must share a fingerprint"
    c = winnow_naive("qwertyuiop zxcvbnm 0987654321 lkjhgfdsa mnbvcx")
    assert len(a & c) == 0


def test_quality_filter_chain():
    out = textops.q_quality_filter(SF_SMALL).to_pandas()
    assert len(out) > 0
    assert (out["tok_n"] >= 20).all() and (out["tok_n"] <= 80).all()
    assert (out["stop_n"] * 50 >= out["tok_n"]).all()
    assert (out["digit_tok_n"] * 10 <= out["tok_n"]).all()
    # it actually filters something
    full = textops.q_text_quality(SF_SMALL).to_pandas()
    assert len(out) < len(full)


def test_exact_dedup_counts():
    out = textops.q_dedup_exact(SF_SMALL).to_pandas()
    corpus = _corpus_texts()
    n_exact_dups = len([i for i in corpus if i < 100000 and i % 5 == 0])
    assert len(out) == len(corpus) - n_exact_dups
    assert (out[out["n_copies"] == 2]["doc_id"] % 5 == 0).all()


def test_connected_components_vs_union_find():
    pairs = textops.q_dedup_minhash(SF_SMALL).to_pandas()
    comp = textops.q_dedup_clusters(SF_SMALL).to_pandas()
    # union-find oracle on the same pairs
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(pairs["a"], pairs["b"]):
        union(int(a), int(b))
    want = {n: find(n) for n in parent}
    got = dict(zip(comp["doc_id"].astype(int), comp["component"].astype(int)))
    assert got == want
    # every component label is the min doc_id of its members
    from collections import defaultdict
    members = defaultdict(list)
    for n, c in got.items():
        members[c].append(n)
    for c, ms in members.items():
        assert c == min(ms + [c])


def test_ivf_tiny_corpus_degrades_gracefully(tmp_path):
    """Fewer vectors than the default cell floor must not crash —
    n_cells clamps to the corpus size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spider_ray.stages import knn as knn_mod
    rng = np.random.RandomState(2)
    m = rng.normal(size=(7, 64))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    path = str(tmp_path / "tiny.parquet")
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(m.astype(np.float32).reshape(-1)), 64)
    pq.write_table(pa.table({"vec_id": pa.array(np.arange(7, dtype=np.int64)),
                             "embedding": emb}), path)
    out = knn_mod.ivf_topk(SF_SMALL, n_queries=2, k=3, path=path).to_pandas()
    assert set(out["query_id"]) == {0, 1}
    assert (out.groupby("query_id").size() <= 3).all()


def test_connected_components_long_chain_converges():
    """A 30-node chain needs ~29 propagation rounds — the component
    labels must still fully converge to min(doc_id) (the old cap of 16
    silently split such chains)."""
    import pyarrow as pa
    import ray.data

    from __spider_ray.stages.dedup import connected_components
    a = list(range(29))
    b = list(range(1, 30))
    pairs = ray.data.from_arrow(pa.table({"a": pa.array(a, pa.int64()),
                                          "b": pa.array(b, pa.int64())}))
    comp = connected_components(pairs).to_pandas()
    assert len(comp) == 30
    assert (comp["component"] == 0).all()


def test_ngram_jaccard_exact_against_set_oracle():
    """Every reported (pair, inter, union) must equal the exact
    set-arithmetic values from the shared tokenizer (no df-capped
    shingle in this corpus reaches the cap for planted pairs), and
    every planted exact-dup pair must appear with inter == union."""
    corpus = _corpus_texts()
    out = textops.q_dedup_ngram(SF_SMALL).to_pandas()
    got = {(int(a), int(b)): (int(i), int(u))
           for a, b, i, u in zip(out["doc_a"], out["doc_b"],
                                 out["n_common"], out["n_union"])}
    for i in corpus:
        if i < 100000 and i % 5 == 0:
            assert (i, i + 100000) in got, f"exact dup pair {i} missed"
            inter, union = got[(i, i + 100000)]
            assert inter == union, (i, inter, union)
    for (a, b), (inter, union) in list(got.items())[:300]:
        ti, tu = dd.exact_jaccard_pair(corpus[a], corpus[b])
        # df cap can only REMOVE common shingles from the reported
        # intersection; union is computed from full set sizes.
        assert tu == union and inter <= ti, (a, b, inter, ti, union, tu)
        assert 10 * inter >= 7 * union


def test_ngram_jaccard_df_cap_bounds_fanout():
    """A shingle shared by more docs than max_df must emit no pairs."""
    import ray

    texts = [f"common one two tail{i}" for i in range(10)]
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"doc_id": list(range(10)),
                                     "text": texts}))
    # 'common one two' and 'one two tailX'-style shingles: only the
    # first shingle is shared by all 10 docs.
    wide = dd.ngram_jaccard_pairs(ds, tau_num=0, tau_den=1, max_df=9)
    assert wide.count() == 0  # the only shared shingle has df=10 > 9
    ok = dd.ngram_jaccard_pairs(ds, tau_num=0, tau_den=1, max_df=10)
    assert ok.count() == 45   # C(10,2), each pair sharing exactly 1


def test_pq_codes_compress_and_reconstruct():
    """Codes are n_sub bytes; decoding them reconstructs normalized
    vectors with small quantization error (far below unit norm)."""
    from __spider_ray.stages import knn as knn_mod

    codes = knn_mod.pq_encode(SF_SMALL).to_pandas()
    raw = pq.read_table(f"{SF_SMALL}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    assert len(codes) == raw.num_rows
    assert codes["code"].map(len).eq(8).all()      # 8 bytes vs 64 floats
    _, m_s = knn_mod._bounded_sample(f"{SF_SMALL}/embeddings.parquet")
    books = knn_mod.train_pq_codebooks(m_s)
    ids = raw["vec_id"].to_numpy()
    m = knn_mod._normalize(
        np.asarray(raw["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(ids), -1))
    by_id = dict(zip(codes["vec_id"], codes["code"]))
    errs = []
    for i in range(0, len(ids), 37):
        c = np.frombuffer(by_id[ids[i]], dtype=np.uint8)
        rec = np.concatenate([books[s, c[s]] for s in range(books.shape[0])])
        errs.append(np.linalg.norm(rec - m[i]))
    # unit vectors: mean quantization distance well under the ~1.41
    # distance of a random unit pair
    assert np.mean(errs) < 0.8, np.mean(errs)


def test_pq_topk_recall_vs_brute():
    from __spider_ray.stages import knn as knn_mod

    brute = knn_mod.brute_force_topk(SF_SMALL, n_queries=10, k=5).to_pandas()
    pq_ = knn_mod.pq_topk(SF_SMALL, n_queries=10, k=5).to_pandas()
    want = {(int(q), int(v)) for q, v in zip(brute["query_id"], brute["vec_id"])}
    got = {(int(q), int(v)) for q, v in zip(pq_["query_id"], pq_["vec_id"])}
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_word_gram_hashes_boundaries():
    """Grams never straddle rows; counts per row = max(words-n+1, 0)."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import text as tx

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b c d e", "x y", "p q r s"])})
    row_of, h = tx.word_gram_hashes(t, n=4)
    assert np.bincount(row_of, minlength=3).tolist() == [2, 0, 1]
    # same gram text in different rows hashes identically
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()),
                   "text": pa.array(["b c d e"])})
    _, h2 = tx.word_gram_hashes(t2, n=4)
    assert h2[0] == h[1]
    assert len(set(h.tolist())) == len(h)     # distinct grams, distinct hashes


def test_contamination_batch_counts_distinct_hits():
    import numpy as np
    import pyarrow as pa
    import ray

    from __spider_ray.stages import text as tx

    bench_doc = pa.table({"doc_id": pa.array([0], pa.int64()),
                          "text": pa.array(["w1 w2 w3 w4 w5"])})
    _, bh = tx.word_gram_hashes(bench_doc, n=4)     # 2 benchmark grams
    ref = ray.put(np.unique(bh))
    corpus = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        # 10: both grams, one twice → n_hits=2 (distinct); 11: one; 12: none
        "text": pa.array(["w1 w2 w3 w4 w5 z w1 w2 w3 w4",
                          "a w2 w3 w4 w5 b",
                          "q r s t u v"])})
    out = tx.contamination_batch(corpus, ref, n=4).to_pylist()
    assert {(r["doc_id"], r["n_hits"]) for r in out} == {(10, 2), (11, 1)}


def test_segment_table_and_keep_first():
    import pyarrow as pa

    from __spider_ray.stages import text as tx

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c d e f g h i j",   # 2 segments
                                    "a b c d e f g h"])})    # dup of seg 0
    s = tx.segment_table(t, seg_w=8)
    rows = s.to_pylist()
    assert [(r["doc_id"], r["seg_idx"], r["segment"]) for r in rows] == [
        (1, 0, "a b c d e f g h"), (1, 1, "i j"),
        (2, 0, "a b c d e f g h")]
    kept = tx.segment_keep_first(s).to_pylist()
    assert {(r["doc_id"], r["seg_idx"]) for r in kept} == {(1, 0), (1, 1)}


def test_hll_estimate_regimes():
    """Error bound in both regimes: linear counting (n << m) is
    near-exact; the raw estimator at n >> m stays within 3 standard
    errors (3 * 1.04 / sqrt(4096) ≈ 4.9%)."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import sketch

    for n, tol in [(150, 0.02), (3000, 0.03), (200_000, 0.049)]:
        t = pa.table({"k": pa.array(["g"] * n),
                      "v": pa.array(np.arange(n, dtype=np.int64))})
        out = sketch.hll_partial_batch(t, "k", "v")
        regs = np.frombuffer(out["regs"][0].as_py(), dtype=np.uint8)
        est = sketch.hll_estimate(regs)
        assert abs(est - n) <= tol * n, (n, est)


def test_hll_partials_merge_exactly():
    """Any partitioning merges to the identical register vector —
    the monoid property the groupby-merge relies on."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import sketch

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 5000, size=20_000).astype(np.int64)
    keys = np.where(vals % 2 == 0, "a", "b").astype(object)
    full = sketch.hll_partial_batch(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)}), "k", "v")
    full_regs = {full["k"][i].as_py():
                 np.frombuffer(full["regs"][i].as_py(), dtype=np.uint8)
                 for i in range(full.num_rows)}

    parts = []
    for lo in range(0, len(vals), 3333):
        parts.append(sketch.hll_partial_batch(
            pa.table({"k": pa.array(keys[lo:lo + 3333]),
                      "v": pa.array(vals[lo:lo + 3333])}), "k", "v"))
    merged_tbl = pa.concat_tables(parts)
    for key in ("a", "b"):
        rows = [i for i in range(merged_tbl.num_rows)
                if merged_tbl["k"][i].as_py() == key]
        regs = np.stack([np.frombuffer(merged_tbl["regs"][i].as_py(),
                                       dtype=np.uint8) for i in rows])
        assert np.array_equal(regs.max(axis=0), full_regs[key])


def test_hll_query_vs_exact(ray_session):
    import duckdb

    from __spider_ray.pipelines.textops import q_approx_distinct

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r["approx_distinct"]
           for r in q_approx_distinct(sf).to_pandas().to_dict("records")}
    exact = dict(duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1").fetchall())
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.02 * n), (k, got[k], n)


def test_repetition_batch_fixture():
    import pyarrow as pa

    from __spider_ray.stages import text as tx

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  # "a b" x3, "b a" x2, "b c" x1 → n2=6, distinct=3, top=3
                  "text": pa.array(["a b a b a b c",
                                    "x y z",          # all distinct
                                    "solo"])})        # <2 words → no row
    out = {r["doc_id"]: r for r in tx.repetition_batch(t).to_pylist()}
    assert set(out) == {1, 2}
    assert (out[1]["n2"], out[1]["dup2"], out[1]["top2"]) == (6, 3, 3)
    assert (out[2]["n2"], out[2]["dup2"], out[2]["top2"]) == (2, 0, 1)


def test_pack_group_matches_naive_and_invariants():
    """searchsorted pack == per-doc next-fit reference, under a mix of
    tiny, exact-fit, and over-budget docs (hypothesis-style sweep)."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import pack

    rng = np.random.RandomState(3)
    for trial in range(25):
        toks = rng.choice([1, 5, 40, 80, 160, 161, 200],
                          size=rng.randint(1, 60)).astype(np.int64)
        g = pa.table({"source": pa.array(["s"] * len(toks)),
                      "doc_id": pa.array(np.arange(len(toks), dtype=np.int64)),
                      "tok_n": pa.array(toks)})
        out = pack.pack_group(g, budget=160)
        assert out["seq_id"].to_pylist() == pack.pack_naive(list(toks), 160)
        # invariants: within-budget unless singleton; offsets are cumsums
        seq = np.array(out["seq_id"].to_pylist())
        tok = np.array(out["tok_n"].to_pylist())
        off = np.array(out["tok_offset"].to_pylist())
        pos = np.array(out["seq_pos"].to_pylist())
        for s in np.unique(seq):
            m = seq == s
            total = tok[m].sum()
            assert total <= 160 or m.sum() == 1
            assert (off[m] == np.cumsum(tok[m]) - tok[m]).all()
            assert (pos[m] == np.arange(m.sum())).all()


def test_cm_sketch_one_sided_error_and_merge():
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import sketch

    rng = np.random.RandomState(11)
    # Zipf-ish stream over a 500-token vocab
    toks = [f"t{int(z)}" for z in rng.zipf(1.3, size=30_000) % 500]
    arr = pa.array(toks, pa.string())
    cm = sketch.cm_partial(arr)
    # merge property: two halves sum to the full sketch
    half = len(toks) // 2
    cm2 = sketch.cm_partial(pa.array(toks[:half], pa.string())) + \
        sketch.cm_partial(pa.array(toks[half:], pa.string()))
    assert np.array_equal(cm, cm2)

    import collections
    exact = collections.Counter(toks)
    probes = [f"t{i}" for i in range(50)]
    est = sketch.cm_query(cm, pa.array(probes, pa.string()))
    eps_n = (np.e / sketch.CM_W) * len(toks)
    for tkn, e in zip(probes, est):
        assert e >= exact[tkn]                       # never under
        assert e - exact[tkn] <= 3 * eps_n           # overcount bound


def test_cm_query_vs_exact(ray_session):
    import collections

    from __spider_ray.pipelines.textops import (
        CM_PROBE_TOKENS,
        corpus,
        q_cm_token_freq,
    )

    sf = "/root/testdata/sf0.001"
    exact: collections.Counter = collections.Counter()
    total = 0
    for b in corpus(sf).iter_batches(batch_format="pyarrow"):
        for txt in b["text"].to_pylist():
            ws = txt.split(" ")
            exact.update(w for w in ws if w in set(CM_PROBE_TOKENS))
            total += len(ws)
    got = q_cm_token_freq(sf).to_pandas()
    assert set(got["token"]) == set(CM_PROBE_TOKENS)
    assert (got["stream_n"] == total).all()
    import numpy as np

    from __spider_ray.stages import sketch
    eps_n = (np.e / sketch.CM_W) * total
    for _, row in got.iterrows():
        assert row["est_n"] >= exact[row["token"]]
        assert row["est_n"] - exact[row["token"]] <= 3 * eps_n


def test_semantic_dedup_drops_injected_twins(ray_session):
    """Every exact-duplicate twin pair must land in one cluster and
    lose exactly one member; corpus rows without a twin stay kept
    unless they are real near-dups of a higher-priority vector."""
    import pyarrow.parquet as pq

    from __spider_ray.stages.knn import semantic_dedup

    sf = "/root/testdata/sf0.001"
    base_ids = set(pq.read_table(f"{sf}/embeddings.parquet",
                                 columns=["vec_id"])["vec_id"].to_pylist())
    from __spider_ray.stages.knn import TWIN_OFFSET
    out = semantic_dedup(sf).to_pandas()
    assert out["vec_id"].is_unique
    keep = dict(zip(out["vec_id"], out["keep"]))
    cell = dict(zip(out["vec_id"], out["cell"]))
    twins = [i for i in base_ids if i % 5 == 0]
    assert len(out) == len(base_ids) + len(twins)
    for i in twins:
        assert cell[i] == cell[i + TWIN_OFFSET]        # same cluster
        # exact duplicates: the twin is ALWAYS dropped; the original
        # survives unless itself a near-dup of a higher-priority vector
        assert not keep[i + TWIN_OFFSET]
    # on this (fixed, deterministic) corpus no original is shadowed
    assert all(keep[i] for i in twins)


def test_semdedup_tiled_maxsim_matches_dense_and_bounds_scratch():
    """A cluster ≫ tile size: the tiled kernel must (a) reproduce the
    dense np.triu(m @ m.T, 1) column-max bit-for-bit at matching tile
    boundaries within fp tolerance and (b) never allocate a scratch
    sim block larger than tile² elements — the contract that keeps a
    degenerate 10^7-row cluster from materializing an m×m matrix."""
    import numpy as np

    from __spider_ray.stages.knn import tiled_priority_maxsim

    rng = np.random.RandomState(7)
    n, dim, tile = 5000, 16, 256          # n ≈ 19.5 tiles
    m = rng.randn(n, dim)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    # plant exact duplicates so the ≥-threshold path is exercised
    m[1234] = m[17]
    m[4999] = m[4000]

    got, peak = tiled_priority_maxsim(m, tile=tile)
    assert peak <= tile * tile            # scratch bound, by tile math

    dense = m @ m.T
    dense[np.tril_indices(n)] = -1.0      # only earlier rows (j < i) count
    want = np.full(n, -1.0)
    want[1:] = dense[:, 1:].max(axis=0)
    assert np.allclose(got, want, atol=1e-9)
    assert got[0] == -1.0                 # highest priority never drops


def test_semdedup_cells_scales_with_corpus():
    """Cell count must grow with corpus size (target ≤ ~10k rows per
    cluster) instead of inheriting ivf_params' 128-cell probe cap,
    while staying trainable on the bounded driver sample."""
    from __spider_ray.stages.knn import (SEMDEDUP_TARGET_CLUSTER,
                                         ivf_params, semdedup_cells)

    sample = 100_000                      # the _bounded_sample cap
    # 10^9-vector corpus: ivf_params would say 128 → ~8M-row clusters
    assert ivf_params(10 ** 9)[0] == 128
    cells = semdedup_cells(10 ** 9, sample)
    assert cells == sample // 8           # sample-trainability cap binds
    assert cells >= 1000                  # ≫ the old 128
    # mid-size corpus: the 10k-per-cluster target binds exactly
    assert semdedup_cells(320_000, sample) == 32
    # tiny corpus: floor of 16
    assert semdedup_cells(1_000, sample) == 16


def test_corpus_build_composite(ray_session):
    """End-to-end corpus build: deterministic across runs, every doc
    survives all filters or none, packing invariants hold, and the
    pipeline genuinely shrinks the corpus (filters + dedup active)."""
    import numpy as np
    import pyarrow.parquet as pq

    from __spider_ray.pipelines.textops import q_corpus_build

    sf = "/root/testdata/sf0.001"
    a = q_corpus_build(sf).to_pandas().sort_values(
        ["source", "doc_id"]).reset_index(drop=True)
    b = q_corpus_build(sf).to_pandas().sort_values(
        ["source", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)                                  # deterministic

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert 0 < len(a) < n_docs                          # filters bit
    assert (a["tok_n"] > 0).all()
    for (_, seq), grp in a.groupby(["source", "seq_id"]):
        assert grp["tok_n"].sum() <= 160 or len(grp) == 1
        assert sorted(grp["seq_pos"]) == list(range(len(grp)))
        off = np.cumsum(grp.sort_values("seq_pos")["tok_n"].to_numpy())
        assert (grp.sort_values("seq_pos")["tok_offset"].to_numpy()
                == np.append(0, off[:-1])).all()


def test_dd_sketch_relative_error_bound():
    """The DDSketch guarantee: each reported quantile is within alpha
    relative error of the EXACT value at rank ceil(q*N) — checked on
    a skewed positive distribution plus zeros and negatives."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import sketch

    rng = np.random.RandomState(3)
    v = np.concatenate([
        np.exp(rng.normal(2.0, 1.5, size=30_000)),          # lognormal
        -np.exp(rng.normal(0.0, 1.0, size=5_000)),          # negatives
        np.zeros(500),
    ])
    rng.shuffle(v)
    t = pa.table({"k": pa.array(["g"] * len(v)), "value": pa.array(v)})
    part = sketch.dd_partial_batch(t, "k", "value")
    out = sketch.dd_quantiles_group(part, "k", qs=(0.01, 0.5, 0.9, 0.99))
    sv = np.sort(v)
    n = len(v)
    for q in (0.01, 0.5, 0.9, 0.99):
        exact = sv[max(1, int(np.ceil(q * n))) - 1]
        est = out[f"p{int(q * 100)}"][0].as_py()
        assert abs(est - exact) <= sketch.DD_ALPHA * abs(exact) + 1e-12, \
            (q, est, exact)


def test_dd_sketch_partials_merge_exactly():
    """Bucket counts are a sum-monoid: any partitioning, concatenated
    and re-merged, yields the identical quantiles."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages import sketch

    rng = np.random.RandomState(11)
    v = np.exp(rng.normal(0, 2, size=9_999))
    keys = np.where(np.arange(len(v)) % 2 == 0, "a", "b").astype(object)
    whole = pa.table({"k": pa.array(keys), "value": pa.array(v)})
    full = sketch.dd_partial_batch(whole, "k", "value")
    parts = [sketch.dd_partial_batch(whole.slice(lo, 1234), "k", "value")
             for lo in range(0, len(v), 1234)]
    merged = pa.concat_tables(parts)
    for key in ("a", "b"):
        m_f = full.filter(pa.compute.equal(full["k"], key))
        m_p = merged.filter(pa.compute.equal(merged["k"], key))
        qf = sketch.dd_quantiles_group(m_f, "k")
        qp = sketch.dd_quantiles_group(m_p, "k")
        assert qf.equals(qp)


def test_dd_query_vs_exact(ray_session):
    """End-to-end grouped sketch over the events table vs exact rank
    statistics per group."""
    import numpy as np
    import pyarrow.parquet as pq_

    from __spider_ray.pipelines.textops import q_approx_quantiles
    from __spider_ray.stages.sketch import DD_ALPHA

    sf = "/root/testdata/sf0.001"
    got = q_approx_quantiles(sf).to_pandas().set_index("event_type")
    raw = pq_.read_table(f"{sf}/events.parquet",
                         columns=["event_type", "value"]).to_pandas()
    for et, grp in raw.groupby("event_type"):
        sv = np.sort(grp["value"].to_numpy())
        n = len(sv)
        for q in (0.5, 0.9, 0.99):
            exact = sv[max(1, int(np.ceil(q * n))) - 1]
            est = got.loc[et, f"p{int(q * 100)}"]
            assert abs(est - exact) <= DD_ALPHA * abs(exact) + 1e-12, \
                (et, q, est, exact)


# ------------------------------------------------------- char-bigram LM


def test_char_lm_distributed_counts_exact():
    """Per-batch long-form pair counts summed across an arbitrary batch
    split must equal direct counts over the whole corpus (sum-monoid
    exactness, including the NUL boundary masking)."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages.text import char_bigram_pair_counts

    docs = ["hello world", "weird\xe9 bytesü", "aa", "b", ""]

    def merge(tables):
        acc = {}
        for t in tables:
            for p, n in zip(t["pair_id"].to_pylist(), t["n"].to_pylist()):
                acc[p] = acc.get(p, 0) + n
        return acc

    whole = merge([char_bigram_pair_counts(pa.array(docs))])
    split = merge([char_bigram_pair_counts(pa.array(docs[:2])),
                   char_bigram_pair_counts(pa.array(docs[2:]))])
    assert whole == split
    # direct reference: per-doc byte bigrams, no cross-doc pairs
    ref = {}
    for d in docs:
        b = np.frombuffer(d.encode(), dtype=np.uint8)
        for i in range(len(b) - 1):
            k = int(b[i]) * 256 + int(b[i + 1])
            ref[k] = ref.get(k, 0) + 1
    assert whole == ref


def test_char_lm_scoring_batch_invariant_and_short_docs():
    import pyarrow as pa

    from __spider_ray.stages.text import (char_bigram_pair_counts,
                                          char_lm_logprob_table,
                                          char_lm_score_batch)

    docs = ["the quick brown fox", "", "x", "jumps over", "aaaa"]
    counts = char_bigram_pair_counts(pa.array(docs))
    logp = char_lm_logprob_table(
        dict(zip(counts["pair_id"].to_pylist(), counts["n"].to_pylist())))

    t_all = pa.table({"doc_id": pa.array(list(range(5)), pa.int64()),
                      "text": pa.array(docs)})
    one = char_lm_score_batch(t_all, logp).to_pandas()
    parts = [char_lm_score_batch(t_all.slice(i, 1), logp).to_pandas()
             for i in range(5)]
    import pandas as pd
    sep = pd.concat(parts, ignore_index=True)
    assert one["lm_milli_nats"].tolist() == sep["lm_milli_nats"].tolist()
    assert one["n_pairs"].tolist() == sep["n_pairs"].tolist()
    # empty and single-char docs: zero pairs, zero score
    assert one.loc[1, "n_pairs"] == 0 and one.loc[1, "lm_milli_nats"] == 0
    assert one.loc[2, "n_pairs"] == 0 and one.loc[2, "lm_milli_nats"] == 0


def test_char_lm_in_distribution_beats_random_bytes():
    """Text sampled from the training distribution must score a higher
    mean log-prob than uniform-random printable bytes under the same
    LM — the separating property a quality filter relies on."""
    import numpy as np
    import pyarrow as pa

    from __spider_ray.stages.text import (char_bigram_pair_counts,
                                          char_lm_logprob_table,
                                          char_lm_score_batch)

    rng = np.random.default_rng(11)
    vocab = ["data", "table", "join", "scan", "merge", "sort", "batch"]
    train = [" ".join(rng.choice(vocab, size=40)) for _ in range(200)]
    counts = char_bigram_pair_counts(pa.array(train))
    logp = char_lm_logprob_table(
        dict(zip(counts["pair_id"].to_pylist(), counts["n"].to_pylist())))

    good = [" ".join(rng.choice(vocab, size=40)) for _ in range(20)]
    junk = ["".join(chr(c) for c in rng.integers(33, 127, size=200))
            for _ in range(20)]
    t = pa.table({"doc_id": pa.array(list(range(40)), pa.int64()),
                  "text": pa.array(good + junk)})
    got = char_lm_score_batch(t, logp).to_pandas()
    g = got["lm_milli_nats"][:20].mean()
    j = got["lm_milli_nats"][20:].mean()
    assert g > j + 1000, (g, j)   # ≥1 nat/byte separation


def test_ccnet_buckets_terciles(ray_session, tmp_path):
    """Perplexity buckets: ~equal tercile sizes per language, and the
    head bucket's scores strictly dominate the tail's."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spider_ray.pipelines import textops

    rng = np.random.default_rng(5)
    vocab = ["the", "data", "table", "join", "scan", "merge", "sort"]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(90)]
    t = pa.table({
        "doc_id": pa.array(list(range(90)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 90),
        "source": pa.array(["s"] * 90),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    buckets = textops.q_ccnet_buckets(str(tmp_path)).to_pandas()
    en = buckets[buckets["lang"] == "en"].set_index("bucket")["n_docs"]
    total = int(en.sum())
    # corpus() injects dup5/near7 copies; terciles stay within a loose
    # band of total/3 (ties at the cut can shift a few docs)
    for b in ("head", "middle", "tail"):
        assert abs(int(en[b]) - total / 3) < total * 0.15, en.to_dict()

    # dominance: join scores back to buckets and compare extremes
    scored = textops.q_char_lm_quality(str(tmp_path)).to_pandas()
    cuts = {}
    joined = scored  # all docs are 'en' in this fixture
    s = joined.sort_values("lm_milli_nats")["lm_milli_nats"].to_numpy()
    n = len(s)
    c1, c2 = s[(n - 1) // 3], s[2 * (n - 1) // 3]
    head_min = s[s > c2].min() if (s > c2).any() else None
    tail_max = s[s <= c1].max()
    if head_min is not None:
        assert head_min > tail_max
