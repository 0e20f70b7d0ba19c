"""Deduplication suite — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline dedup over the ``documents`` corpus, built the
way it scales to 100 TB:

- **exact**: md5 fingerprint column (vectorized) → ``groupby(fp)`` →
  min-doc_id winner.  One shuffle keyed by content hash.
- **MinHash+LSH**: per-batch vectorized pipeline shingle→minhash
  (multiply-shift permutations, ``np.minimum.reduceat``) → explode to
  (band_id, band_hash, doc_id) rows → ``groupby(band)`` emits candidate
  pairs → signature-overlap verify.  The all-to-all moves one row per
  (doc, band) — 16 rows/doc — not the text.
- **SimHash**: 64-bit signature via bit-count accumulation
  (``np.add.reduceat`` over unpacked bits); pigeonhole banding into 4×16
  bit chunks finds all pairs with hamming ≤ 3 without pairwise scans.
- **n-gram Jaccard**: exact verification on candidate pairs only
  (broadcast shingle sets of the candidate docs — the candidate set is
  orders of magnitude smaller than the corpus).

References: Broder, "On the resemblance and containment of documents"
(1997); Charikar, "Similarity estimation techniques from rounding
algorithms" (STOC 2002); Leskovec et al., *Mining of Massive
Datasets* ch.3 (public).  Implemented from scratch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64, hash64_ints

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS           # 4
SHINGLE_W = 3

_rng = np.random.RandomState(42)
_PERM_A = (_rng.randint(1, 1 << 62, size=N_PERM).astype(np.uint64) << np.uint64(1)) \
          | np.uint64(1)                    # odd multipliers (multiply-shift)


def _shingles(text: str) -> list[str]:
    """Word-SHINGLE_W-gram shingles of one doc — the ONE tokenizer both
    the MinHash signatures and the exact-Jaccard verifier use (they must
    measure the same sets or the estimate/verify contract breaks)."""
    toks = text.split(" ")
    if len(toks) < SHINGLE_W:
        return [" ".join(toks)]
    return [" ".join(toks[j:j + SHINGLE_W])
            for j in range(len(toks) - SHINGLE_W + 1)]


def _shingle_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All word-SHINGLE_W-gram hashes, flattened, plus per-doc counts.

    Tokenize once per doc (inherent), hash shingles vectorized."""
    all_shingles: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, txt in enumerate(texts):
        sh = _shingles(txt)
        all_shingles.extend(sh)
        counts[i] = len(sh)
    h = hash64(pa.array(all_shingles, type=pa.string()))
    return h, counts


def minhash_batch(t: pa.Table) -> pa.Table:
    """documents batch → (doc_id, sig list<uint64>[N_PERM], n_shingles)."""
    texts = t["text"].to_pylist()
    doc_ids = t["doc_id"].cast(pa.int64())
    h, counts = _shingle_hashes(texts)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    with np.errstate(over="ignore"):
        permed = _PERM_A[:, None] * h[None, :]          # (P, N) multiply-shift
    sigs = np.empty((len(texts), N_PERM), dtype=np.uint64)
    for p in range(N_PERM):                              # P=64 vector passes
        sigs[:, p] = np.minimum.reduceat(permed[p], starts)
    sig_list = pa.FixedSizeListArray.from_arrays(
        pa.array(sigs.reshape(-1).astype(np.int64)), N_PERM)
    return pa.table({"doc_id": doc_ids, "sig": sig_list,
                     "n_shingles": pa.array(counts)})


def bands_batch(t: pa.Table) -> pa.Table:
    """signatures → exploded (band_id, band_hash, doc_id) rows."""
    n = t.num_rows
    sigs = np.asarray(t["sig"].combine_chunks().flatten()).reshape(n, N_PERM) \
             .astype(np.uint64)
    bands = sigs.reshape(n, N_BANDS, ROWS_PER_BAND)
    bh = np.zeros((n, N_BANDS), dtype=np.uint64)
    for r in range(ROWS_PER_BAND):                       # chain-hash the band rows
        bh = hash64_ints(bh ^ bands[:, :, r], seed=r + 11)
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n)),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), N_BANDS)),
    })


# Above this many members in ONE LSH bucket, emit a star (min-member ↔
# others, O(m)) instead of the full clique (O(m²)).  Boilerplate-heavy
# corpora at 100 TB produce degenerate bands with 10^5+ identical
# signatures — a clique there is 10^10 pair rows from a single group.
# A star preserves exactly what the consumers need: connectivity for
# ``connected_components`` / keep-first, and each emitted pair is still
# individually re-verified (full-signature Jaccard or hamming).
HOT_BUCKET_CAP = 512


def pairs_from_hash_bucket(g: pa.Table,
                           key_cols: tuple[str, str],
                           hot_cap: int = HOT_BUCKET_CAP) -> pa.Table:
    """Hash-bucket flavor: the group holds MANY (key) LSH buckets.  One
    lexsort finds group boundaries; singleton groups (the vast
    majority) are skipped wholesale; only colliding groups — each a
    handful of docs — loop to emit their triu pairs.  Groups above
    ``hot_cap`` members emit a connectivity-preserving star instead
    (see HOT_BUCKET_CAP)."""
    k0 = g[key_cols[0]].to_numpy()
    k1 = g[key_cols[1]].to_numpy()
    ids = g["doc_id"].to_numpy()
    order = np.lexsort((ids, k1, k0))
    k0s, k1s, ds = k0[order], k1[order], ids[order]
    start = np.empty(len(ds), dtype=bool)
    start[0] = True
    start[1:] = (k0s[1:] != k0s[:-1]) | (k1s[1:] != k1s[:-1])
    bounds = np.append(np.nonzero(start)[0], len(ds))
    sizes = np.diff(bounds)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for gi in np.nonzero(sizes > 1)[0]:          # colliding groups only
        members = np.unique(ds[bounds[gi]:bounds[gi + 1]])
        if len(members) < 2:
            continue
        if len(members) > hot_cap:               # hot bucket → star
            out_a.append(np.broadcast_to(members[0], len(members) - 1))
            out_b.append(members[1:])
            continue
        ai, bi = np.triu_indices(len(members), k=1)
        out_a.append(members[ai])
        out_b.append(members[bi])
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    return pa.table({"a": pa.array(np.concatenate(out_a)),
                     "b": pa.array(np.concatenate(out_b))})


def _distinct_pairs(pairs: ray.data.Dataset,
                    extra_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Distinct (a,b) rows via hash-bucket + per-bucket np.unique —
    no per-pair Python groups."""
    def bucketize(t: pa.Table) -> pa.Table:
        key = hash64_ints(t["a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003)
                          ^ t["b"].to_numpy().astype(np.uint64))
        return t.append_column("bucket",
                               pa.array((key % np.uint64(64)).astype(np.int64)))

    def uniq(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.empty(len(a), dtype=bool)
        if len(first):
            first[0] = True
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        out = {"a": pa.array(a[first]), "b": pa.array(b[first])}
        for c in extra_cols:
            out[c] = pa.array(g[c].to_numpy()[order][first])
        return pa.table(out)

    return (pairs.map_batches(bucketize, batch_format="pyarrow")
                 .groupby("bucket").map_groups(uniq, batch_format="pyarrow"))


def _bucketize_on(col: str, n_buckets: int = 64):
    def f(t: pa.Table) -> pa.Table:
        key = hash64_ints(t[col].to_numpy().astype(np.uint64))
        return t.append_column(
            "hbucket", pa.array((key % np.uint64(n_buckets)).astype(np.int64)))
    return f


def minhash_candidates(docs: ray.data.Dataset,
                       materialize_sigs: bool = False) -> tuple[ray.data.Dataset,
                                                                ray.data.Dataset]:
    """(signatures, distinct candidate pairs) for a documents dataset.

    Shuffle shape: (band_id, band_hash) rows re-key onto 64 hash
    buckets; per-bucket pair generation is one vectorized boundary scan
    (pairs_from_hash_bucket) — not one Python group per LSH bucket.

    ``materialize_sigs=True`` pins the signature table (bytes per doc ≈
    8×N_PERM) so multiple consumers don't re-run shingle+minhash — the
    legitimate use of ``materialize`` on a small reused intermediate."""
    sigs = docs.map_batches(minhash_batch, batch_format="pyarrow")
    if materialize_sigs:
        sigs = sigs.materialize()
    raw = (sigs.map_batches(bands_batch, batch_format="pyarrow")
               .map_batches(_bucketize_on("band_hash"), batch_format="pyarrow")
               .groupby("hbucket")
               .map_groups(lambda g: pairs_from_hash_bucket(
                   g.drop_columns(["hbucket"]), ("band_id", "band_hash")),
                   batch_format="pyarrow"))
    return sigs, _distinct_pairs(raw)


def verify_pairs_distributed(pairs: ray.data.Dataset,
                             sigs: ray.data.Dataset,
                             threshold: float) -> ray.data.Dataset:
    """Distributed signature verify: join candidate pairs to the
    signature table (both keyed by doc_id) with the partitioned
    ``hash_join`` — once per pair side — then estimate Jaccard from the
    joined signatures batch-vectorized.

    The driver never materializes the pair set or a signature dict: at
    100 TB the LSH candidates can be billions of rows, so the verify hop
    must be a shuffle (two doc_id-keyed joins moving 8×N_PERM bytes per
    matched row), not a ``to_pandas()`` + broadcast map."""
    from ..functions.joins import hash_join

    sig_a = sigs.map_batches(
        lambda t: pa.table({"a": t["doc_id"], "sig_a": t["sig"]}),
        batch_format="pyarrow")
    sig_b = sigs.map_batches(
        lambda t: pa.table({"b": t["doc_id"], "sig_b": t["sig"]}),
        batch_format="pyarrow")
    joined = hash_join(hash_join(pairs, sig_a, on=["a"]), sig_b, on=["b"])

    def verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "est_jaccard_pct": pa.array([], pa.int64())})
        sa = np.asarray(t["sig_a"].combine_chunks().flatten()).reshape(n, N_PERM)
        sb = np.asarray(t["sig_b"].combine_chunks().flatten()).reshape(n, N_PERM)
        est = (sa == sb).mean(axis=1)
        out = pa.table({
            "a": t["a"].cast(pa.int64()),
            "b": t["b"].cast(pa.int64()),
            "est_jaccard_pct": pa.array(np.round(est * 100).astype(np.int64)),
        })
        return out.filter(pa.array(est >= threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


def exact_jaccard_pair(text_a: str, text_b: str) -> tuple[int, int]:
    """(intersection, union) of word-SHINGLE_W-gram sets — integers, so
    thresholding is exact.  Uses the same tokenizer as the signatures
    (``_shingles``)."""
    A, B = set(_shingles(text_a)), set(_shingles(text_b))
    return len(A & B), len(A | B)


# ------------------------------------- exact n-gram Jaccard (inverted index)
def ngram_shingle_rows(t: pa.Table) -> pa.Table:
    """corpus batch → per-doc DISTINCT shingle-hash rows
    ``(sh, doc_id, n_sh)``.

    ``n_sh`` (the doc's distinct-shingle count) is replicated onto every
    shingle row — 8 B/row — so the pair stage never needs a join back to
    a per-doc table: set sizes ride along with the inverted index."""
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_numpy()
    if not len(ids):
        return pa.table({"sh": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "n_sh": pa.array([], pa.int64())})
    h, counts = _shingle_hashes(texts)
    docpos = np.repeat(np.arange(len(ids)), counts)
    order = np.lexsort((h, docpos))
    dp, hs = docpos[order], h[order]
    first = np.empty(len(dp), dtype=bool)
    first[0] = True
    first[1:] = (dp[1:] != dp[:-1]) | (hs[1:] != hs[:-1])
    dpu, hu = dp[first], hs[first]
    n_dist = np.bincount(dpu, minlength=len(ids))
    return pa.table({"sh": pa.array(hu.view(np.int64)),
                     "doc_id": pa.array(ids[dpu].astype(np.int64)),
                     "n_sh": pa.array(n_dist[dpu].astype(np.int64))})


def _ngram_pairs_bucket(g: pa.Table, max_df: int) -> pa.Table:
    """One hash bucket of the inverted index → candidate pair rows.
    One lexsort finds shingle-group boundaries; singleton shingles (the
    vast majority) are skipped wholesale; shingles shared by more than
    ``max_df`` docs are dropped entirely (boilerplate stop-shingles —
    the standard df cap that bounds pair fan-out to C(max_df,2) per
    shingle at any corpus size)."""
    sh = g["sh"].to_numpy()
    doc = g["doc_id"].to_numpy()
    nsh = g["n_sh"].to_numpy()
    order = np.lexsort((doc, sh))
    s_, d_, n_ = sh[order], doc[order], nsh[order]
    start = np.empty(len(s_), dtype=bool)
    if len(start):
        start[0] = True
        start[1:] = s_[1:] != s_[:-1]
    bounds = np.append(np.nonzero(start)[0], len(s_))
    sizes = np.diff(bounds)
    oa, ob, ona, onb = [], [], [], []
    for gi in np.nonzero((sizes > 1) & (sizes <= max_df))[0]:
        lo, hi = bounds[gi], bounds[gi + 1]
        dd_, nn_ = d_[lo:hi], n_[lo:hi]          # docs distinct (upstream)
        ai, bi = np.triu_indices(len(dd_), k=1)
        oa.append(dd_[ai]); ob.append(dd_[bi])
        ona.append(nn_[ai]); onb.append(nn_[bi])
    if not oa:
        e = pa.array([], pa.int64())
        return pa.table({"a": e, "b": e, "na": e, "nb": e})
    return pa.table({"a": pa.array(np.concatenate(oa)),
                     "b": pa.array(np.concatenate(ob)),
                     "na": pa.array(np.concatenate(ona)),
                     "nb": pa.array(np.concatenate(onb))})


def ngram_jaccard_pairs(docs: ray.data.Dataset,
                        tau_num: int = 7, tau_den: int = 10,
                        max_df: int = 64,
                        n_buckets: int = 64) -> ray.data.Dataset:
    """EXACT n-gram Jaccard near-dup pairs — no MinHash estimate, no
    all-pairs scan.  Distributed inverted-index algorithm:

    1. per-doc distinct shingle hashes, set size riding along
       (``ngram_shingle_rows`` — local, no shuffle);
    2. shuffle keyed by shingle hash; each shared shingle with
       df ≤ ``max_df`` emits its doc pairs (shuffle #1);
    3. shuffle keyed by (a,b); rows-per-pair = |A∩B| exactly, since
       each co-occurring shingle contributed one row; na/nb are
       constants per pair (shuffle #2); keep pairs with
       ``inter/union ≥ tau`` via integer cross-multiplication.

    The df cap prunes candidate *generation* only: a pair whose overlap
    lives entirely in >max_df boilerplate shingles is not reported.
    Both shuffles move fixed-width int rows, never text.  Output:
    ``(doc_a, doc_b, n_common, n_union)`` — all int64, oracle-exact."""
    rows = docs.map_batches(ngram_shingle_rows, batch_format="pyarrow")

    def bucketize_sh(t: pa.Table) -> pa.Table:
        b = (hash64_ints(t["sh"].to_numpy().view(np.uint64), seed=5)
             % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    pairs = (rows.map_batches(bucketize_sh, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(lambda g: _ngram_pairs_bucket(
                     g.drop_columns(["bucket"]), max_df),
                     batch_format="pyarrow"))

    def bucketize_pair(t: pa.Table) -> pa.Table:
        key = hash64_ints(t["a"].to_numpy().astype(np.uint64)
                          * np.uint64(1_000_003)
                          ^ t["b"].to_numpy().astype(np.uint64), seed=9)
        return t.append_column("bucket", pa.array(
            (key % np.uint64(n_buckets)).astype(np.int64)))

    def reduce_pairs(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(); b = g["b"].to_numpy()
        na = g["na"].to_numpy(); nb = g["nb"].to_numpy()
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        first = np.empty(len(a), dtype=bool)
        if len(first):
            first[0] = True
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(first)[0]
        inter = np.diff(np.append(starts, len(a)))
        a, b, na, nb = a[starts], b[starts], na[starts], nb[starts]
        union = na + nb - inter
        keep = tau_den * inter >= tau_num * union
        return pa.table({"doc_a": pa.array(a[keep]),
                         "doc_b": pa.array(b[keep]),
                         "n_common": pa.array(inter[keep].astype(np.int64)),
                         "n_union": pa.array(union[keep].astype(np.int64))})

    return (pairs.map_batches(bucketize_pair, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(lambda g: reduce_pairs(g.drop_columns(["bucket"])),
                             batch_format="pyarrow"))


# ------------------------------------------------- connected components
def connected_components(pairs: ray.data.Dataset,
                         max_rounds: int = 64) -> ray.data.Dataset:
    """Cluster near-dup pairs into components: (node, component) rows,
    component = min doc_id reachable.

    Distributed min-label propagation (the groupby-rounds pattern for
    when the candidate graph is NOT provably driver-small): each round
    is two hash-bucket shuffles —
      1. bucket by src: sorted-merge edges against current labels
         (vectorized searchsorted) → (dst, src_label) messages;
      2. bucket by node: min over (old label ∪ messages) → new labels.
    Converges in ≤ graph-diameter rounds; stops early when no label
    changed (labels only ever decrease, so equal label sums = fixed
    point).  Hitting ``max_rounds`` WITHOUT convergence raises instead
    of silently returning split components (a 64-hop near-dup chain is
    pathological; raise the cap explicitly if one is real).
    """

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        n = np.unique(t["src"].to_numpy())
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    def bucketize(col: str):
        # shares the module bucketizer; rename its hbucket → bucket so
        # drop_columns(["bucket"]) below stays uniform
        inner = _bucketize_on(col)

        def f(t: pa.Table) -> pa.Table:
            out = inner(t)
            return out.rename_columns(
                [c if c != "hbucket" else "bucket" for c in out.column_names])
        return f

    def dedup_nodes(g: pa.Table) -> pa.Table:
        n = np.unique(g["node"].to_numpy())
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
                   .map_batches(bucketize("node"), batch_format="pyarrow")
                   .groupby("bucket")
                   .map_groups(lambda g: dedup_nodes(g.drop_columns(["bucket"])),
                               batch_format="pyarrow")).materialize()

    def _label_sum(ds: ray.data.Dataset) -> int:
        return ds.map_batches(
            lambda t: pa.table({"s": pa.array([int(t["label"].to_numpy().sum())])}),
            batch_format="pyarrow").sum("s")

    prev_sum = _label_sum(labels)
    converged = False
    for _round in range(max_rounds):
        lbl_tagged = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "dst": t["label"],
                                "is_label": pa.array(np.ones(t.num_rows, bool))}),
            batch_format="pyarrow")
        edge_tagged = edges.map_batches(
            lambda t: t.append_column(
                "is_label", pa.array(np.zeros(t.num_rows, bool))),
            batch_format="pyarrow")

        def propagate(g: pa.Table) -> pa.Table:
            is_lbl = g["is_label"].to_numpy(zero_copy_only=False)
            src = g["src"].to_numpy()
            dst = g["dst"].to_numpy()
            lab_nodes = src[is_lbl]
            lab_vals = dst[is_lbl]
            order = np.argsort(lab_nodes)
            lab_nodes, lab_vals = lab_nodes[order], lab_vals[order]
            e_src, e_dst = src[~is_lbl], dst[~is_lbl]
            pos = np.searchsorted(lab_nodes, e_src)
            lbl_of_src = lab_vals[pos]              # every edge src has a label
            return pa.table({
                "node": pa.array(np.concatenate([e_dst, lab_nodes])),
                "cand": pa.array(np.concatenate([lbl_of_src, lab_vals])),
            })

        def min_label(g: pa.Table) -> pa.Table:
            node = g["node"].to_numpy()
            cand = g["cand"].to_numpy()
            order = np.lexsort((cand, node))
            ns, cs = node[order], cand[order]
            first = np.empty(len(ns), dtype=bool)
            first[0] = True
            first[1:] = ns[1:] != ns[:-1]
            return pa.table({"node": pa.array(ns[first]),
                             "label": pa.array(cs[first])})

        new_labels = (
            lbl_tagged.union(edge_tagged)
            .map_batches(bucketize("src"), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: propagate(g.drop_columns(["bucket"])),
                        batch_format="pyarrow")
            .map_batches(bucketize("node"), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: min_label(g.drop_columns(["bucket"])),
                        batch_format="pyarrow")
        ).materialize()

        # converged? labels only ever decrease, so an unchanged sum is a
        # fixed point — reuse last round's sum instead of re-aggregating
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            f"rounds — the candidate graph has a chain longer than the "
            f"cap; raise max_rounds")
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["label"]}),
        batch_format="pyarrow")


# ------------------------------------------------------------------ SimHash
def simhash_batch(t: pa.Table) -> pa.Table:
    """documents batch → (doc_id, simhash int64): sign-accumulated
    64-bit token-hash bits (Charikar 2002)."""
    texts = t["text"].to_pylist()
    tok_lists = [txt.split(" ") for txt in texts]
    counts = np.array([len(x) for x in tok_lists], dtype=np.int64)
    flat = [w for toks in tok_lists for w in toks]
    h = hash64(pa.array(flat, type=pa.string()))
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32)   # (N, 64) 0/1
    contrib = bits * 2 - 1
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sums = np.add.reduceat(contrib, starts, axis=0)            # (docs, 64)
    sig_bits = (sums > 0).astype(np.uint8)
    sig = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).reshape(-1)
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                     "simhash": pa.array(sig.astype(np.int64))})


def simhash_bands_batch(t: pa.Table) -> pa.Table:
    """4×16-bit pigeonhole chunks: any pair with hamming ≤ 3 shares ≥1
    chunk value."""
    sig = t["simhash"].to_numpy().astype(np.uint64)
    n = len(sig)
    chunks = np.empty((n, 4), dtype=np.uint64)
    for c in range(4):
        chunks[:, c] = (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
    return pa.table({
        "chunk_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
        "chunk_val": pa.array(chunks.reshape(-1).astype(np.int64)),
        "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), 4)),
        "simhash": pa.array(np.repeat(sig.astype(np.int64), 4)),
    })


def _simhash_pairs_hash_bucket(g: pa.Table,
                               hot_cap: int = HOT_BUCKET_CAP) -> pa.Table:
    """Vectorized over the whole hash bucket: boundary-scan the
    (chunk_id, chunk_val) groups, triu-pair only colliding ones,
    popcount hamming on the XOR of member signatures.  Groups above
    ``hot_cap`` emit a star ordered by (signature, id) — identical
    signatures sort adjacent, so the star center shares its exact
    signature with the whole degenerate run that caused the heat and
    the emitted pairs pass the hamming gate (see HOT_BUCKET_CAP)."""
    c0 = g["chunk_id"].to_numpy()
    c1 = g["chunk_val"].to_numpy()
    ids = g["doc_id"].to_numpy()
    sig = g["simhash"].to_numpy().astype(np.uint64)
    order = np.lexsort((ids, c1, c0))
    c0s, c1s, ds, ss = c0[order], c1[order], ids[order], sig[order]
    start = np.empty(len(ds), dtype=bool)
    start[0] = True
    start[1:] = (c0s[1:] != c0s[:-1]) | (c1s[1:] != c1s[:-1])
    bounds = np.append(np.nonzero(start)[0], len(ds))
    sizes = np.diff(bounds)
    As, Bs, Ha, Hb = [], [], [], []
    for gi in np.nonzero(sizes > 1)[0]:
        lo, hi = bounds[gi], bounds[gi + 1]
        m_ids, first = np.unique(ds[lo:hi], return_index=True)
        m_sig = ss[lo:hi][first]
        if len(m_ids) < 2:
            continue
        if len(m_ids) > hot_cap:                 # hot bucket → star
            o = np.lexsort((m_ids, m_sig))       # sig-major: dups adjacent
            m_ids, m_sig = m_ids[o], m_sig[o]
            ca = np.broadcast_to(m_ids[0], len(m_ids) - 1)
            cb = m_ids[1:]
            # canonical a<b so _distinct_pairs dedups across bands
            As.append(np.minimum(ca, cb))
            Bs.append(np.maximum(ca, cb))
            Ha.append(np.broadcast_to(m_sig[0], len(m_sig) - 1))
            Hb.append(m_sig[1:])
            continue
        ai, bi = np.triu_indices(len(m_ids), k=1)
        As.append(m_ids[ai]); Bs.append(m_ids[bi])
        Ha.append(m_sig[ai]); Hb.append(m_sig[bi])
    if not As:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    a = np.concatenate(As); b = np.concatenate(Bs)
    x = np.concatenate(Ha) ^ np.concatenate(Hb)
    ham = np.zeros(len(x), dtype=np.int64)
    for s in range(64):
        ham += ((x >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "hamming": pa.array(ham)})


def sig64_near_dups(sigs: ray.data.Dataset,
                    max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs among 64-bit signatures — input (doc_id:int64,
    simhash:int64), output distinct (a, b, hamming) with hamming ≤
    max_hamming.  The 4×16-bit pigeonhole banding tail of
    ``simhash_near_dups``, factored out so ANY 64-bit structural hash
    rides the same shuffle shape (SimHash text, pHash images — the
    perceptual-hash stage in ``stages/media.py`` feeds this)."""
    pairs = (sigs.map_batches(simhash_bands_batch, batch_format="pyarrow")
                 .map_batches(_bucketize_on("chunk_val"), batch_format="pyarrow")
                 .groupby("hbucket")
                 .map_groups(lambda g: _simhash_pairs_hash_bucket(
                     g.drop_columns(["hbucket"])), batch_format="pyarrow"))
    pairs = pairs.map_batches(
        lambda t: t.filter(pa.compute.less_equal(t["hamming"], max_hamming)),
        batch_format="pyarrow")
    return _distinct_pairs(pairs, extra_cols=("hamming",))


def simhash_near_dups(docs: ray.data.Dataset, max_hamming: int = 3) -> ray.data.Dataset:
    sigs = docs.map_batches(simhash_batch, batch_format="pyarrow")
    return sig64_near_dups(sigs, max_hamming=max_hamming)
