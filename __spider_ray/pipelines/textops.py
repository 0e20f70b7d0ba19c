"""Training-data ops over documents/embeddings: text analysis, dedup
suite, similarity search (first-class components per the build brief).

The dedup corpus is the ``documents`` table plus deterministically
injected duplicates (exact copies every 5th doc, near-copies with a
3-token suffix every 7th) so exact/near-dup behavior is observable at
every sf — the same injection is a SQL CTE for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages import dedup as dd
from ..stages import knn as knn_mod
from ..stages import text as tx
from .queries import register

NEAR_SUFFIX = " zzextra zzdup zztail"

CORPUS_CTE = f"""
corpus AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 100000 AS BIGINT), text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT CAST(doc_id + 200000 AS BIGINT), text || '{NEAR_SUFFIX}'
  FROM documents WHERE doc_id % 7 = 0
)"""


def _doc_blocks(sf_dir: str) -> int:
    """Block count scaled to the documents table: Ray's default split
    of a small single file is ~2×CPUs near-empty blocks, and every
    downstream sort/groupby pays per-block fixed costs — a 9k-row
    corpus in 192 blocks made each join shuffle ~10 s.  ~20k rows per
    block, clamped to [4, 4×CPUs]."""
    import pyarrow.parquet as pq
    import ray
    rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, min(rows // 20_000 + 1, 4 * cpus))


def corpus(sf_dir: str) -> ray.data.Dataset:
    """documents ∪ exact dups ∪ near dups (deterministic injection)."""
    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=_doc_blocks(sf_dir))

    def dup5(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % 5 == 0))           # pyarrow has no mod kernel
        return pa.table({"doc_id": pc.add(t["doc_id"].cast(pa.int64()), 100000),
                         "text": t["text"]})

    def near7(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % 7 == 0))
        txt = pc.binary_join_element_wise(t["text"], pa.scalar(NEAR_SUFFIX), "")
        return pa.table({"doc_id": pc.add(t["doc_id"].cast(pa.int64()), 200000),
                         "text": txt})

    def base_ids(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()), "text": t["text"]})

    return (base.map_batches(base_ids, batch_format="pyarrow")
                .union(base.map_batches(dup5, batch_format="pyarrow"))
                .union(base.map_batches(near7, batch_format="pyarrow")))


# ------------------------------------------------------------- text analysis
def q_text_stats(sf_dir: str):
    return corpus(sf_dir).map_batches(tx.text_stats_batch, batch_format="pyarrow")


SQL_TEXT_STATS = f"""WITH {CORPUS_CTE.strip()}
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_calc,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_n,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq_n,
  CAST(len(regexp_extract_all(text, '{tx.BPE_RE}')) AS BIGINT) AS bpe_n
FROM corpus
"""


def q_text_quality(sf_dir: str):
    return corpus(sf_dir).map_batches(tx.text_quality_batch, batch_format="pyarrow")


_EN = ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"])
SQL_TEXT_QUALITY = f"""WITH {CORPUS_CTE.strip()}
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_n,
  CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_EN}))) AS BIGINT) AS stop_n,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq_n,
  CAST(list_max(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS max_tok_len,
  CAST(len(list_filter(string_split(text, ' '), x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS digit_tok_n
FROM corpus
"""


def q_lang_id(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(tx.lang_id_batch, batch_format="pyarrow")


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
    return (f"CAST(len(list_filter(string_split(text, ' '), "
            f"x -> x IN ({words}))) AS BIGINT)")


SQL_LANG_ID = f"""
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    regexp_matches(text, '{tx.CJK_RE}') AS has_cjk,
    {_hits_sql('en')} AS hits_en,
    {_hits_sql('de')} AS hits_de,
    {_hits_sql('fr')} AS hits_fr,
    {_hits_sql('es')} AS hits_es
  FROM documents
)
SELECT doc_id,
  CASE WHEN has_cjk THEN 'zh'
       WHEN hits_en > 0 AND hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en'
       WHEN hits_de > 0 AND hits_de >= greatest(hits_en, hits_fr, hits_es) THEN 'de'
       WHEN hits_fr > 0 AND hits_fr >= greatest(hits_en, hits_de, hits_es) THEN 'fr'
       WHEN hits_es > 0 AND hits_es >= greatest(hits_en, hits_de, hits_fr) THEN 'es'
       ELSE 'unknown' END AS pred_lang,
  hits_en, hits_de, hits_fr, hits_es
FROM h
"""


def q_quality_filter(sf_dir: str):
    """Gopher/C4-style quality FILTER chain (not just scoring): keep
    docs with sane length, ≥2% stopword ratio and ≤10% digit tokens —
    integer-exact rules over the quality signals, applied in the same
    vectorized pass."""
    ds = corpus(sf_dir).map_batches(tx.text_quality_batch, batch_format="pyarrow")
    return ds.map_batches(lambda t: t.filter(tx.quality_keep_mask(t)),
                          batch_format="pyarrow")


SQL_QUALITY_FILTER = f"""WITH {CORPUS_CTE.strip()},
q AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_n,
    CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_EN}))) AS BIGINT) AS stop_n,
    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq_n,
    CAST(list_max(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS max_tok_len,
    CAST(len(list_filter(string_split(text, ' '), x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS digit_tok_n
  FROM corpus
)
SELECT * FROM q
WHERE tok_n BETWEEN 20 AND 80 AND stop_n*50 >= tok_n AND digit_tok_n*10 <= tok_n
"""


def q_winnow(sf_dir: str):
    """Winnowing rolling-hash fingerprints (Schleimer et al. 2003) —
    per-doc distinct-fp count, XOR digest and min fp.  Rows-only (a
    sliding-window-min over rolling hashes is not SQL-expressible);
    exactness vs a naive reference implementation is pytest-asserted."""
    return corpus(sf_dir).map_batches(tx.winnow_batch, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    return corpus(sf_dir).map_batches(tx.fingerprint_batch, batch_format="pyarrow")


SQL_FINGERPRINT = f"""WITH {CORPUS_CTE.strip()}
SELECT doc_id, md5(lower(text)) AS fp FROM corpus
"""


# -------------------------------------------------------------------- dedup
def q_dedup_exact(sf_dir: str):
    """A5/S9: exact dedup — hash-bucket by content fingerprint, then a
    vectorized per-bucket min-doc_id + copy count (one lexsort per
    bucket, no per-group Python)."""
    from ..functions.hashing import hash64
    ds = corpus(sf_dir).map_batches(tx.fingerprint_batch, batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64(t["fp"].combine_chunks()) % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def first_per_fp(g: pa.Table) -> pa.Table:
        fps = np.asarray(g["fp"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, fps))
        fs, is_ = fps[order], ids[order]
        first = np.empty(len(fs), dtype=bool)
        first[0] = True
        first[1:] = fs[1:] != fs[:-1]
        counts = np.diff(np.append(np.nonzero(first)[0], len(fs)))
        return pa.table({"fp": pa.array(fs[first]),
                         "doc_id": pa.array(is_[first]),
                         "n_copies": pa.array(counts.astype(np.int64))})
    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(first_per_fp, batch_format="pyarrow"))


SQL_DEDUP_EXACT = f"""WITH {CORPUS_CTE.strip()}
SELECT md5(lower(text)) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
FROM corpus GROUP BY md5(lower(text))
"""


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs (signature-estimate ≥ 70%).
    No SQL oracle (LSH is not SQL-expressible); exactness is covered by
    tests against brute-force n-gram Jaccard.

    Signatures are materialized once (a few MB — doc_id + 64×u64) and
    reused for band explosion AND pair verification; the verify itself
    is a distributed doc_id-keyed join (``verify_pairs_distributed``) —
    the driver never holds the candidate pair set."""
    docs = corpus(sf_dir)
    sigs, pairs = dd.minhash_candidates(docs, materialize_sigs=True)
    return dd.verify_pairs_distributed(pairs, sigs, threshold=0.7)


def q_dedup_clusters(sf_dir: str):
    """Near-dup clusters: MinHash pairs → distributed connected
    components (min-label propagation).  Rows-only; exactness asserted
    vs a union-find oracle in tests."""
    pairs = q_dedup_minhash(sf_dir).select_columns(["a", "b"])
    return dd.connected_components(pairs)


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (hamming ≤ 3). Rows-only (tested)."""
    return dd.simhash_near_dups(corpus(sf_dir), max_hamming=3)


def q_text_tfidf(sf_dir: str, k: int = 5):
    """Top-``k`` most characteristic terms per document, ranked by
    tf × linear-idf — i.e. by the RATIONAL ``tf/df`` — so the ranking
    is integer-exact (IEEE division is correctly rounded: equal
    rationals compare equal, unequal rationals with df < 1e6 differ by
    far more than one ulp), and the output is all int/string columns
    (``doc_id, term, tf, df, rnk``) → hash-stable against DuckDB.

    Two shuffles, no joins: tf rows are globally unique per (doc,term)
    because each doc's text is one row, so a term-keyed groupby yields
    df = segment length with the tf rows already in hand; a doc-keyed
    groupby then ranks.  The corpus-wide doc count N is not needed —
    linear idf N/df ranks identically to 1/df."""
    from ..functions.hashing import hash64, hash64_ints
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=_doc_blocks(sf_dir))

    def tf_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        toks: list[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):        # per-doc tokenize (inherent)
            w = [w_ for w_ in s.lower().split(" ") if w_]
            toks.extend(w)
            counts[i] = len(w)
        if not toks:
            return pa.table({"th": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        arr = pa.array(toks, type=pa.string())
        h = hash64(arr)
        docpos = np.repeat(np.arange(len(ids)), counts)
        order = np.lexsort((h, docpos))
        dp, hs = docpos[order], h[order]
        first = np.empty(len(dp), dtype=bool)
        first[0] = True
        first[1:] = (dp[1:] != dp[:-1]) | (hs[1:] != hs[:-1])
        starts = np.nonzero(first)[0]
        tf = np.diff(np.append(starts, len(dp)))
        keep = order[starts]                 # one representative token row
        return pa.table({"th": pa.array(hs[starts].view(np.int64)),
                         "term": arr.take(pa.array(keep)),
                         "doc_id": pa.array(ids[dp[starts]].astype(np.int64)),
                         "tf": pa.array(tf.astype(np.int64))})

    def bucket_th(t: pa.Table) -> pa.Table:
        b = (hash64_ints(t["th"].to_numpy().view(np.uint64), seed=3)
             % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def attach_df(g: pa.Table) -> pa.Table:
        th = g["th"].to_numpy()
        order = np.argsort(th, kind="stable")
        ths = th[order]
        first = np.empty(len(ths), dtype=bool)
        if len(first):
            first[0] = True
            first[1:] = ths[1:] != ths[:-1]
        seg = np.cumsum(first) - 1
        df = np.bincount(seg)[seg]           # segment length per row
        return pa.table({"term": g["term"].take(pa.array(order)),
                         "doc_id": pa.array(g["doc_id"].to_numpy()[order]),
                         "tf": pa.array(g["tf"].to_numpy()[order]),
                         "df": pa.array(df.astype(np.int64))})

    def bucket_doc(t: pa.Table) -> pa.Table:
        b = (hash64_ints(t["doc_id"].to_numpy().astype(np.uint64), seed=4)
             % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def rank_doc(g: pa.Table) -> pa.Table:
        # Arrow multi-key sort instead of a pandas object-dtype
        # DataFrame: strings never leave Arrow, no Python round-trip
        ratio = pc.divide(pc.cast(g["tf"], pa.float64()),
                          pc.cast(g["df"], pa.float64()))
        tbl = g.append_column("ratio", ratio)
        order = pc.sort_indices(tbl, sort_keys=[
            ("doc_id", "ascending"), ("ratio", "descending"),
            ("term", "ascending")])
        s = tbl.take(order)
        dids = s["doc_id"].to_numpy()
        if not len(dids):
            return g.append_column("rnk", pa.array([], pa.int64()))
        first = np.r_[True, dids[1:] != dids[:-1]]
        starts = np.nonzero(first)[0]
        seg = np.cumsum(first) - 1
        rnk = np.arange(len(dids), dtype=np.int64) - starts[seg] + 1
        s = s.drop_columns(["ratio"]).append_column("rnk", pa.array(rnk))
        return s.filter(pa.array(rnk <= k))

    return (ds.map_batches(tf_rows, batch_format="pyarrow")
              .map_batches(bucket_th, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: attach_df(g.drop_columns(["bucket"])),
                          batch_format="pyarrow")
              .map_batches(bucket_doc, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: rank_doc(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_TEXT_TFIDF = """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term <> '' GROUP BY 1, 2),
wdf AS (SELECT doc_id, term, tf,
               count(*) OVER (PARTITION BY term) AS df FROM tf)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tf * 1.0 / df DESC, term) AS BIGINT) AS rnk
FROM wdf QUALIFY rnk <= 5
"""


_EMAIL_RE = r"[a-z0-9]+@[a-z0-9.]+[a-z]"
_PHONE_RE = r"\+1-555-[0-9]+"


def q_text_pii_scrub(sf_dir: str):
    """PII redaction (the C4-style scrub pass): replace emails and
    phone numbers with typed markers and count the redactions.  The
    corpus carries no PII, so every 11th doc gets a deterministic
    synthetic contact line first — injected identically in the SQL
    oracle — and the scrubbed TEXT is part of the hash, so the regex
    semantics (leftmost, greedy, same char classes in Python re and
    DuckDB's RE2) are verified byte-for-byte."""
    import re
    email, phone = re.compile(_EMAIL_RE), re.compile(_PHONE_RE)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=_doc_blocks(sf_dir))

    def scrub(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out, n_em, n_ph = [], [], []
        for i, s in zip(ids, texts):
            if i % 11 == 0:
                s = f"{s} contact u{i}@mail.test or +1-555-{i} now"
            ne = len(email.findall(s))
            s = email.sub("<EMAIL>", s)
            np_ = len(phone.findall(s))
            s = phone.sub("<PHONE>", s)
            out.append(s); n_em.append(ne); n_ph.append(np_)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "text": pa.array(out, pa.string()),
                         "n_emails": pa.array(np.array(n_em, np.int64)),
                         "n_phones": pa.array(np.array(n_ph, np.int64))})

    return ds.map_batches(scrub, batch_format="pyarrow")


SQL_TEXT_PII = f"""
WITH pii AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN text || ' contact u' || doc_id
                   || '@mail.test or +1-555-' || doc_id || ' now'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS text,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(
              regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
              '{_PHONE_RE}')) AS BIGINT) AS n_phones
FROM pii
"""


def q_dedup_ngram(sf_dir: str):
    """EXACT n-gram Jaccard near-dup pairs (≥ 0.7) via a distributed
    inverted shingle index — the estimate-free counterpart of
    ``dedup_minhash``: two fixed-width-int shuffles (shingle-keyed pair
    generation with a df ≤ 64 stop-shingle cap, then pair-keyed
    intersection counting), fully SQL-expressible → DuckDB-oracled."""
    return dd.ngram_jaccard_pairs(corpus(sf_dir),
                                  tau_num=7, tau_den=10, max_df=64)


SQL_DEDUP_NGRAM = f"""WITH {CORPUS_CTE.strip()},
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM corpus),
sh AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS s
       FROM toks CROSS JOIN UNNEST(range(1,
            CASE WHEN len(ts) >= 3 THEN len(ts) - 1 ELSE 2 END)) AS u(i)),
nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
df AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 64),
pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       JOIN df ON df.s = a.s
       GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(na.n + nb.n - n_common AS BIGINT) AS n_union
FROM pr JOIN nsh na ON na.doc_id = pr.doc_a
        JOIN nsh nb ON nb.doc_id = pr.doc_b
WHERE 10 * n_common >= 7 * (na.n + nb.n - n_common)
"""


# ----------------------------------------------------------------- similarity
def q_knn_brute(sf_dir: str):
    return knn_mod.brute_force_topk(sf_dir, n_queries=10, k=5)


SQL_KNN_BRUTE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT 10
),
scored AS (
  SELECT q.query_id, e.vec_id,
    list_cosine_similarity(e.embedding, q.qe) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id)
       AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
"""


def q_knn_lsh(sf_dir: str):
    """ANN flavor (LSH multiprobe). Approximate → rows-only; recall vs
    brute force asserted in tests."""
    return knn_mod.lsh_topk(sf_dir, n_queries=10, k=5)


def q_knn_ivf(sf_dir: str):
    """ANN scale path (kmeans-IVF with spill assignment). Approximate →
    rows-only; recall + probe-fraction asserted in tests."""
    return knn_mod.ivf_topk(sf_dir, n_queries=10, k=5)


def q_knn_pq(sf_dir: str):
    """PQ-ADC top-k with exact rerank (32× code compression — the
    memory-bound ANN scale path).  Rows-only; recall and reconstruction
    asserted in tests."""
    return knn_mod.pq_topk(sf_dir, n_queries=10, k=5)


def q_emb_near_dups(sf_dir: str):
    return knn_mod.embedding_near_dups(sf_dir, threshold=0.2)


def q_dedup_keep_best(sf_dir: str):
    """Canonical selection per duplicate group (the training-data
    variant of exact dedup: keep the BEST copy, not the first) — group
    key md5(lower(text)), winner = longest text then lowest doc_id,
    hash-bucket shuffle + one lexsort per bucket."""
    from ..functions.hashing import hash64, md5_hex

    def fp_len(t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(t["text"])
        fp = pa.array(md5_hex(lowered.to_pylist()), pa.string())
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()), "fp": fp,
                         "n_chars": pc.utf8_length(t["text"]).cast(pa.int64())})

    ds = corpus(sf_dir).map_batches(fp_len, batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        b = (hash64(t["fp"].combine_chunks()) % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def best_per_fp(g: pa.Table) -> pa.Table:
        fps = np.asarray(g["fp"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy()
        nch = g["n_chars"].to_numpy()
        if not len(ids):
            return pa.table({"fp": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "n_copies": pa.array([], pa.int64())})
        order = np.lexsort((ids, -nch, fps))   # per fp: longest, then min id
        fs, is_, ns = fps[order], ids[order], nch[order]
        first = np.r_[True, fs[1:] != fs[:-1]]
        counts = np.diff(np.append(np.nonzero(first)[0], len(fs)))
        return pa.table({"fp": pa.array(fs[first]),
                         "doc_id": pa.array(is_[first]),
                         "n_chars": pa.array(ns[first].astype(np.int64)),
                         "n_copies": pa.array(counts.astype(np.int64))})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: best_per_fp(g.drop_columns(["bucket"])),
                          batch_format="pyarrow"))


SQL_DEDUP_KEEP_BEST = f"""WITH {CORPUS_CTE.strip()},
f AS (SELECT doc_id, md5(lower(text)) AS fp,
             CAST(len(text) AS BIGINT) AS n_chars FROM corpus),
r AS (SELECT fp, doc_id, n_chars,
             COUNT(*) OVER (PARTITION BY fp) AS cnt,
             row_number() OVER (PARTITION BY fp
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM f)
SELECT fp, doc_id, n_chars, CAST(cnt AS BIGINT) AS n_copies
FROM r WHERE rn = 1
"""


def q_emb_centroid_sums(sf_dir: str):
    """Per-label centroid of the embedding column, exposed as exact
    integer partial sums (floor(v*1e6) per component — floor, not
    round, so Python/DuckDB tie behavior can't diverge) plus counts:
    (label, dim, qsum, n).  Each batch collapses to label×dim partial
    rows via one reduceat over the stacked matrix — the groupby moves
    labels×64 rows per batch, never an embedding."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy().astype(np.int64)
        flat = np.asarray(t["embedding"].combine_chunks().flatten(),
                          dtype=np.float64)
        dim = len(flat) // max(1, len(lab))
        q = np.floor(flat * 1e6).astype(np.int64).reshape(len(lab), dim)
        order = np.argsort(lab, kind="mergesort")
        l_, q_ = lab[order], q[order]
        starts = np.nonzero(np.r_[True, l_[1:] != l_[:-1]])[0]
        sums = np.add.reduceat(q_, starts, axis=0)       # (n_labels, dim)
        cnt = np.diff(np.append(starts, len(l_)))
        n_lab = len(starts)
        return pa.table({
            "label": pa.array(np.repeat(l_[starts], dim)),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    n_lab)),
            "qsum": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(cnt, dim).astype(np.int64))})

    def reduce_group(g: pa.Table) -> pa.Table:
        return pa.table({"label": g["label"][:1], "dim": g["dim"][:1],
                         "qsum": pa.array([int(g["qsum"].to_numpy().sum())],
                                          pa.int64()),
                         "n": pa.array([int(g["n"].to_numpy().sum())],
                                       pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["label", "dim"])
              .map_groups(reduce_group, batch_format="pyarrow"))


def q_pack_sequences(sf_dir: str):
    """Greedy next-fit sequence packing (the final stage of an LLM
    training-data pipeline): docs concatenated into 160-token-budget
    sequences without splitting a doc, packed independently per
    ``source`` shard in doc_id order — the documented partitioning
    assumption a sharded sequence-writer makes at 100 TB.  Per shard
    the pack costs one np.searchsorted per EMITTED SEQUENCE (not per
    doc).  Oracled against a DuckDB recursive CTE."""
    from ..stages import pack

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])

    def tok_counts(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], pattern=" "))
        return pa.table({"source": t["source"],
                         "doc_id": t["doc_id"].cast(pa.int64()),
                         "tok_n": n.cast(pa.int64())})

    return (ds.map_batches(tok_counts, batch_format="pyarrow")
              .groupby("source")
              .map_groups(pack.pack_group, batch_format="pyarrow"))


from ..stages.pack import PACK_BUDGET as _PACK_B

SQL_PACK_SEQUENCES = f"""
WITH RECURSIVE w AS (
  SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_n,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents),
p AS (
  SELECT source, doc_id, tok_n, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_pos,
         CAST(0 AS BIGINT) AS tok_offset, tok_n AS used
  FROM w WHERE rn = 1
  UNION ALL
  SELECT w.source, w.doc_id, w.tok_n, w.rn,
         CASE WHEN p.used + w.tok_n > {_PACK_B} THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.used + w.tok_n > {_PACK_B} THEN 0 ELSE p.seq_pos + 1 END,
         CASE WHEN p.used + w.tok_n > {_PACK_B} THEN 0 ELSE p.used END,
         CASE WHEN p.used + w.tok_n > {_PACK_B} THEN w.tok_n ELSE p.used + w.tok_n END
  FROM w JOIN p ON w.source = p.source AND w.rn = p.rn + 1
)
SELECT source, doc_id, tok_n, seq_id, seq_pos, tok_offset FROM p
"""


def q_repetition(sf_dir: str):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): per
    doc, total word 2-grams, occurrences beyond each distinct 2-gram's
    first, and the most-repeated 2-gram's count — integer-exact so the
    oracle hashes match.  Shuffle-free map_batches; the per-doc stats
    come from one (row, gram-hash) lexsort per batch."""
    from ..stages import text as tx

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(tx.repetition_batch, batch_format="pyarrow")


SQL_REPETITION = """
WITH w AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g2
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t),
c AS (SELECT doc_id, g2, count(*) AS cnt FROM g GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n2,
       CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS dup2,
       CAST(MAX(cnt) AS BIGINT) AS top2
FROM c GROUP BY doc_id
"""


def q_approx_distinct(sf_dir: str):
    """Grouped APPROX COUNT DISTINCT via HyperLogLog: distinct users
    per event type, estimated from mergeable 4 KiB register sketches
    instead of shuffling (group, value) pairs — per-batch partials via
    one np.maximum.at scatter, then a groupby(key) max-merge.  Rows
    only (an estimator can't hash-match SQL); tests pin the estimate
    within the sketch's error bound against exact counts at both the
    linear-counting and the high-cardinality regime."""
    from ..stages import sketch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return (ds.map_batches(
                lambda t: sketch.hll_partial_batch(t, "event_type", "user_id"),
                batch_format="pyarrow")
              .groupby("event_type")
              .map_groups(lambda g: sketch.hll_merge_group(g, "event_type"),
                          batch_format="pyarrow"))


def benchmark_gram_set(ds: ray.data.Dataset) -> np.ndarray:
    """Distributed benchmark-gram extraction reduced to ONE sorted
    uint64 hash array on the driver (bounded: a benchmark suite is
    fixed-size regardless of corpus scale) — shared by the standalone
    decontamination query and the corpus-build composite."""
    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].cast(pa.int64()).to_numpy()
        return tx.gram_hash_table(t.filter(pa.array(ids % tx.DECON_MOD == 0)))

    parts = [b["gram"].to_numpy()
             for b in ds.map_batches(bench_grams, batch_format="pyarrow")
                        .iter_batches(batch_format="pyarrow")]
    return np.unique(np.concatenate(parts).astype(np.uint64)) if parts \
        else np.empty(0, dtype=np.uint64)


def _incremental_dedup(sf_dir: str, seen) -> "ray.data.Dataset":
    """Shared incremental-dedup shape: commit the base corpus's content
    fingerprints into a sharded seen-set (``seen``: ExactSeenSet or
    UrlSeenSet client), then stream the delta against it.  Two passes
    with a natural barrier between them (state build, then probe) —
    the incremental shape a daily corpus refresh runs, where
    re-shuffling the full old corpus per delta (the join alternative)
    is exactly what the persistent actor state avoids."""
    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def insert(t: pa.Table) -> pa.Table:
        fp = pc.utf8_lower(t["text"])
        seen.add(fp.combine_chunks()
                 if isinstance(fp, pa.ChunkedArray) else fp)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    base.map_batches(insert, batch_format="pyarrow").count()   # barrier

    delta = corpus(sf_dir).map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 100000)),
        batch_format="pyarrow")

    def probe(t: pa.Table) -> pa.Table:
        fp = pc.utf8_lower(t["text"])
        mask = seen.contains(fp.combine_chunks()
                             if isinstance(fp, pa.ChunkedArray) else fp)
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(mask))})

    return delta.map_batches(probe, batch_format="pyarrow")


def q_dedup_incremental(sf_dir: str):
    """Continual-pretraining dedup, EXACT flavor (oracle-checked):
    yesterday's corpus is committed into sharded EXACT seen-set actors
    (full 64-bit content hashes, sorted-array probes — the same
    shared-mutable-state layer the Dataset API can't express), then
    today's delta streams against it and surfaces the already-seen
    docs.  Output: (doc_id) of delta docs whose exact content was
    already in the base corpus.

    An exact structure is required here because the result is checked
    against an exact SQL oracle: the cuckoo filter's 16-bit
    fingerprints false-positive at ~2·b/2^16 per probe as load grows,
    which would flag never-seen delta docs at larger corpus sizes
    (round-3 advice).  The approximate flavor survives as the
    rows-only ``dedup_incremental_cuckoo``.

    The base corpus is ``documents``; the delta is the injected-dup
    tail of the shared dedup corpus (doc_id ≥ 100000: exact copies and
    suffix near-copies) — only the exact copies match by fingerprint.
    """
    from ..state.url_seen import ExactSeenSet
    return _incremental_dedup(sf_dir, ExactSeenSet(n_shards=4))


class _CuckooSeenAdapter:
    """UrlSeenSet with the add/contains verbs _incremental_dedup uses."""

    def __init__(self, n_shards: int = 4, n_buckets: int = 1 << 16):
        from ..state.url_seen import UrlSeenSet
        self._set = UrlSeenSet(n_shards=n_shards, n_buckets=n_buckets)

    def add(self, values) -> None:
        self._set.check_and_add(values)

    def contains(self, values):
        return self._set.contains(values)


def q_dedup_incremental_cuckoo(sf_dir: str):
    """Approximate flavor of incremental dedup on the crawl engine's
    cuckoo seen-set shards — ~2 bytes/key instead of 8, at the cost of
    a bounded false-positive rate (~2·b/2^16 per probe at bucket size
    b and full load; zero false NEGATIVES).  Rows-only by design: the
    FP bound means the result is a superset of the exact answer, the
    right trade for fetch-skip heuristics but not for an
    oracle-checked dedup (see q_dedup_incremental)."""
    return _incremental_dedup(sf_dir, _CuckooSeenAdapter())


SQL_DEDUP_INCREMENTAL = f"""WITH {CORPUS_CTE.strip()},
old AS (SELECT DISTINCT lower(text) AS fp FROM documents)
SELECT doc_id FROM (SELECT doc_id, lower(text) AS fp FROM corpus
                    WHERE doc_id >= 100000)
WHERE fp IN (SELECT fp FROM old)
"""


def q_corpus_build(sf_dir: str):
    """The end-to-end LLM training-corpus pipeline, composed from the
    suite's stages the way a real 100 TB run chains them — every stage
    a streaming Dataset transform, no driver-side rows:

    1. quality FILTER (length / stopword / digit rules, vectorized);
    2. benchmark DECONTAMINATION (drop docs sharing a 4-gram with the
       held-out doc_id % 19 subset; benchmark docs leave the corpus
       too — they are the eval set);
    3. global SEGMENT DEDUP (8-word first-occurrence keep, one
       hash-keyed shuffle) and per-doc REASSEMBLY of surviving
       segments (bucketed lexsort + one binary_join per bucket);
    4. sequence PACKING (next-fit per source shard, 160-token budget).

    Output: per-doc packing assignments over the cleaned corpus —
    (source, doc_id, tok_n, seq_id, seq_pos, tok_offset).  Rows-only
    (the composite is checked stage-by-stage by its member oracles;
    pytest pins monotonic shrinkage and run-to-run determinism)."""
    from ..functions.hashing import hash64
    from ..functions.joins import hash_join
    from ..stages import pack
    from ..stages import text as tx2

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])

    # -- 1. quality filter (the shared Gopher/C4 keep rule)
    def keep_quality(t: pa.Table) -> pa.Table:
        return t.filter(tx2.quality_keep_mask(tx2.text_quality_batch(t)))

    clean = ds.map_batches(keep_quality, batch_format="pyarrow")

    # -- 2. decontaminate (broadcast benchmark grams; drop benchmark docs)
    bench_ref = ray.put(benchmark_gram_set(ds))

    def drop_contaminated(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].cast(pa.int64()).to_numpy()
        t = t.filter(pa.array(ids % tx2.DECON_MOD != 0))
        hits = tx2.contamination_batch(t, bench_ref)
        bad = set(hits["doc_id"].to_numpy().tolist())
        ids = t["doc_id"].cast(pa.int64()).to_numpy()
        return t.filter(pa.array(~np.isin(ids, np.fromiter(bad, np.int64,
                                                           len(bad)))))

    decon = clean.map_batches(drop_contaminated, batch_format="pyarrow")

    # -- 3. segment dedup + reassembly
    n_buckets = _doc_blocks(sf_dir) * 4

    def explode(t: pa.Table) -> pa.Table:
        s = tx2.segment_table(t.select(["doc_id", "text"]))
        b = (hash64(s["segment"]) % np.uint64(n_buckets)).astype(np.int64)
        return s.append_column("bucket", pa.array(b))

    kept = (decon.map_batches(explode, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(tx2.segment_keep_first, batch_format="pyarrow"))

    def rebucket(t: pa.Table) -> pa.Table:
        b = (t["doc_id"].to_numpy() % np.int64(n_buckets))
        return t.append_column("bucket", pa.array(b))

    def reassemble(g: pa.Table) -> pa.Table:
        """One doc_id bucket → (doc_id, text): lexsort by (doc,
        seg_idx), list offsets per doc, one binary_join."""
        g = g.drop_columns(["bucket"])
        doc = g["doc_id"].to_numpy()
        seg_idx = g["seg_idx"].to_numpy()
        order = np.lexsort((seg_idx, doc))
        doc_s = doc[order]
        segs = g["segment"].take(pa.array(order)).combine_chunks()
        new = np.concatenate([[True], doc_s[1:] != doc_s[:-1]])
        counts = np.diff(np.append(np.nonzero(new)[0], len(doc_s)))
        offsets = np.append(0, np.cumsum(counts)).astype(np.int32)
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), segs), " ")
        return pa.table({"doc_id": pa.array(doc_s[new]), "text": text})

    rebuilt = (kept.map_batches(rebucket, batch_format="pyarrow")
                   .groupby("bucket")
                   .map_groups(reassemble, batch_format="pyarrow"))

    # -- 4. pack per source shard.  Source is re-attached from a
    # column-pruned re-read of the RAW table, not from `decon`: Ray
    # re-executes shared lineage per consuming branch, so hanging a
    # second branch off `decon` would run quality+decontamination
    # twice; the raw (doc_id, source) projection is nearly free and
    # the inner join keeps exactly the cleaned docs.
    src = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "source"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                            "source": t["source"]}),
        batch_format="pyarrow")
    withsrc = hash_join(rebuilt, src, on=["doc_id"], n_buckets=16)

    def tok_counts(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], pattern=" "))
        return pa.table({"source": t["source"],
                         "doc_id": t["doc_id"],
                         "tok_n": n.cast(pa.int64())})

    return (withsrc.map_batches(tok_counts, batch_format="pyarrow")
                   .groupby("source")
                   .map_groups(pack.pack_group, batch_format="pyarrow"))


CM_PROBE_TOKENS = sorted({w for ws in tx.STOPWORDS.values() for w in ws})


def q_cm_token_freq(sf_dir: str):
    """Token-frequency estimates from a count-min sketch (Cormode &
    Muthukrishnan 2005): per-batch (d×w) counter partials over the
    corpus word stream — 64 KiB of monoid state per block instead of
    the exact groupby(token) shuffle — merged with an elementwise sum,
    then probed for the fixed stopword battery.  Rows-only (an
    estimator can't hash-match SQL); tests pin the one-sided error
    (never under, over ≤ εN) against exact counts."""
    from ..stages import sketch

    ds = corpus(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        cm = sketch.cm_partial(flat)
        return pa.table({"k": pa.array([0], pa.int8()),
                         "cm": pa.array([cm.tobytes()], pa.binary()),
                         "n": pa.array([len(flat)], pa.int64())})

    def merge_and_probe(g: pa.Table) -> pa.Table:
        cm = np.zeros((sketch.CM_D, sketch.CM_W), dtype=np.int64)
        for buf in g["cm"].to_pylist():
            cm += np.frombuffer(buf, dtype=np.int64).reshape(cm.shape)
        probes = pa.array(CM_PROBE_TOKENS, pa.string())
        return pa.table({"token": probes,
                         "est_n": pa.array(sketch.cm_query(cm, probes)),
                         "stream_n": pa.array(
                             np.full(len(CM_PROBE_TOKENS),
                                     int(g["n"].to_numpy().sum()), np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("k")
              .map_groups(merge_and_probe, batch_format="pyarrow"))


def q_approx_quantiles(sf_dir: str):
    """Grouped APPROX quantiles (p50/p90/p99 of value per event type)
    via a DDSketch-style log-bucket sketch (Masson et al. 2019):
    per-batch (group, bucket, n) partials bounded by the value
    domain's log-resolution, summed through one groupby — never a
    per-group sort, never (group, value) rows on the wire.  Rows-only
    (an estimator can't hash-match SQL); tests pin the alpha
    relative-error guarantee against exact rank statistics and the
    exact-merge property.  The EXACT grouped quantiles live in
    ``rel_events_quantiles`` (oracle); this is the sketch the same
    report would use at 100 TB."""
    from ..stages import sketch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return (ds.map_batches(
                lambda t: sketch.dd_partial_batch(t, "event_type", "value"),
                batch_format="pyarrow")
              .groupby("event_type")
              .map_groups(
                lambda g: sketch.dd_quantiles_group(g, "event_type"),
                batch_format="pyarrow"))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 App. C style n-gram overlap):
    flag every corpus doc sharing ≥1 distinct word 4-gram with the
    "benchmark" subset (docs with doc_id % 19 == 0 stand in for a
    held-out eval suite).  Scale shape: the benchmark grams are
    extracted distributed, reduced to a sorted uint64 hash array on the
    driver (bounded — a benchmark suite is fixed-size regardless of
    corpus scale), broadcast once via ``ray.put``, and the corpus pass
    is a single shuffle-free map_batches doing one ``searchsorted`` per
    batch.  Output: (doc_id, n_hits = distinct contaminated grams)."""
    import numpy as np

    from ..stages import text as tx

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    ref = ray.put(benchmark_gram_set(ds))

    def corpus_hits(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].cast(pa.int64()).to_numpy()
        return tx.contamination_batch(
            t.filter(pa.array(ids % tx.DECON_MOD != 0)), ref)

    return ds.map_batches(corpus_hits, batch_format="pyarrow")


def q_segment_dedup(sf_dir: str):
    """C4-style global line dedup over the injected corpus: explode
    docs into 8-word segments, keep each distinct segment's FIRST
    occurrence corpus-wide (order by doc_id, seg_idx).  One shuffle,
    keyed by segment hash (64-bit FNV routes; the keep-first compare
    runs on the actual strings, so hash collisions cannot merge
    segments); per-bucket resolution is a single vectorized sort."""
    from ..functions.hashing import hash64
    from ..stages import text as tx

    n_buckets = _doc_blocks(sf_dir) * 4

    def explode(t: pa.Table) -> pa.Table:
        s = tx.segment_table(t)
        b = (hash64(s["segment"]) % np.uint64(n_buckets)).astype(np.int64)
        return s.append_column("bucket", pa.array(b))

    return (corpus(sf_dir)
            .map_batches(explode, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(tx.segment_keep_first, batch_format="pyarrow"))


SQL_SEGMENT_DEDUP = f"""WITH {CORPUS_CTE.strip()},
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
segs AS (SELECT doc_id, i - 1 AS seg_idx,
         array_to_string(ws[(i-1)*{tx.SEG_W}+1:(i-1)*{tx.SEG_W}+{tx.SEG_W}], ' ') AS segment
         FROM w, LATERAL (SELECT unnest(generate_series(1,
              CAST(ceil(len(ws)/{tx.SEG_W}.0) AS BIGINT))) AS i) t)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
       segment
FROM segs QUALIFY row_number() OVER (PARTITION BY segment
                                     ORDER BY doc_id, seg_idx) = 1
"""


SQL_DECONTAMINATE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, array_to_string(ws[i:i+{tx.DECON_N - 1}], ' ') AS g4
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - {tx.DECON_N - 1})) AS i) t),
bench AS (SELECT DISTINCT g4 FROM g WHERE doc_id % {tx.DECON_MOD} = 0),
hits AS (SELECT g.doc_id, count(DISTINCT g.g4) AS n_hits
         FROM g JOIN bench USING (g4)
         WHERE g.doc_id % {tx.DECON_MOD} <> 0 GROUP BY g.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_hits AS BIGINT) AS n_hits
FROM hits
"""


def q_emb_covariance(sf_dir: str):
    """Embedding second-moment (covariance/PCA-whitening prep): the
    d×d Gram accumulation Σ qᵀq over the corpus, with components
    quantized to integers (floor(v·10⁶)) so the sum is EXACT and the
    DuckDB oracle hash-matches.  Per batch ONE int64 matmul produces
    the full d×d partial — the shuffle carries d² rows per block, the
    corpus rows never move; a final tiny groupby sums partials."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        d = len(col[0])
        m = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, d)
        q = np.floor(m * 1_000_000).astype(np.int64)
        gram = q.T @ q                                  # (d, d) exact int64
        i = np.repeat(np.arange(1, d + 1, dtype=np.int64), d)
        j = np.tile(np.arange(1, d + 1, dtype=np.int64), d)
        return pa.table({"i": pa.array(i), "j": pa.array(j),
                         "qsum": pa.array(gram.reshape(-1)),
                         "n": pa.array(np.full(d * d, len(m), np.int64))})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["i", "j"])
              .aggregate(Sum("qsum", alias_name="qsum"),
                         Sum("n", alias_name="n")))


SQL_EMB_COVARIANCE = """
WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                       AS BIGINT) AS qv
           FROM embeddings)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
       CAST(SUM(a.qv * b.qv) AS BIGINT) AS qsum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i
"""


SQL_EMB_CENTROIDS = """
WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                  unnest(embedding) AS v
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(floor(CAST(v AS DOUBLE)*1000000) AS BIGINT)) AS BIGINT)
         AS qsum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
"""


register("text_stats", q_text_stats, SQL_TEXT_STATS)
register("text_quality", q_text_quality, SQL_TEXT_QUALITY)
register("text_lang_id", q_lang_id, SQL_LANG_ID)
register("text_fingerprint", q_fingerprint, SQL_FINGERPRINT)
register("text_quality_filter", q_quality_filter, SQL_QUALITY_FILTER)
register("text_winnow", q_winnow, None)
register("dedup_exact", q_dedup_exact, SQL_DEDUP_EXACT)
register("dedup_minhash", q_dedup_minhash, None)
register("dedup_clusters", q_dedup_clusters, None)
register("dedup_simhash", q_dedup_simhash, None)
register("dedup_ngram", q_dedup_ngram, SQL_DEDUP_NGRAM)
register("text_tfidf", q_text_tfidf, SQL_TEXT_TFIDF)
register("text_pii_scrub", q_text_pii_scrub, SQL_TEXT_PII)
register("knn_brute_topk", q_knn_brute, SQL_KNN_BRUTE)
register("knn_lsh_topk", q_knn_lsh, None)
register("knn_ivf_topk", q_knn_ivf, None)
register("knn_pq_topk", q_knn_pq, None)
register("emb_near_dups", q_emb_near_dups, None)
register("dedup_keep_best", q_dedup_keep_best, SQL_DEDUP_KEEP_BEST)
register("emb_centroid_sums", q_emb_centroid_sums, SQL_EMB_CENTROIDS)
register("emb_covariance", q_emb_covariance, SQL_EMB_COVARIANCE)
register("text_decontaminate", q_decontaminate, SQL_DECONTAMINATE)
register("text_segment_dedup", q_segment_dedup, SQL_SEGMENT_DEDUP)
register("agg_approx_distinct", q_approx_distinct, None)
register("text_repetition", q_repetition, SQL_REPETITION)
register("agg_cm_token_freq", q_cm_token_freq, None)
register("agg_approx_quantiles", q_approx_quantiles, None)
register("dedup_semantic", lambda sf: knn_mod.semantic_dedup(sf), None)
register("pipeline_corpus_build", q_corpus_build, None)
register("dedup_incremental", q_dedup_incremental, SQL_DEDUP_INCREMENTAL)
register("dedup_incremental_cuckoo", q_dedup_incremental_cuckoo, None)
def q_char_lm_quality(sf_dir: str):
    """Model-based quality scoring (KenLM-style, byte-bigram flavor):
    train a Laplace-smoothed byte-bigram LM ON the corpus, broadcast
    the 512 KiB log-prob table once (ray.put), and score every doc's
    mean byte log-probability in one vectorized pass.

    Scale shape: training is a sum-monoid over (pair_id, n) partials
    bounded by the 65,536-pair DOMAIN (value-domain compression — the
    shuffle never carries tokens), the final merge is a <=64k-row
    driver pull, and scoring is a stateless map over broadcast state.
    Rows-only (a trained-model score has no SQL oracle); the property
    tests pin exactness of the distributed counts, batch-invariance of
    scoring, and that in-distribution text outscores random bytes."""
    import ray as _ray

    from ray.data.aggregate import Sum
    from ..stages.text import (char_bigram_pair_counts,
                               char_lm_logprob_table, char_lm_score_batch)

    counts_tbl = (corpus(sf_dir)
                  .map_batches(lambda t: char_bigram_pair_counts(t["text"]),
                               batch_format="pyarrow")
                  .groupby("pair_id").aggregate(Sum("n", alias_name="n")))
    merged = {r["pair_id"]: r["n"] for r in counts_tbl.take_all()}
    logp_ref = _ray.put(char_lm_logprob_table(merged))

    def score(t):
        return char_lm_score_batch(t, _ray.get(logp_ref))

    return corpus(sf_dir).map_batches(score, batch_format="pyarrow")


register("text_pack_sequences", q_pack_sequences, SQL_PACK_SEQUENCES)
register("text_char_lm_quality", q_char_lm_quality, None)


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    language, split the corpus into head/middle/tail terciles by LM
    score — the standard recipe for perplexity-stratified sampling.

    Tercile cuts are EXACT, via the same value-domain compression the
    exact-median op uses: LM scores are already integers (milli-nats),
    so (lang, score) counts aggregate first — bounded by the score
    domain, not the corpus — and each language's 1/3 and 2/3 cuts come
    from cumulative counts (lower-quantile semantics).  Pass 2 assigns
    buckets against the broadcast per-lang cut map.  Output: (lang,
    bucket, n_docs) counts.  Rows-only: the LM is trained state."""
    import ray as _ray

    from ray.data.aggregate import Count, Sum
    from ..stages.text import lang_id_batch

    scored = q_char_lm_quality(sf_dir)
    # language per doc (doc_id join-free: recompute lang from the same
    # corpus pass — lang_id is deterministic)
    langs = corpus(sf_dir).map_batches(lang_id_batch, batch_format="pyarrow")

    def key_score(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "s": t["lm_milli_nats"]})

    smap = scored.map_batches(key_score, batch_format="pyarrow")
    from ..functions.joins import hash_join
    joined = hash_join(langs, smap, ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["pred_lang"], "s": t["s"]}) \
              .group_by(["lang", "s"]).aggregate([("s", "count")])
        return g.rename_columns(["lang", "s", "n"])

    counts = (joined.map_batches(partial, batch_format="pyarrow")
              .groupby(["lang", "s"]).aggregate(Sum("n", alias_name="n")))

    def cuts_of(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "c1": pa.array([], pa.int64()),
                             "c2": pa.array([], pa.int64())})
        s = g["s"].to_numpy()
        n = g["n"].to_numpy()
        order = np.argsort(s, kind="stable")
        s, n = s[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        def q(frac):
            k = (total - 1) * frac
            return int(s[np.searchsorted(cum, int(k), side="right")])
        return pa.table({"lang": [g["lang"][0].as_py()],
                         "c1": pa.array([q(1 / 3)], pa.int64()),
                         "c2": pa.array([q(2 / 3)], pa.int64())})

    cut_rows = counts.groupby("lang").map_groups(
        cuts_of, batch_format="pyarrow").take_all()      # ≤ n_langs rows
    cmap = {r["lang"]: (r["c1"], r["c2"]) for r in cut_rows}

    def assign(t: pa.Table) -> pa.Table:
        lang = t["pred_lang"].to_pylist()
        s = t["s"].to_numpy()
        c1 = np.array([cmap[v][0] for v in lang], dtype=np.int64)
        c2 = np.array([cmap[v][1] for v in lang], dtype=np.int64)
        # higher score = more in-distribution = "head" (CCNet keeps the
        # LOW-perplexity head; milli-nat log-prob is inverted perplexity)
        bucket = np.where(s > c2, "head",
                          np.where(s > c1, "middle", "tail"))
        return pa.table({"lang": t["pred_lang"].cast(pa.string()),
                         "bucket": pa.array(bucket, pa.string())})

    return (joined.map_batches(assign, batch_format="pyarrow")
            .groupby(["lang", "bucket"])
            .aggregate(Count(alias_name="n_docs")))
register("text_ccnet_buckets", q_ccnet_buckets, None)


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training over the corpus (30 merges;
    see stages/bpe.py for the scale shape).  Rows-only: the merge
    table is a learned artifact, pinned instead by a scalar-reference
    test and determinism/convention unit tests."""
    from ..stages.bpe import train_bpe
    return train_bpe(corpus(sf_dir), n_merges=30)
register("text_bpe_merges", q_bpe_merges, None)


def q_bpe_encode(sf_dir: str):
    """Tokenize the corpus under the 30-merge BPE table trained on it:
    train (distributed), broadcast the merge-rank map (tiny), encode
    every doc in one stateless pass with per-batch distinct-word
    memoization.  Output: per-doc BPE token and word counts."""
    import ray as _ray
    from ..stages.bpe import bpe_encode_batch, train_bpe
    merges = train_bpe(corpus(sf_dir), n_merges=30)
    ranks = {(a, b): int(r) for r, a, b in zip(
        merges["rank"].to_pylist(), merges["left"].to_pylist(),
        merges["right"].to_pylist())}
    ref = _ray.put(ranks)

    def enc(t):
        return bpe_encode_batch(t, _ray.get(ref))

    return corpus(sf_dir).map_batches(enc, batch_format="pyarrow")
register("text_bpe_encode", q_bpe_encode, None)
