"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The real algorithm, expressed Ray-Data-first: the corpus reduces ONCE
to a (word, count) frequency table (vocabulary-bounded shuffle), then
each merge round is

    symbol table ──map_batches──► (pair_id, n) partials   [domain-bounded]
                 ──groupby sum──► global pair counts
                 ──top-1 (count desc, pair asc)──► the merge rule
    symbol table ──map_batches(apply merge)──► next round's table

so the driver only ever holds ONE (pair, count) row per round plus the
merge list; the symbol table itself stays a distributed Dataset and is
re-materialized per round (merges shrink it monotonically).  At corpus
scale the word-frequency reduction is where the data-size drop happens
— 10^12 tokens become ~10^8 distinct words — exactly why classical BPE
trainers operate on frequencies, not tokens.

Pair application is exact greedy left-to-right (overlapping
occurrences of a self-pair like (a,a) in "a a a" merge leftmost-first,
and self-pair COUNTS are the actual greedy merge yield, floor(run/2),
not run−1).  The per-word loops below run over the DISTINCT-WORD
frequency table — vocabulary-bounded, i.e. ~10^8 rows for a 10^12-token
corpus — which is the classical trainer's own formulation; the
token-scale work all happens in the one vectorized word-count
reduction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SEP = "\x1f"            # symbol separator inside a word's state string
END = "</w>"            # end-of-word marker (Sennrich)


def word_counts(ds: "ray.data.Dataset", text_col: str = "text"
                ) -> "ray.data.Dataset":
    """corpus → (word, n) frequency table: per-batch counts first, so
    the shuffle carries each batch's DISTINCT words (Heaps-bounded)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        words = pc.split_pattern(t[text_col], " ")
        flat = words.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"word": flat}).group_by(["word"]) \
              .aggregate([("word", "count")])
        return g.rename_columns(["word", "n"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _init_symbols(t: pa.Table) -> pa.Table:
    """word → SEP-joined character symbols + END marker."""
    words = t["word"].to_pylist()
    sym = [SEP.join(list(w) + [END]) for w in words]
    return pa.table({"sym": pa.array(sym, pa.string()),
                     "n": t["n"].cast(pa.int64())})


def _flatten(t: pa.Table) -> tuple[list[list[str]], np.ndarray]:
    syms = [s.split(SEP) for s in t["sym"].to_pylist()]
    n = t["n"].to_numpy().astype(np.int64)
    return syms, n


def _pair_counts_batch(t: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts of a symbol-table batch.

    Greedy-consistent counting: overlapping occurrences of a self-pair
    (x, x) in a run of k x's contribute floor(k/2) (the number of
    merges greedy application would actually perform), not k−1 — so
    the chosen top pair's count equals the real merge yield."""
    syms, n = _flatten(t)
    if not syms:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    acc: dict[tuple[str, str], int] = {}
    for sym, cnt in zip(syms, n):
        i, L = 0, len(sym)
        prev_merged = False
        for j in range(L - 1):
            key = (sym[j], sym[j + 1])
            if sym[j] == sym[j + 1]:
                # count only non-overlapping occurrences within runs
                if prev_merged:
                    prev_merged = False
                    continue
                prev_merged = True
            else:
                prev_merged = False
            acc[key] = acc.get(key, 0) + int(cnt)
    if not acc:           # every word in the batch is fully merged
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    a, b, c = zip(*[(k[0], k[1], v) for k, v in acc.items()])
    return pa.table({"a": pa.array(a, pa.string()),
                     "b": pa.array(b, pa.string()),
                     "n": pa.array(np.array(c, dtype=np.int64))})


def _apply_merge_batch(t: pa.Table, x: str, y: str) -> pa.Table:
    """Greedy left-to-right merge of the pair (x, y) in every word."""
    syms, n = _flatten(t)
    out = []
    for sym in syms:
        res = []
        i, L = 0, len(sym)
        while i < L:
            if i + 1 < L and sym[i] == x and sym[i + 1] == y:
                res.append(x + y)
                i += 2
            else:
                res.append(sym[i])
                i += 1
        out.append(SEP.join(res))
    return pa.table({"sym": pa.array(out, pa.string()),
                     "n": pa.array(n)})


def train_bpe(ds: "ray.data.Dataset", n_merges: int,
              text_col: str = "text") -> pa.Table:
    """Learn ``n_merges`` BPE merge rules from a corpus Dataset.

    Returns the merge table (rank, left, right, merged, pair_count) —
    the tokenizer artifact.  Tie-break: highest count, then
    lexicographic (left, right) — fully deterministic.  Stops early
    when no pair occurs more than once."""
    from ray.data.aggregate import Sum
    table = word_counts(ds, text_col).map_batches(
        _init_symbols, batch_format="pyarrow").materialize()
    rules = []
    for rank in range(n_merges):
        counts = (table.map_batches(_pair_counts_batch,
                                    batch_format="pyarrow")
                  .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")))
        # top-1 with deterministic tie-break — a tiny bounded pull:
        # sort by (count desc, a asc, b asc), take 1 (ray.data.sort
        # takes per-key descending flags, not (key, dir) tuples)
        top = counts.sort(["n", "a", "b"],
                          descending=[True, False, False]).take(1)
        if not top or top[0]["n"] < 2:
            break
        x, y, cnt = top[0]["a"], top[0]["b"], int(top[0]["n"])
        rules.append((rank, x, y, x + y, cnt))
        table = table.map_batches(
            lambda t, x=x, y=y: _apply_merge_batch(t, x, y),
            batch_format="pyarrow").materialize()
    if not rules:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "merged": pa.array([], pa.string()),
                         "pair_count": pa.array([], pa.int64())})
    r, a, b, m, c = zip(*rules)
    return pa.table({"rank": pa.array(np.array(r, dtype=np.int64)),
                     "left": pa.array(a, pa.string()),
                     "right": pa.array(b, pa.string()),
                     "merged": pa.array(m, pa.string()),
                     "pair_count": pa.array(np.array(c, dtype=np.int64))})


def bpe_encode_batch(t: pa.Table, ranks: dict[tuple[str, str], int],
                     text_col: str = "text") -> pa.Table:
    """Tokenize a document batch under a learned merge table.

    Classic rank-priority encoding: repeatedly merge the
    lowest-rank adjacent pair until none applies.  Per-batch
    memoization on DISTINCT words (a batch re-tokenizes each word
    once, not each occurrence) keeps the Python loop on the
    vocabulary, mirroring the trainer's cost model.  Output: doc_id,
    n_tokens, n_words."""
    import pyarrow.compute as pc
    cache: dict[str, int] = {}

    def encode_len(word: str) -> int:
        got = cache.get(word)
        if got is not None:
            return got
        sym = list(word) + [END]
        while len(sym) > 1:
            best, bi = None, -1
            for j in range(len(sym) - 1):
                r = ranks.get((sym[j], sym[j + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, j
            if best is None:
                break
            sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
        cache[word] = len(sym)
        return len(sym)

    words = pc.split_pattern(t[text_col], " ")
    n_tok, n_w = [], []
    for lst in words.to_pylist():
        ws = [w for w in lst if w]
        n_w.append(len(ws))
        n_tok.append(sum(encode_len(w) for w in ws))
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pa.array(np.array(n_tok, dtype=np.int64)),
        "n_words": pa.array(np.array(n_w, dtype=np.int64)),
    })
