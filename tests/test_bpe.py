"""Distributed BPE trainer (stages/bpe.py): scalar-reference parity,
greedy self-pair conventions, determinism, early stop."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from __spider_ray.stages.bpe import (END, _apply_merge_batch,
                                     _pair_counts_batch, train_bpe)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook Sennrich trainer (per-word dict loop), with the same
    conventions as the distributed one: self-pair counts are the
    greedy merge yield floor(run/2); tie-break (count desc, a, b)."""
    table = {tuple(list(w) + [END]): c for w, c in word_freqs.items()}
    rules = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in table.items():
            prev = False
            for j in range(len(sym) - 1):
                if sym[j] == sym[j + 1]:
                    if prev:
                        prev = False
                        continue
                    prev = True
                else:
                    prev = False
                k = (sym[j], sym[j + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (x, y), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < 2:
            break
        rules.append((x, y, x + y, cnt))
        new = {}
        for sym, c in table.items():
            res, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == x and sym[i + 1] == y:
                    res.append(x + y)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            key = tuple(res)
            new[key] = new.get(key, 0) + c
        table = new
    return rules


def _corpus_ds(texts: list[str]) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(3)


def test_bpe_matches_scalar_reference(ray_session):
    texts = ["low lower lowest " * 3, "new newer newest " * 2,
             "wide wider widest", "low new wide " * 4]
    got = train_bpe(_corpus_ds(texts), n_merges=12).to_pandas()
    # reference trains on the same word frequencies
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _ref_bpe(freqs, 12)
    assert len(got) == len(want)
    for i, (x, y, m, c) in enumerate(want):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["merged"],
                row["pair_count"]) == (x, y, m, c), (i, row.tolist(), want[i])


def test_bpe_self_pair_run_convention():
    # 'aaaa' x3: symbols a a a a </w> -> (a,a) yield = floor(4/2)*3 = 6
    t = pa.table({"sym": pa.array(["a\x1fa\x1fa\x1fa\x1f" + END]),
                  "n": pa.array([3], pa.int64())})
    counts = _pair_counts_batch(t).to_pandas().set_index(["a", "b"])["n"]
    assert counts[("a", "a")] == 6
    # greedy leftmost application on an odd run: aaa -> (aa, a)
    t2 = pa.table({"sym": pa.array(["a\x1fa\x1fa\x1f" + END]),
                   "n": pa.array([1], pa.int64())})
    out = _apply_merge_batch(t2, "a", "a")["sym"][0].as_py()
    assert out == "aa\x1fa\x1f" + END


def test_bpe_deterministic_and_early_stop(ray_session):
    texts = ["ab cd ef", "gh ij kl"]      # every pair unique (count 1)
    got = train_bpe(_corpus_ds(texts), n_merges=5).to_pandas()
    assert len(got) == 0                  # early stop: no pair count >= 2
    texts2 = ["tok tok tok ken ken", "tok ken tok"]
    a = train_bpe(_corpus_ds(texts2), n_merges=6).to_pandas()
    b = train_bpe(_corpus_ds(texts2), n_merges=6).to_pandas()
    assert a.equals(b)
    assert a.iloc[0]["pair_count"] >= 5   # 'to'+'k' or 'ke'+'n' family


def test_bpe_encode_rank_priority_and_counts(ray_session):
    """Encoding follows merge-rank priority (not left-to-right pair
    order) and the memoized path returns per-doc token/word counts."""
    import pyarrow as pa

    from __spider_ray.stages.bpe import END, bpe_encode_batch

    # ranks: ('b','c')=0 wins over ('a','b')=1 in 'abc': a + bc + </w>
    ranks = {("b", "c"): 0, ("a", "b"): 1, ("bc", END): 2}
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["abc abc", "ab"])})
    got = bpe_encode_batch(t, ranks).to_pandas()
    # 'abc' -> a, bc, </w> -> rank-2 merges bc+</w> -> a, bc</w> = 2 toks
    assert got.loc[0, "n_tokens"] == 4 and got.loc[0, "n_words"] == 2
    # 'ab' -> ab + </w> (no rank for (ab,</w>)) = 2 tokens
    assert got.loc[1, "n_tokens"] == 2 and got.loc[1, "n_words"] == 1


def test_bpe_train_then_encode_compresses(ray_session):
    """Encoding under the trained table must use fewer tokens than
    character count + 1 per word (the merges actually apply)."""
    texts = ["low lower lowest " * 4, "low slow glow " * 3]
    ds = _corpus_ds(texts)
    merges = train_bpe(ds, n_merges=10)
    ranks = {(a, b): int(r) for r, a, b in zip(
        merges["rank"].to_pylist(), merges["left"].to_pylist(),
        merges["right"].to_pylist())}
    from __spider_ray.stages.bpe import bpe_encode_batch
    import pyarrow as pa
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["low lower glow"])})
    got = bpe_encode_batch(t, ranks).to_pandas()
    n_chars_plus_end = sum(len(w) + 1 for w in "low lower glow".split())
    assert 3 <= got.loc[0, "n_tokens"] < n_chars_plus_end
