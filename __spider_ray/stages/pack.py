"""Sequence packing — greedy next-fit document packing into fixed
token-budget training sequences.

The op every LLM data pipeline runs last: concatenate documents into
budget-B sequences without splitting a doc (a doc longer than B gets a
sequence of its own).  Packing is inherently sequential, so the
distributed shape partitions by the writer shard key (``source`` here),
orders by doc_id inside the shard, and packs each shard independently —
the same assumption a sharded sequence-writer makes at 100 TB, and the
one documented invariant of this stage.

The per-shard pack is NOT a per-doc Python loop: with the doc-length
prefix sum S, a sequence starting after prefix ``base`` ends at the
last doc with ``S - base <= B`` — one ``np.searchsorted`` per EMITTED
SEQUENCE finds the break, so the Python iteration count is the number
of output sequences (~n_docs/docs-per-seq), each step O(log n).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PACK_BUDGET = 160          # tokens per packed training sequence


def pack_group(g: pa.Table, budget: int = PACK_BUDGET) -> pa.Table:
    """One shard (all docs of one ``source``) → per-doc packing
    assignment: (source, doc_id, tok_n, seq_id, seq_pos, tok_offset).

    seq_id numbers sequences within the shard in doc_id order; seq_pos
    is the doc's ordinal inside its sequence; tok_offset its first
    token's position in the concatenated sequence."""
    if "bucket" in g.column_names:
        g = g.drop_columns(["bucket"])
    idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
    g = g.take(idx)
    tok = g["tok_n"].to_numpy().astype(np.int64)
    n = len(tok)
    cum = np.cumsum(tok)

    seq_id = np.empty(n, dtype=np.int64)
    tok_offset = np.empty(n, dtype=np.int64)
    start = 0
    sid = 0
    while start < n:
        base = cum[start - 1] if start else 0
        # last doc with cum - base <= budget; always take >= 1 doc
        end = int(np.searchsorted(cum, base + budget, side="right"))
        end = max(end, start + 1)
        seq_id[start:end] = sid
        tok_offset[start:end] = cum[start:end] - tok[start:end] - base
        sid += 1
        start = end

    seq_starts = np.nonzero(np.concatenate(
        [[True], seq_id[1:] != seq_id[:-1]]))[0]
    seq_pos = np.arange(n, dtype=np.int64) - np.repeat(
        seq_starts, np.diff(np.append(seq_starts, n)))
    return pa.table({
        "source": g["source"],
        "doc_id": g["doc_id"].cast(pa.int64()),
        "tok_n": pa.array(tok),
        "seq_id": pa.array(seq_id),
        "seq_pos": pa.array(seq_pos),
        "tok_offset": pa.array(tok_offset),
    })


def pack_naive(tok_lens: list[int], budget: int = PACK_BUDGET) -> list[int]:
    """Reference next-fit (plain per-doc loop) — test oracle only."""
    out, sid, used = [], 0, 0
    for t in tok_lens:
        if out and used + t > budget:
            sid += 1
            used = 0
        out.append(sid)
        used += t
    return out
