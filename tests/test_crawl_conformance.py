"""End-to-end conformance: Ray pipeline vs the single-threaded
reference-semantics simulator (SURVEY.md §5b) — URL-seen set equality,
crawl ordering, and per-row span-sequence equality (kind, text,
media_ref, order) per the driver input_hint invariant."""

from __future__ import annotations

from conftest import SF_SMALL

from __spider_ray.pipelines import crawl
from oracle_sim import simulate


def test_url_seen_set_and_ordering():
    order, seen, _docs = simulate(SF_SMALL)
    fr = crawl.frontier(SF_SMALL)
    rows = fr.select_columns(["url", "seed_index", "day_offset"]).to_pandas()
    assert set(rows["url"]) == seen
    # ordering: sorting the deduped frontier by (seed_index, day_offset)
    # must reproduce the reference issue order exactly (§2.6 O4)
    got = list(rows.sort_values(["seed_index", "day_offset"])["url"])
    assert got == order


def test_span_sequence_equality():
    _order, _seen, docs = simulate(SF_SMALL)
    out = crawl.documents(SF_SMALL).to_pandas()
    assert len(out) == len(docs)
    for doc_id, spans in zip(out["doc_id"], out["spans"]):
        want = docs[doc_id]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        assert got == want, f"span mismatch for {doc_id}"


def test_offsets_strictly_increasing_and_nullity():
    sp = crawl.exploded_spans(SF_SMALL).to_pandas()
    for doc_id, g in sp.groupby("doc_id"):
        offs = list(g.sort_values("offset")["offset"])
        assert offs == list(range(len(offs)))
    text_rows = sp[sp["kind"] == "text"]
    media_rows = sp[sp["kind"] == "media"]
    assert text_rows["media_ref"].isna().all()
    assert text_rows["text"].notna().all()
    assert media_rows["text"].isna().all()
    assert media_rows["media_ref"].str.startswith("captcha://").all()


def test_dedup_bucket_hash_path_and_collision_fallback():
    """_dedup_bucket sorts on the precomputed hash64 (no object lexsort
    in the hot path); a forged 64-bit collision must still resolve
    first-wins exactly on the strings."""
    import numpy as np
    import pyarrow as pa

    # two distinct URLs share a forged hash, interleaved priorities;
    # plus an honest duplicate pair and a singleton.
    t = pa.table({
        "url":      ["a", "b", "a", "c", "c", "d"],
        "priority": [3,    1,   2,   5,   4,   9],
        "_h64": pa.array(np.array([7, 7, 7, 11, 11, 42], dtype=np.uint64)),
        "bucket": pa.array(np.zeros(6, dtype=np.int64)),
    })
    out = crawl._dedup_bucket(t)
    got = {u: p for u, p in zip(out["url"].to_pylist(),
                                out["priority"].to_pylist())}
    # first-wins = min priority per URL string, despite a==b hash tie
    assert got == {"a": 2, "b": 1, "c": 4, "d": 9}
    assert "_h64" not in out.column_names and "bucket" not in out.column_names


def test_dedup_bucket_empty():
    import numpy as np
    import pyarrow as pa
    t = pa.table({
        "url": pa.array([], type=pa.string()),
        "priority": pa.array([], type=pa.int64()),
        "_h64": pa.array(np.array([], dtype=np.uint64)),
        "bucket": pa.array([], type=pa.int64()),
    })
    assert crawl._dedup_bucket(t).num_rows == 0
