"""Span-document assembly — flight records → interleaved text+media docs.

Output is the authoritative ``documents`` table of the driver
``input_hint``: ``(doc_id:string, spans:list<struct<kind,text,media_ref,
offset>>)``.  One doc per fetched page; per flight (in parse order) six
text spans carrying the parsed fields in reference column order
(``spiders/ctripSpider.py:296-299``), then one media span when the
flight carries a captcha artifact (``CtripSpiderMiddleware.py:87-137``).
``offset`` is the span's ordinal within the doc — strictly increasing.

Fully vectorized: span arrays are built with np.repeat / argsort over
(row, slot) keys — no Python loop over rows.  Relies on parse emitting
one page's rows contiguously within a batch (parse is batch-aligned
with fetch blocks and never shuffled before this stage); the pipeline
documents that partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schemas import SPAN

# reference column order for the text spans of one flight
TEXT_FIELDS = ("plane_no", "company", "start_time", "end_time", "price", "discount")
N_TEXT = len(TEXT_FIELDS)


def records_to_docs(batch: pa.Table) -> pa.Table:
    """flight-record batch (parse output order) → documents batch."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "spans": pa.array([], pa.list_(SPAN))})
    media = batch["media_ref"].to_numpy(zero_copy_only=False)
    has_media = np.array([m is not None for m in media])

    # flat span stream keyed by (row, slot): text slots 0..5, media slot 6
    text_vals = np.empty((n, N_TEXT), dtype=object)
    for k, f in enumerate(TEXT_FIELDS):
        text_vals[:, k] = batch[f].to_numpy(zero_copy_only=False)
    t_rows = np.repeat(np.arange(n), N_TEXT)
    t_slots = np.tile(np.arange(N_TEXT), n)
    m_rows = np.nonzero(has_media)[0]

    rows = np.concatenate([t_rows, m_rows])
    slots = np.concatenate([t_slots, np.full(len(m_rows), N_TEXT)])
    order = np.argsort(rows * (N_TEXT + 1) + slots, kind="stable")
    rows_o, slots_o = rows[order], slots[order]

    vals = np.concatenate([text_vals.reshape(-1), media[m_rows]])[order]
    is_text = slots_o < N_TEXT
    kind = np.where(is_text, "text", "media").astype(object)
    text = np.where(is_text, vals, None)
    media_ref = np.where(is_text, None, vals)

    # doc boundaries: doc_id changes (page rows are contiguous in parse order)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    new_doc = np.empty(n, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = doc_ids[1:] != doc_ids[:-1]
    doc_idx_per_row = np.cumsum(new_doc) - 1            # row → doc ordinal
    doc_of_span = doc_idx_per_row[rows_o]
    n_docs = int(doc_idx_per_row[-1]) + 1

    # per-doc span counts → list offsets; offset field = ordinal in doc
    span_counts = np.bincount(doc_of_span, minlength=n_docs)
    list_offsets = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(span_counts, out=list_offsets[1:])
    span_pos = np.arange(len(rows_o), dtype=np.int32) - list_offsets[:-1][doc_of_span]

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(media_ref, type=pa.string()),
            pa.array(span_pos, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(list_offsets), struct)
    doc_id = pa.array(doc_ids[new_doc], type=pa.string())
    return pa.table({"doc_id": doc_id, "spans": spans})


def doc_from_group(group: pa.Table) -> pa.Table:
    """Group-by-doc_id flavor of ``records_to_docs`` — used when the
    records dataset has been re-partitioned (e.g. re-read from parquet)
    and page-row contiguity can no longer be assumed.  The group is one
    doc's records in arbitrary order; restore parse order by flight_idx
    then assemble."""
    idx = pa.compute.sort_indices(group, sort_keys=[("flight_idx", "ascending")])
    return records_to_docs(group.take(idx))


def docs_from_bucket(group: pa.Table) -> pa.Table:
    """Hash-bucket flavor: the group holds MANY docs (all records whose
    doc_id hashes to this bucket).  One sort by (doc_id, flight_idx)
    restores contiguity, then the vectorized assembler handles the
    whole bucket in one pass — no per-doc Python."""
    if "bucket" in group.column_names:
        group = group.drop_columns(["bucket"])
    idx = pa.compute.sort_indices(
        group, sort_keys=[("doc_id", "ascending"), ("flight_idx", "ascending")])
    return records_to_docs(group.take(idx))


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents batch → one row per span (flat, SQL-hashable):
    (doc_id, offset, kind, text, media_ref)."""
    spans = batch["spans"].combine_chunks()
    flat = spans.flatten()
    counts = np.asarray(spans.value_lengths())
    doc_id = pa.array(
        np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), counts),
        type=pa.string(),
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )


def captions_batch(batch: pa.Table) -> pa.Table:
    """documents batch → one row per MEDIA span, captioned with the
    nearest preceding non-null text span in the same document:
    (doc_id, media_offset, media_ref, caption).

    The caption relation is the core interleaved-payload operation a
    multimodal training pipeline runs over this table (image→alt-text
    pairing); it is evaluated entirely WITHIN each document row — the
    spans list already co-locates a doc's stream — so the stage is a
    pure map_batches with no shuffle at any scale.

    Vectorized: one forward ``np.maximum.accumulate`` over the batch's
    flattened span stream carries the index of the last valid text
    span; a media span whose carried index falls before its own doc's
    start has no caption (null), which also makes the fill reset at
    every document boundary without a per-doc loop.
    """
    spans = batch["spans"].combine_chunks()
    flat = spans.flatten()
    counts = np.asarray(spans.value_lengths(), dtype=np.int64)
    n = len(flat)
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "media_offset": pa.array([], pa.int64()),
                         "media_ref": pa.array([], pa.string()),
                         "caption": pa.array([], pa.string())})

    kind = flat.field("kind")
    text = flat.field("text")
    is_media = pa.compute.equal(kind, "media").to_numpy(zero_copy_only=False)
    is_text = pa.compute.and_(
        pa.compute.equal(kind, "text"),
        pa.compute.is_valid(text)).to_numpy(zero_copy_only=False)

    idx = np.arange(n, dtype=np.int64)
    last_text = np.where(is_text, idx, np.int64(-1))
    np.maximum.accumulate(last_text, out=last_text)

    doc_start = np.repeat(np.cumsum(counts) - counts, counts)
    media_pos = np.nonzero(is_media)[0]
    cap_idx = last_text[media_pos]
    has_cap = cap_idx >= doc_start[media_pos]

    caption = text.take(pa.array(np.where(has_cap, cap_idx, 0)))
    caption = pa.compute.if_else(pa.array(has_cap), caption,
                                 pa.scalar(None, pa.string()))
    doc_of = np.repeat(np.arange(len(counts)), counts)[media_pos]
    doc_id = pa.array(
        batch["doc_id"].to_numpy(zero_copy_only=False)[doc_of],
        type=pa.string())
    return pa.table({
        "doc_id": doc_id,
        "media_offset": flat.field("offset").take(
            pa.array(media_pos)).cast(pa.int64()),
        "media_ref": flat.field("media_ref").take(pa.array(media_pos)),
        "caption": caption,
    })
