"""M13 — HTML span extraction: rendered page → interleaved spans.

The reference's selenium spider (source lost, bytecode strings show
xpath ``//div[@class="flight-desc"]`` — ``spiders/__pycache__/
ylSpider.cpython-37.pyc``) reads flight rows out of rendered HTML.
lxml is not installed here, so extraction uses the stdlib
``html.parser`` — a single streaming pass per page emitting text spans
(element text, document order) and media spans (``<img src>``), which
is exactly where the interleaved text+media span docs come from.
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from ..schemas import SPAN


class _SpanCollector(HTMLParser):
    def __init__(self):
        super().__init__()
        self.spans: list[tuple[str, str | None, str | None]] = []

    def handle_starttag(self, tag, attrs):
        if tag == "img":
            src = dict(attrs).get("src")
            if src:
                self.spans.append(("media", None, src))

    def handle_data(self, data):
        text = data.strip()
        if text:
            self.spans.append(("text", text, None))


def extract_spans(html: bytes | str) -> list[tuple[str, str | None, str | None, int]]:
    """One page → ordered (kind, text, media_ref, offset) spans."""
    p = _SpanCollector()
    p.feed(html.decode() if isinstance(html, (bytes, bytearray)) else html)
    return [(k, t, m, i) for i, (k, t, m) in enumerate(p.spans)]


def html_to_docs_batch(batch: pa.Table,
                       body_col: str = "rendered_body") -> pa.Table:
    """rendered batch → documents batch (same output schema as the JSON
    parse path, so both fetch flavors feed one docs table)."""
    from .. import synth
    urls = batch["url"].to_pylist()
    bodies = batch[body_col].to_pylist()
    doc_ids, span_lists = [], []
    for u, b in zip(urls, bodies):
        spans = extract_spans(b)
        if not spans:
            continue
        doc_ids.append("doc-" + synth.md5(u))
        span_lists.append(spans)
    offsets = np.zeros(len(span_lists) + 1, dtype=np.int32)
    np.cumsum([len(s) for s in span_lists], out=offsets[1:])
    flat = [s for spans in span_lists for s in spans]
    struct = pa.StructArray.from_arrays(
        [pa.array([s[0] for s in flat], pa.string()),
         pa.array([s[1] for s in flat], pa.string()),
         pa.array([s[2] for s in flat], pa.string()),
         pa.array([s[3] for s in flat], pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    return pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "spans": pa.ListArray.from_arrays(pa.array(offsets), struct)})
