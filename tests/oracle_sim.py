"""Single-threaded reference-semantics crawl simulator (SURVEY.md §5b).

Implements the reference crawl loop exactly as the Scrapy spider would
issue it — seed-file order × day order (``spiders/ctripSpider.py:136-229``,
§2.6 O4) with first-wins URL dedup — in plain Python, no Ray.  The Ray
pipeline's output must equal this oracle's ordering, URL-seen set, and
per-doc span sequences.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from __spider_ray import synth
from __spider_ray.stages.spans import TEXT_FIELDS


def simulate(sf_dir: str, n_days: int = synth.N_DAYS):
    """Returns (crawl_order_urls, seen_set, docs) where docs maps
    doc_id → list of (kind, text, media_ref, offset)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    nmap = {r["n_nationkey"]: r["n_name"] for r in nation}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pylist()
    cust.sort(key=lambda r: r["c_custkey"])

    order: list[str] = []
    seen: set[str] = set()
    docs: dict[str, list[tuple]] = {}
    for row in cust:
        ck = row["c_custkey"]
        # from side
        m = ck % 50
        if m == 0:
            f_name, f_code = "北京", "PKX"
        elif m == 1:
            f_name, f_code = "武隆", "CQW"
        else:
            n = nmap[row["c_nationkey"]]
            f_name, f_code = n, n[:3].upper() + str(row["c_nationkey"])
        m = ck % 41
        if m == 0:
            t_name, t_code = "北京", "PEK"
        elif m == 1:
            t_name, t_code = "武隆", "CQW"
        else:
            k = (ck * 7) % 25
            n = nmap[k]
            t_name, t_code = n, n[:3].upper() + str(k)
        # canonicalize (ctripSpider.py:141-146)
        f_code = "BJS" if f_name == "北京" else f_code
        t_code = "BJS" if t_name == "北京" else t_code
        f_name = "重庆" if f_name == "武隆" else f_name
        t_name = "重庆" if t_name == "武隆" else t_name
        v = 0 if ck % 5 == 0 else ck
        for d in range(n_days):
            day = synth.day_str(d)
            url = (f"https://{t_code.lower()}.flights.test/flightlist/"
                   f"{f_code}-{t_code}/{day}?v={v}")
            if url in seen:
                continue
            seen.add(url)
            order.append(url)
            status, error, n_fl = synth.page_status(url)
            if error or status != 200:
                continue
            # shared-flight filter (ylSpider06.py:331-334): icsf rows
            # yield nothing; a page of only shared flights yields no doc
            kept = [fl for fl in (synth.flight_fields(url, i)
                                  for i in range(n_fl)) if not fl["icsf"]]
            if not kept:
                continue
            doc_id = "doc-" + synth.md5(url)
            spans = []
            for fl in kept:
                for f in TEXT_FIELDS:
                    spans.append(("text", fl[f], None, len(spans)))
                if fl["has_media"]:
                    spans.append(("media", None, fl["media_ref"], len(spans)))
            docs[doc_id] = spans
    return order, seen, docs
