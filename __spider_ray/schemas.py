"""Arrow schemas for every logical table in the engine (SURVEY.md §1.2).

The reference keeps schemas implicit (positional lists at
``spiders/ctripSpider.py:291,296-299``; untyped ``scrapy.Field`` at
``YlSpiderItem.py:4-28``; all-char MySQL DDL at
``YlTwistPipeline.py:94-120``).  Here every table is an explicit
``pyarrow.Schema`` so blocks are typed Arrow end to end.
"""

from __future__ import annotations

import pyarrow as pa

# --------------------------------------------------------------------------
# seeds — OD city-pair seed list (reference: city_tw_data.txt JSONL,
# parsed with eval() at spiders/ctripSpider.py:124-129)
SEEDS = pa.schema(
    [
        ("seed_id", pa.int64()),
        ("from_city_name", pa.string()),
        ("from_city_code", pa.string()),
        ("to_city_name", pa.string()),
        ("to_city_code", pa.string()),
    ]
)

# --------------------------------------------------------------------------
# frontier — one row per crawlable URL.  Replaces scrapy.Request + meta
# (spiders/ctripSpider.py:161-181).  `host` is the partition key.
FRONTIER_META = pa.struct(
    [
        ("from_city", pa.string()),        # canonical city names (meta carries
        ("to_city", pa.string()),          # them too, ctripSpider.py:161-181)
        ("from_city_code", pa.string()),
        ("to_city_code", pa.string()),
        ("flight_time", pa.string()),      # "YYYY-MM-DD" departure date
        ("is_low_price", pa.int32()),
        ("user_agent", pa.string()),
        ("create_time", pa.timestamp("us")),
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        # packed shuffle key: top bits host-hash, low bits priority
        # (stages/expand.pack_sort_key) — THE epoch sort key
        ("sort_key", pa.int64()),
        ("seed_index", pa.int64()),
        ("day_offset", pa.int32()),
        ("meta", FRONTIER_META),
    ]
)

# --------------------------------------------------------------------------
# fetch result — replaces scrapy.http.Response.  The sentinel url "**"
# the reference injects on error (YlSpiderMiddleware.py:186-194) becomes
# an explicit `error` column.
FETCH_RESULT = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("seed_index", pa.int64()),
        ("day_offset", pa.int32()),
        ("status", pa.int32()),
        ("error", pa.string()),            # null | timeout | dns | conn | challenge
        ("fetch_ts", pa.timestamp("us")),
        ("elapsed_ms", pa.int32()),
        ("body", pa.binary()),
    ]
)

# --------------------------------------------------------------------------
# documents — the authoritative output table (driver input_hint):
# interleaved text+media span docs.  Text spans carry parsed flight
# fields in reference parse order (spiders/ctripSpider.py:296-299);
# media spans carry captcha/image artifacts
# (CtripSpiderMiddleware.py:87-137) as references, not payloads.
SPAN = pa.struct(
    [
        ("kind", pa.string()),             # 'text' | 'media'
        ("text", pa.string()),             # null for media spans
        ("media_ref", pa.string()),        # null for text spans
        ("offset", pa.int32()),            # strictly increasing per doc
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
    ]
)

# --------------------------------------------------------------------------
# flight_records — relational projection of a parsed flight, the
# 22/25-column record (spiders/ctripSpider.py:291,296-299 plus the
# lep_price/is_meal/baggage extension at ylSpider06.py:398,564).
FLIGHT_RECORDS = pa.schema(
    [
        ("company", pa.string()),
        ("company_no", pa.string()),
        ("plane_no", pa.string()),
        ("start_time", pa.string()),       # "HH:MM" (ctripSpider.py:269-272)
        ("end_time", pa.string()),
        ("from_city", pa.string()),
        ("from_city_code", pa.string()),
        ("to_city", pa.string()),
        ("to_city_code", pa.string()),
        ("create_time", pa.timestamp("us")),
        ("discount", pa.string()),         # "X.X折"+cabin (ctripSpider.py:278-286)
        ("off_date", pa.string()),         # "YYYY-MM-DD"
        ("platform", pa.string()),         # 'ctrip' | 'yl'
        ("price", pa.string()),            # stringified int (ctripSpider.py:277)
        ("flight_type", pa.string()),      # '' | 直飞 | 经停 | 联程
        ("plane_type", pa.string()),
        ("flight_transfer", pa.string()),
        ("from_city_airport", pa.string()),
        ("to_city_airport", pa.string()),
        ("task_time", pa.string()),
        ("server_ip", pa.string()),
        ("flight_number", pa.int32()),     # per-(OD,date) flight count
        ("lep_price", pa.int32()),         # nullable (ylSpider06.py:544-552)
        ("is_meal", pa.string()),
        ("baggage", pa.int32()),
    ]
)

# --------------------------------------------------------------------------
# airports — broadcast dim table (ylutils/rm_airport.xlsx via
# excel_read.py:7-23; the reference re-reads the xlsx per lookup — we
# broadcast it once).
AIRPORTS = pa.schema(
    [
        ("ap_code", pa.string()),
        ("airport", pa.string()),
        ("city", pa.string()),
    ]
)

# --------------------------------------------------------------------------
# host_policy — politeness budget per host (settings.py:32-38).
HOST_POLICY = pa.schema(
    [
        ("host", pa.string()),
        ("delay_s", pa.float64()),
        ("max_concurrent", pa.int32()),
        ("timeout_s", pa.float64()),
        ("robots_allow_all", pa.bool_()),
    ]
)

# --------------------------------------------------------------------------
# checkpoint — per-partition lineage + metrics (no reference equivalent:
# the reference has no checkpointing, SURVEY.md §4).
CHECKPOINT = pa.schema(
    [
        ("epoch", pa.int32()),
        ("partition_id", pa.int64()),
        ("urls_done", pa.int64()),
        ("docs_emitted", pa.int64()),
        ("spans_emitted", pa.int64()),
        ("errors", pa.int64()),
        ("seen_snapshot_path", pa.string()),
        ("committed_ts", pa.timestamp("us")),
    ]
)
