"""DuckDB oracle SQL mirroring the synthetic crawl derivation 1:1.

The crawl pipeline's input and content are pure functions of the driver
tables + md5 (see ``synth.py``), so every stage is reproducible in ANSI
SQL over the pre-registered parquet views.  This module generates the
CTE chain; ``__ray_entry__.oracle_sql`` composes final SELECTs from it.

Verified equivalences (DuckDB 1.0):
- ``('0x' || substr(md5(x), a, n))::BIGINT`` == Python ``int(md5[a-1:a-1+n], 16)``
- ``printf('%.1f折', t/10.0)``             == Python ``f"{t/10:.1f}折"``
- ``strftime(DATE '2026-01-01' + d, '%Y-%m-%d')`` == ``(BASE_DATE+timedelta(d)).isoformat()``
"""

from __future__ import annotations

from .. import synth


def _hx(h_expr: str, start0: int, length: int) -> str:
    """SQL for int(h[start0:start0+length], 16) — start0 is 0-based."""
    return f"(('0x' || substr({h_expr}, {start0 + 1}, {length}))::BIGINT)"


def _case_list(expr: str, values: list[str]) -> str:
    """CASE expr WHEN i THEN values[i] ... END (expr ∈ [0,len))."""
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE {expr} {whens} END"


_COMPANY_NAMES = [c for c, _ in synth.COMPANIES]
_COMPANY_CODES = [k for _, k in synth.COMPANIES]

# ---------------------------------------------------------------- CTE chain
SEEDS_CTE = """
nat AS (
  SELECT n_nationkey, n_name,
         upper(substr(n_name, 1, 3)) || CAST(n_nationkey AS VARCHAR) AS code
  FROM nation
),
seeds_raw AS (
  SELECT c.c_custkey AS seed_id,
    CASE c.c_custkey % 50 WHEN 0 THEN '北京' WHEN 1 THEN '武隆' ELSE n1.n_name END AS from_city_name,
    CASE c.c_custkey % 50 WHEN 0 THEN 'PKX' WHEN 1 THEN 'CQW' ELSE n1.code END AS from_city_code,
    CASE c.c_custkey % 41 WHEN 0 THEN '北京' WHEN 1 THEN '武隆' ELSE n2.n_name END AS to_city_name,
    CASE c.c_custkey % 41 WHEN 0 THEN 'PEK' WHEN 1 THEN 'CQW' ELSE n2.code END AS to_city_code
  FROM customer c
  JOIN nat n1 ON c.c_nationkey = n1.n_nationkey
  JOIN nat n2 ON n2.n_nationkey = (c.c_custkey * 7) % 25
),
seeds AS (
  SELECT seed_id,
    CASE WHEN from_city_name = '武隆' THEN '重庆' ELSE from_city_name END AS from_city_name,
    CASE WHEN from_city_name = '北京' THEN 'BJS' ELSE from_city_code END AS from_city_code,
    CASE WHEN to_city_name = '武隆' THEN '重庆' ELSE to_city_name END AS to_city_name,
    CASE WHEN to_city_name = '北京' THEN 'BJS' ELSE to_city_code END AS to_city_code
  FROM seeds_raw
)"""

def _frontier_sql(path: str, day_from: int = 0,
                  day_to: int | None = None) -> str:
    """Frontier CTE parameterized by the URL path segment
    (``flightlist`` = v1 API, ``listcards`` = v2 / ctripSpider02) and
    the day-offset window (default ``range(N_DAYS)``; an explicit
    INCLUSIVE [day_from, day_to] mirrors ``expand.day_window`` /
    ``ctripSpider.py:148-153``)."""
    hi = (day_to + 1) if day_to is not None else synth.N_DAYS
    return f"""
frontier_all AS (
  SELECT s.seed_id AS seed_index,
    CAST(d.day_offset AS BIGINT) AS day_offset,
    strftime(DATE '{synth.BASE_DATE_STR}' + CAST(d.day_offset AS INTEGER), '%Y-%m-%d') AS flight_time,
    lower(s.to_city_code) || '.flights.test' AS host,
    'https://' || lower(s.to_city_code) || '.flights.test/{path}/'
      || s.from_city_code || '-' || s.to_city_code || '/'
      || strftime(DATE '{synth.BASE_DATE_STR}' + CAST(d.day_offset AS INTEGER), '%Y-%m-%d')
      || '?v=' || CAST(CASE WHEN s.seed_id % 5 = 0 THEN 0 ELSE s.seed_id END AS VARCHAR) AS url,
    s.from_city_name, s.from_city_code, s.to_city_name, s.to_city_code
  FROM seeds s CROSS JOIN (SELECT range AS day_offset FROM range({day_from}, {hi})) d
),
frontier AS (
  SELECT * FROM frontier_all
  QUALIFY row_number() OVER (PARTITION BY url ORDER BY seed_index, day_offset) = 1
)"""


FRONTIER_CTE = _frontier_sql("flightlist")
FRONTIER_V2_CTE = _frontier_sql("listcards")
RANGE_FROM, RANGE_TO = 3, 9          # the oracled absolute-window example
FRONTIER_RANGE_CTE = _frontier_sql("flightlist", RANGE_FROM, RANGE_TO)

_H = "md5(url)"
FETCH_CTE = f"""
fetched AS (
  SELECT *,
    CASE {_hx(_H, 0, 1)} WHEN 0 THEN 0 WHEN 1 THEN 403 WHEN 2 THEN 500 ELSE 200 END AS status,
    CASE WHEN {_hx(_H, 0, 1)} = 0 THEN 'timeout' ELSE NULL END AS error,
    CASE WHEN {_hx(_H, 0, 1)} >= 3 THEN 1 + {_hx(_H, 1, 1)} % 5 ELSE 0 END AS n_flights
  FROM frontier
)"""

_H2 = "md5(url || '#' || CAST(f.flight_idx AS VARCHAR))"
# the icsf shared-flight filter applies to the JSON parse path
# (ylSpider06.py:331-334); the rendered-HTML path extracts the RAW page
FLIGHTS_RAW_CTE = f"""
flights AS (
  SELECT fetched.*, CAST(f.flight_idx AS BIGINT) AS flight_idx,
    'doc-' || md5(url) AS doc_id,
    {_H2} AS h2
  FROM fetched
  CROSS JOIN (SELECT range AS flight_idx FROM range(5)) f
  WHERE fetched.status = 200 AND f.flight_idx < fetched.n_flights
),"""
FLIGHTS_CTE = f"""
flights AS (
  SELECT fetched.*, CAST(f.flight_idx AS BIGINT) AS flight_idx,
    'doc-' || md5(url) AS doc_id,
    {_H2} AS h2
  FROM fetched
  CROSS JOIN (SELECT range AS flight_idx FROM range(5)) f
  WHERE fetched.status = 200 AND f.flight_idx < fetched.n_flights
    AND {_hx(_H2, 21, 1)} != 0
),
records AS (
  SELECT url, host, doc_id, seed_index, day_offset, flight_idx,
    CASE WHEN {_hx('h2', 20, 1)} = 0 THEN 'captcha://' || substr(h2, 1, 16) ELSE NULL END AS media_ref,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_NAMES)} AS company,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_CODES)} AS company_no,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_CODES)}
      || CAST(1000 + {_hx('h2', 1, 4)} % 9000 AS VARCHAR) AS plane_no,
    printf('%02d:%02d', {_hx('h2', 5, 2)} % 24, ({_hx('h2', 7, 2)} % 12) * 5) AS start_time,
    printf('%02d:%02d',
      ((({_hx('h2', 5, 2)} % 24) * 60 + ({_hx('h2', 7, 2)} % 12) * 5
        + 60 + {_hx('h2', 9, 2)} % 180) % 1440) // 60,
      ((({_hx('h2', 5, 2)} % 24) * 60 + ({_hx('h2', 7, 2)} % 12) * 5
        + 60 + {_hx('h2', 9, 2)} % 180) % 1440) % 60) AS end_time,
    from_city_name AS from_city, from_city_code,
    to_city_name AS to_city, to_city_code,
    TIMESTAMP '{synth.CREATE_TIME_STR}' AS create_time,
    printf('%.1f折', (20 + {_hx('h2', 15, 2)} % 80) / 10.0) AS discount,
    flight_time AS off_date,
    '{synth.PLATFORM}' AS platform,
    CAST(200 + {_hx('h2', 11, 4)} % 1800 AS VARCHAR) AS price,
    CASE WHEN {_hx('h2', 17, 1)} < 3 THEN '经停'
         WHEN {_hx('h2', 17, 1)} < 5 THEN '联程' ELSE '直飞' END AS flight_type,
    '73' || CAST({_hx('h2', 19, 1)} % 10 AS VARCHAR) AS plane_type,
    CASE WHEN {_hx('h2', 17, 1)} < 5
         THEN {_case_list(_hx('h2', 18, 1), synth.TRANSFER_CITIES)} ELSE '' END AS flight_transfer,
    '' AS from_city_airport, '' AS to_city_airport,
    '{synth.TASK_TIME}' AS task_time, '{synth.SERVER_IP}' AS server_ip,
    CAST(COUNT(*) OVER (PARTITION BY url) AS BIGINT) AS flight_number,
    CAST(NULL AS BIGINT) AS lep_price,
    CAST(NULL AS VARCHAR) AS is_meal,
    CAST(NULL AS BIGINT) AS baggage
  FROM flights
)"""

SPANS_CTE = """
spans AS (
  SELECT doc_id,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY flight_idx, s.slot) - 1 AS BIGINT) AS "offset",
    CASE WHEN s.slot = 6 THEN 'media' ELSE 'text' END AS kind,
    CASE s.slot WHEN 0 THEN plane_no WHEN 1 THEN company WHEN 2 THEN start_time
                WHEN 3 THEN end_time WHEN 4 THEN price WHEN 5 THEN discount
                ELSE NULL END AS text,
    CASE WHEN s.slot = 6 THEN media_ref ELSE NULL END AS media_ref
  FROM records
  CROSS JOIN (SELECT range AS slot FROM range(7)) s
  WHERE s.slot < 6 OR (s.slot = 6 AND records.media_ref IS NOT NULL)
)"""


# ----------------------------------------------------- rendered-HTML spans
_END_TOT = (f"((({_hx('h2', 5, 2)} % 24) * 60 + ({_hx('h2', 7, 2)} % 12) * 5"
            f" + 60 + {_hx('h2', 9, 2)} % 180) % 1440)")
RENDER_SPANS_CTE = f"""
rfields AS (
  SELECT doc_id, flight_idx,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_NAMES)} AS company,
    printf('%02d:%02d', {_hx('h2', 5, 2)} % 24, ({_hx('h2', 7, 2)} % 12) * 5)
      || '-' || printf('%02d:%02d', {_END_TOT} // 60, {_END_TOT} % 60) AS timespan,
    CAST(200 + {_hx('h2', 11, 4)} % 1800 AS VARCHAR) AS price,
    CASE WHEN {_hx('h2', 20, 1)} = 0 THEN 'captcha://' || substr(h2, 1, 16)
         ELSE NULL END AS media_ref
  FROM flights
),
rspans AS (
  SELECT doc_id,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY flight_idx, s.slot) - 1
         AS BIGINT) AS "offset",
    CASE WHEN s.slot = 3 THEN 'media' ELSE 'text' END AS kind,
    CASE s.slot WHEN 0 THEN company WHEN 1 THEN timespan
                WHEN 2 THEN price ELSE NULL END AS text,
    CASE WHEN s.slot = 3 THEN rfields.media_ref ELSE NULL END AS media_ref
  FROM rfields CROSS JOIN (SELECT range AS slot FROM range(4)) s
  WHERE s.slot < 3 OR (s.slot = 3 AND rfields.media_ref IS NOT NULL)
)"""


# ------------------------------------------------------- Ctrip v2 (listCards)
FETCH_V2_CTE = f"""
fetched AS (
  SELECT *,
    CASE {_hx(_H, 0, 1)} WHEN 0 THEN 0 WHEN 1 THEN 403 WHEN 2 THEN 500 ELSE 200 END AS status,
    CASE WHEN {_hx(_H, 0, 1)} = 0 THEN 'timeout' ELSE NULL END AS error,
    CASE WHEN {_hx(_H, 0, 1)} >= 3 THEN {_hx(_H, 1, 1)} % 6 ELSE 0 END AS n_flights
  FROM frontier
)"""

_DEP_MIN = f"(({_hx('h2', 5, 2)} % 24) * 60 + ({_hx('h2', 7, 2)} % 12) * 5)"
_DUR_V2 = f"(90 + {_hx('h2', 9, 2)} % 600)"
_END_RAW = f"({_DEP_MIN} + {_DUR_V2})"
FLIGHTS_V2_CTE = f"""
flights AS (
  SELECT fetched.*, CAST(f.flight_idx AS BIGINT) AS flight_idx,
    'doc-' || md5(url) AS doc_id,
    {_H2} AS h2
  FROM fetched
  CROSS JOIN (SELECT range AS flight_idx FROM range(6)) f
  WHERE fetched.status = 200 AND f.flight_idx < fetched.n_flights
),
records_v2 AS (
  SELECT url, host, doc_id, seed_index, day_offset, flight_idx,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_NAMES)} AS company,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_CODES)} AS company_no,
    {_case_list(f"{_hx('h2', 0, 1)} % 6", _COMPANY_CODES)}
      || CAST(1000 + {_hx('h2', 1, 4)} % 9000 AS VARCHAR) AS plane_no,
    printf('%02d:%02d', {_hx('h2', 5, 2)} % 24, ({_hx('h2', 7, 2)} % 12) * 5) AS start_time,
    printf('%02d:%02d', ({_END_RAW} % 1440) // 60, {_END_RAW} % 60) AS end_time,
    CAST({_END_RAW} // 1440 AS BIGINT) AS cross_days,
    CAST({_DUR_V2} AS BIGINT) AS total_duration,
    CAST(1 + {_hx('h2', 20, 1)} % 9 AS BIGINT) AS ticket_counts,
    CASE WHEN {_hx('h2', 17, 1)} < 4
         THEN CAST(30 + {_hx('h2', 19, 1)} * 10 AS VARCHAR) ELSE '' END AS stop_times,
    from_city_code || '城' AS from_city, from_city_code,
    from_city_code || '机场' AS from_city_airport,
    to_city_code || '城' AS to_city, to_city_code,
    to_city_code || '机场' AS to_city_airport,
    TIMESTAMP '{synth.CREATE_TIME_STR}' AS create_time,
    printf('%.1f', (20 + {_hx('h2', 15, 2)} % 80) / 10.0) AS discount,
    flight_time AS off_date,
    '{synth.PLATFORM}' AS platform,
    CAST(300 + {_hx('h2', 11, 4)} % 2000 AS VARCHAR) AS price,
    CASE WHEN {_hx('h2', 17, 1)} < 4 THEN '经停' ELSE '' END AS flight_type,
    CASE WHEN {_hx('h2', 17, 1)} < 4
         THEN {_case_list(_hx('h2', 18, 1), synth.TRANSFER_CITIES)} ELSE '' END AS flight_transfer,
    '32' || CAST({_hx('h2', 22, 1)} % 10 AS VARCHAR) AS plane_type,
    CAST(flight_idx + 1 AS BIGINT) AS flight_number
  FROM flights
)"""


# ------------------------------------------------------- depth-1 details
_HC = "md5(detail_url || '@' || CAST(c.cabin_idx AS VARCHAR))"
_PRICE = f"150 + {_hx('hc', 6, 4)} % 1500"
DETAIL_CTE = f"""
details AS (
  SELECT DISTINCT host, plane_no, off_date,
    'https://' || host || '/detail/' || plane_no || '/' || off_date AS detail_url
  FROM records
),
cabins_raw AS (
  SELECT d.*, CAST(c.cabin_idx AS BIGINT) AS cabin_idx, {_HC} AS hc
  FROM details d CROSS JOIN (SELECT range AS cabin_idx FROM range(6)) c
  WHERE c.cabin_idx < 2 + {_hx("md5(detail_url)", 0, 1)} % 4
),
cabins AS (
  SELECT detail_url, host, plane_no, off_date, cabin_idx,
    CASE WHEN {_hx('hc', 0, 1)} < 6 THEN '00000' ELSE '1' || substr(hc, 2, 4) END AS "ruleId",
    CASE {_hx('hc', 5, 1)} % 4 WHEN 0 THEN '' WHEN 1 THEN '限时特惠'
         WHEN 2 THEN '婴儿不可预订' WHEN 3 THEN '会员专享' END AS "limitLabel",
    {_PRICE} AS "clientTicketPrice",
    CASE WHEN {_hx('hc', 10, 1)} < 4 THEN ''
         ELSE CAST({_PRICE} - {_hx('hc', 11, 2)} % 100 AS VARCHAR) END AS lep,
    CAST({_PRICE} - {_hx('hc', 13, 2)} % 50 AS VARCHAR) AS lrp,
    CASE WHEN {_hx('hc', 15, 1)} < 8 THEN '有' ELSE '无' END AS ml,
    {_hx('hc', 16, 2)} % 30 AS baggage
  FROM cabins_raw
)"""

FARES_CTE = """
fares AS (
  SELECT host, plane_no, off_date,
    CASE WHEN lep = '' THEN CAST(lrp AS BIGINT)
         ELSE CAST(lep AS BIGINT) END AS lep_price,
    ml AS is_meal, baggage,
    "clientTicketPrice" AS min_cabin_price
  FROM cabins
  WHERE "ruleId" = '00000' OR "limitLabel" IN ('婴儿不可预订', '限时特惠')
  QUALIFY row_number() OVER (PARTITION BY detail_url
                             ORDER BY "clientTicketPrice", cabin_idx) = 1
)"""


def with_chain(*ctes: str) -> str:
    return "WITH " + ",".join(c.strip().removeprefix("WITH") for c in ctes)


CRAWL_BASE = with_chain(SEEDS_CTE, FRONTIER_CTE, FETCH_CTE)
CRAWL_FULL = with_chain(SEEDS_CTE, FRONTIER_CTE, FETCH_CTE, FLIGHTS_CTE)
CRAWL_SPANS = with_chain(SEEDS_CTE, FRONTIER_CTE, FETCH_CTE, FLIGHTS_CTE, SPANS_CTE)
CRAWL_DETAIL = with_chain(SEEDS_CTE, FRONTIER_CTE, FETCH_CTE, FLIGHTS_CTE, DETAIL_CTE)
CRAWL_FARES = with_chain(SEEDS_CTE, FRONTIER_CTE, FETCH_CTE, FLIGHTS_CTE,
                         DETAIL_CTE, FARES_CTE)
CRAWL_V2 = with_chain(SEEDS_CTE, FRONTIER_V2_CTE, FETCH_V2_CTE, FLIGHTS_V2_CTE)
CRAWL_RENDER = with_chain(SEEDS_CTE, FRONTIER_CTE, FETCH_CTE,
                          FLIGHTS_RAW_CTE + RENDER_SPANS_CTE)
