"""§2.8 scalar-function battery — string/date/math helpers shared by
the stages, vectorized (pyarrow.compute) with scalar twins for tests.

Mirrors the reference's scalar inventory: "HH:MM" truncation
(``ctripSpider.py:269-272``), ``plane_no[0:2]`` company code
(``ctripSpider.py:274``), epoch-millis conversion
(``ctripSpider.py:101-106``, ``ylSpider06.py:71-77``), discount
formatting (``ctripSpider.py:278``), day-window math
(``ctripSpider.py:147-156``, ``ylSpider06.py:255-262``).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.compute as pc


def hhmm_truncate(times: pa.Array) -> pa.Array:
    """'HH:MM:SS...' → 'HH:MM' (ctripSpider.py:269-272)."""
    return pc.utf8_slice_codeunits(times.cast(pa.string()), 0, 5)


def company_code(plane_nos: pa.Array) -> pa.Array:
    """plane_no[0:2] (ctripSpider.py:274)."""
    return pc.utf8_slice_codeunits(plane_nos.cast(pa.string()), 0, 2)


def epoch_millis(ts: pa.Array) -> pa.Array:
    """timestamp[us] → epoch milliseconds int64 — the vectorized twin of
    get_micro_sec (ctripSpider.py:101-106: epoch-seconds string + 3
    microsecond digits == milliseconds)."""
    return pc.divide(ts.cast(pa.int64()), 1000)


def epoch_millis_scalar(dt_str: str) -> int:
    """'YYYY-MM-DD HH:MM:SS' → epoch ms (UTC-naive, like the oracle)."""
    dt = datetime.strptime(dt_str, "%Y-%m-%d %H:%M:%S")
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)


def discount_label(tenths: pa.Array) -> pa.Array:
    """int tenths → 'X.X折' (drate*10 rule, ctripSpider.py:278)."""
    whole = pc.divide(tenths, 10)
    frac = pc.subtract(tenths, pc.multiply(whole, 10))
    return pc.binary_join_element_wise(
        pc.cast(whole, pa.string()), pa.scalar("."),
        pc.cast(frac, pa.string()), pa.scalar("折"), "")


def day_window(base: str, from_day: int, to_day: int) -> list[str]:
    """['YYYY-MM-DD', ...] for day offsets [from_day, to_day] — the
    spider CLI's date-window semantics (ctripSpider.py:147-156: 0/0 →
    today only, -1 → 15-day window, else inclusive range)."""
    b = datetime.strptime(base, "%Y-%m-%d")
    if from_day == 0 and to_day == 0:
        offsets = [0]
    elif from_day == -1 or to_day == -1:
        offsets = list(range(15))
    else:
        offsets = list(range(from_day, to_day + 1))
    return [(b + timedelta(days=d)).strftime("%Y-%m-%d") for d in offsets]


def has_field(t: pa.Table, dotted: str) -> pa.Array:
    """M14 — safe nested-field probe (ylSpider06.py:80-86) as Arrow
    struct-field validity: 'meta.from_city_code' → bool mask."""
    parts = dotted.split(".")
    col = t[parts[0]]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for p in parts[1:]:
        col = col.field(p)
    return pc.is_valid(col)
