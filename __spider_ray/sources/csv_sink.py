"""S6 — partitioned CSV sink: one file per (OD, date) batch.

The reference writes one CSV per (OD, date, server_ip) with a header
row (``spiders/ylSpider06.py:398-405``; path template at ``:400``) and
only deletes it after the bulk load verifies the row count
(``YlTwistPipeline.py:153-176``).  Here the same layout falls out of a
hash-bucket shuffle keyed by (from, to, off_date): each group writes
its own ``ctrip-{from}-{to}-{date}-{ip}.csv`` atomically (tmp+rename)
— rerunning a partition overwrites, never duplicates.
"""

from __future__ import annotations

import csv
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64

CSV_COLUMNS = [
    "company", "company_no", "plane_no", "start_time", "end_time",
    "from_city", "from_city_code", "to_city", "to_city_code", "create_time",
    "discount", "off_date", "platform", "price", "flight_type", "plane_type",
    "flight_transfer", "from_city_airport", "to_city_airport", "task_time",
    "server_ip", "flight_number",
]   # reference header order (ctripSpider.py:296-299)


def _write_group_csvs(g: pa.Table, out_dir: str) -> pa.Table:
    """One hash bucket → one CSV per (OD, date) key inside it."""
    if g.num_rows == 0:
        return pa.table({"csv_key": pa.array([], pa.string()),
                         "rows": pa.array([], pa.int64())})
    keys = [f"{f}-{t}-{d}" for f, t, d in zip(
        g["from_city_code"].to_pylist(), g["to_city_code"].to_pylist(),
        g["off_date"].to_pylist())]
    karr = np.asarray(keys, dtype=object)
    order = np.argsort(karr, kind="stable")
    ks = karr[order]
    start = np.empty(len(ks), dtype=bool)
    start[0] = True
    start[1:] = ks[1:] != ks[:-1]
    bounds = np.append(np.nonzero(start)[0], len(ks))
    sorted_g = g.take(pa.array(order))
    rows_written = []
    for i in range(len(bounds) - 1):
        part = sorted_g.slice(bounds[i], bounds[i + 1] - bounds[i])
        key = ks[bounds[i]]
        ip = part["server_ip"][0].as_py()
        path = os.path.join(out_dir, f"ctrip-{key}-{ip}.csv")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8", newline="") as f:
            w = csv.writer(f)
            w.writerow(CSV_COLUMNS)
            cols = [part[c].to_pylist() for c in CSV_COLUMNS]
            w.writerows(zip(*cols))
        os.replace(tmp, path)                       # atomic commit
        rows_written.append((key, part.num_rows))
    return pa.table({
        "csv_key": pa.array([k for k, _ in rows_written], pa.string()),
        "rows": pa.array([n for _, n in rows_written], pa.int64()),
    })


def write_partitioned_csv(records: ray.data.Dataset, out_dir: str,
                          n_buckets: int = 64) -> ray.data.Dataset:
    """records Dataset → one CSV per (OD, date); returns the per-file
    row-count manifest Dataset (the reference's expected-count input to
    load verification, YlTwistPipeline.py:166-169)."""
    os.makedirs(out_dir, exist_ok=True)

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(
            t["from_city_code"], t["to_city_code"], t["off_date"], "\x1f")
        b = (hash64(key.combine_chunks() if isinstance(key, pa.ChunkedArray)
                    else key) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    return (records.map_batches(bucketize, batch_format="pyarrow")
                   .groupby("bucket")
                   .map_groups(lambda g: _write_group_csvs(
                       g.drop_columns(["bucket"]), out_dir),
                       batch_format="pyarrow"))
