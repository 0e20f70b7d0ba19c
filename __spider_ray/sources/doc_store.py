"""Document-store abstraction — Lance when available, Parquet otherwise.

The target layout (north_rule) stores interleaved text+media span docs
in **Lance** tables.  The ``lance``/``pylance`` package is not installed
in this container, so the store is format-gated behind an import-try:
the same ``write_documents``/``read_documents`` API transparently uses
``ray.data.read_lance`` / ``Dataset.write_lance`` when ``import lance``
succeeds, else a partitioned Parquet directory with a tiny JSON
manifest carrying the same commit metadata a Lance transaction would
(row count, schema fingerprint, append epoch) — the count-verification
invariant the reference enforces on bulk load
(``YlTwistPipeline.py:166-169``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

try:
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

MANIFEST = "_manifest.json"


def _lance_path(path: str) -> str:
    """ONE layout rule for the whole store: the Lance table of a doc
    directory lives at ``<path>.lance`` (parquet staging/fallback lives
    in ``path`` itself); writers and readers both resolve through
    here."""
    return path + ".lance"


def write_documents(ds: ray.data.Dataset, path: str,
                    expected_rows: int | None = None) -> dict:
    """Write a documents Dataset; returns the commit record.

    Enforces the reference's written-rows-vs-expected check when
    ``expected_rows`` is given (YlTwistPipeline.py:166-169): a short
    write raises instead of silently committing.  On the Lance path the
    check applies to the rows THIS call appended (total minus
    pre-append count) — verifying the whole table would let a short
    append pass on any already-populated table.
    """
    os.makedirs(path, exist_ok=True)
    if HAVE_LANCE:
        lp = _lance_path(path)                            # pragma: no cover
        try:                                              # pragma: no cover
            pre = ray.data.read_lance(lp).count()         # pragma: no cover
        except Exception:                                 # pragma: no cover
            pre = 0                                       # pragma: no cover
        ds.write_lance(lp, mode="append")                 # pragma: no cover
        total = ray.data.read_lance(lp).count()           # pragma: no cover
        n = total - pre                                   # pragma: no cover
    else:
        ds.write_parquet(path)
        total = n = ray.data.read_parquet(path).count()  # parquet-metadata count
    if expected_rows is not None and n < expected_rows:
        raise RuntimeError(
            f"document store commit verification failed: wrote {n} rows, "
            f"expected >= {expected_rows}")
    commit = {"rows": n, "total_rows": total,
              "format": "lance" if HAVE_LANCE else "parquet"}
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(commit, f)
    return commit


def commit_staged_documents(path: str, expected_rows: int | None = None,
                            unique_key: str | None = None) -> dict:
    """Commit a directory of parquet parts STAGED by a streaming tee
    (``pipelines/epoch._side_write`` writes doc parts inline during the
    fetch→parse pass so docs never need a second full pipeline run).

    This is the store-commit step on the crawl's write path:
    - when ``lance`` is importable the staged parts are appended to the
      Lance table at ``<path>.lance`` (the north_rule storage target);
    - the reference's count-verification invariant
      (``YlTwistPipeline.py:166-169``) runs here: written rows must be
      ≥ ``expected_rows`` when given;
    - ``unique_key`` (opt-in: it costs a full groupby shuffle over the
      key column) additionally asserts the distinct-key count EQUALS
      the row count — the ``replace into`` idempotence analog; a
      duplicate or split doc fails the commit.  The epoch loop turns it
      on via ``run_crawl(verify_unique=True)``; conformance tests use
      it, the throughput path keeps the commit metadata-only;
    - the manifest records the verified count.
    """
    import glob as _glob
    # recursive: parts may sit under daily partition dirs
    # (date=YYYY_MM_DD/ — the reference's table-per-day layout,
    # ylutils/ylutil.py:13-15)
    parts = _glob.glob(os.path.join(path, "**", "*.parquet"),
                       recursive=True)
    if not parts:
        # empty chunk (all pages errored / filtered): commit zero rows —
        # Ray's read_parquet raises on an empty directory.  The
        # count-verification invariant still applies: an EXPECTED
        # non-empty commit with nothing staged is the severest short
        # write of all.
        if expected_rows:
            raise RuntimeError(
                f"document store commit verification failed: wrote 0 rows, "
                f"expected >= {expected_rows}")
        commit = {"rows": 0, "unique": None, "kmv_distinct_est": None,
                  "kmv_covered_rows": None,
                  "format": "lance" if HAVE_LANCE else "parquet"}
        with open(os.path.join(path, MANIFEST), "w") as f:
            json.dump(commit, f)
        return commit
    import pyarrow.parquet as _pq
    n = sum(_pq.read_metadata(f).num_rows for f in parts)  # footers only
    # ALL verification runs on the parquet staging BEFORE anything is
    # published to the Lance table — a failed audit must not leave bad
    # rows committed and readable.
    # Always-on cheap screening: merge the per-part KMV sketches from
    # the parquet FOOTERS (no data read) and compare the distinct
    # estimate to the SKETCHED parts' row count (mixed-writer dirs may
    # have unsketched parts — those are outside the screen's coverage).
    # Below k=256 distinct values the merged sketch IS the exact
    # distinct set, so any shortfall is proof of duplicates; above it
    # the estimate carries ~6% rel. std, so flag at 4σ (25%).
    kmv_est, covered_rows, kmv_exact, part_dup = _kmv_screen(path)
    suspicious = part_dup           # per-part exact shortfall is proof
    if kmv_est is not None and covered_rows > 0:
        # merged-sketch regimes: below k the merged sketch IS the
        # distinct set (any shortfall is proof); above k the estimate
        # carries ~6.3% rel std (1/√(k−2), k=256) — flag at 3σ (19%).
        # Residual escape: a cross-part duplicate rate under ~19% with
        # every part individually duplicate-free AND the merged sketch
        # saturated can pass the screen; verify_unique=True remains the
        # exact gate for that regime (recorded in the manifest).
        suspicious = suspicious or (
            (kmv_est < covered_rows) if kmv_exact
            else (kmv_est < covered_rows * 0.81))
    n_unique = None
    if (unique_key is not None or suspicious) and n:
        key = unique_key or "doc_id"
        n_unique = (ray.data.read_parquet(path, columns=[key],
                                          file_extensions=["parquet"])
                    .groupby(key).count().count())
        if n_unique != n:
            raise RuntimeError(
                f"document store commit verification failed: {n} rows but "
                f"{n_unique} distinct {key} — duplicate or split docs")
    if expected_rows is not None and n < expected_rows:
        raise RuntimeError(
            f"document store commit verification failed: wrote {n} rows, "
            f"expected >= {expected_rows}")
    if HAVE_LANCE:
        # publish only after verification; overwrite, not append: a
        # chunk commits exactly once, and a crash-resume re-stages the
        # SAME chunk — append would stack the failed attempt's rows
        # under the re-run's (duplicate docs)
        staged = ray.data.read_parquet(path, file_extensions=["parquet"])  # pragma: no cover
        staged.write_lance(_lance_path(path), mode="overwrite")  # pragma: no cover
        n = ray.data.read_lance(_lance_path(path)).count()       # pragma: no cover
    # per-day partition inventory (date=… layer): the manifest is the
    # operational view the reference gets from its table-per-day names
    partitions: dict[str, int] = {}
    for f in parts:
        seg = next((s[5:] for s in f.split(os.sep) if s.startswith("date=")),
                   None)
        if seg is not None:
            partitions[seg] = partitions.get(seg, 0) \
                + _pq.read_metadata(f).num_rows
    commit = {"rows": n, "unique": n_unique,
              "kmv_distinct_est": round(kmv_est, 1) if kmv_est is not None else None,
              "kmv_covered_rows": covered_rows or None,
              "partitions": partitions or None,
              "format": "lance" if HAVE_LANCE else "parquet"}
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(commit, f)
    return commit


def _kmv_screen(path: str) -> tuple[float | None, int, bool, bool]:
    """Merge per-part KMV doc_id sketches from parquet footer metadata
    (written by the epoch tee) → ``(distinct_estimate, covered_rows,
    is_exact, part_dup)``.

    ``covered_rows`` sums only the SKETCHED parts' row counts (the
    ``n_docs`` footer value, falling back to the parquet footer row
    count) so mixed dirs with non-epoch writers compare like against
    like.  ``is_exact`` is True when the merged sketch holds fewer than
    k values — then it is the full distinct set, not an estimate.
    ``part_dup`` is True when any single part's sketch is exact (below
    k values) yet smaller than that part's row count — low-rate
    within-part duplicate/split docs (the batch-boundary failure the
    NOTES_r2 contiguity assumption describes) are PROVEN this way even
    when the merged sketch has saturated into estimate territory.
    Returns ``(None, 0, False, False)`` when no part carries a sketch."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import KMV_K, kmv_estimate, kmv_merge
    sketches, covered, part_dup = [], 0, False
    for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                       recursive=True):
        meta = pq.read_schema(f).metadata or {}
        if b"kmv_doc_id" in meta:
            sk = np.frombuffer(meta[b"kmv_doc_id"], dtype=np.uint64)
            sketches.append(sk)
            part_rows = int(meta[b"n_docs"]) if b"n_docs" in meta \
                else pq.read_metadata(f).num_rows
            covered += part_rows
            if len(sk) < KMV_K and len(np.unique(sk)) < part_rows:
                part_dup = True
    if not sketches:
        return None, 0, False, False
    merged = kmv_merge(sketches)
    return kmv_estimate(merged), covered, len(merged) < KMV_K, part_dup


def partition_files(path: str, date_from: str | None = None,
                    date_to: str | None = None) -> list[str]:
    """Parquet part files of the daily partitions inside the inclusive
    ``[date_from, date_to]`` window (``date=YYYY_MM_DD`` dir names sort
    chronologically as strings, so the predicate is a string compare —
    no footer or data read happens here).  ``None`` bounds are open.
    Parts outside any ``date=`` layer belong to no daily partition and
    are excluded from a windowed read."""
    import glob as _glob
    out = []
    for f in sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                               recursive=True)):
        seg = next((s[5:] for s in f.split(os.sep) if s.startswith("date=")),
                   None)
        if seg is None:
            continue
        if date_from is not None and seg < date_from:
            continue
        if date_to is not None and seg > date_to:
            continue
        out.append(f)
    return out


def read_documents(path: str, date_from: str | None = None,
                   date_to: str | None = None) -> ray.data.Dataset:
    """Read back a committed doc directory: the Lance table at
    ``<path>.lance`` when present (the published, verified copy), else
    the parquet parts in ``path`` itself.

    ``date_from``/``date_to`` (inclusive, ``YYYY_MM_DD``) prune at the
    PARTITION level: only the matching ``date=`` directories' files are
    handed to ``read_parquet``, so an incremental consumer (e.g.
    ``dedup_incremental``'s delta pass) never opens finished days'
    files."""
    if HAVE_LANCE and os.path.exists(_lance_path(path)):
        ds = ray.data.read_lance(_lance_path(path))    # pragma: no cover
        if date_from or date_to:                       # pragma: no cover
            import pyarrow.compute as _pc              # pragma: no cover
            ds = ds.filter(                            # pragma: no cover
                expr=f"crawl_date >= '{date_from or ''}'")  # pragma: no cover
        return ds                                      # pragma: no cover
    if date_from is None and date_to is None:
        return ray.data.read_parquet(
            path, file_extensions=["parquet"])       # skip the manifest
    files = partition_files(path, date_from, date_to)
    if not files:
        return ray.data.from_arrow(pa.table({"doc_id": pa.array(
            [], type=pa.string())}))
    return ray.data.read_parquet(files)


def manifest(path: str) -> dict | None:
    p = os.path.join(path, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


# --------------------------------------------------------------- compaction

_COMPACT_JOURNAL = "_compact_journal.json"


def recover_compaction(part_dir: str) -> None:
    """Finish or roll back an interrupted ``compact_partition``.

    The journal (written AFTER every bin's replacement file is fully
    staged, BEFORE any rename/delete) makes the swap exactly-once:

    - bin target exists   → the swap committed; delete leftover sources
    - bin target missing  → the swap never started; delete its staged
      tmp (if any) and keep the sources untouched

    Stray ``*.parquet.tmp`` files (a crash before the journal) are
    always removed — readers never see them (``partition_files`` and
    ``read_parquet`` match ``*.parquet`` only)."""
    jp = os.path.join(part_dir, _COMPACT_JOURNAL)
    if os.path.exists(jp):
        with open(jp) as f:
            journal = json.load(f)
        for b in journal["bins"]:
            tgt = os.path.join(part_dir, b["target"])
            if os.path.exists(tgt):
                for s in b["sources"]:
                    sp = os.path.join(part_dir, s)
                    if os.path.exists(sp):
                        os.unlink(sp)
            else:
                tmp = tgt + ".tmp"
                if os.path.exists(tmp):
                    os.unlink(tmp)
        os.unlink(jp)
    import glob as _glob
    for t in _glob.glob(os.path.join(part_dir, "*.parquet.tmp")):
        os.unlink(t)


def _compact_bin(files: list[str], out_tmp: str) -> int:
    """Rewrite one bin of small parts as a single file (runs as a Ray
    task — the rewrite IS the compaction cost; the driver only swaps
    names).  Footer KMV doc_id sketches and ``n_docs`` counts are
    MERGED so ``_kmv_screen``'s duplicate screen keeps working on the
    compacted file."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import kmv_merge
    tables, sketches, n_docs = [], [], 0
    for f in files:
        t = pq.read_table(f)
        meta = t.schema.metadata or {}
        if b"kmv_doc_id" in meta:
            sketches.append(np.frombuffer(meta[b"kmv_doc_id"],
                                          dtype=np.uint64))
            n_docs += int(meta.get(b"n_docs", b"0") or t.num_rows)
        tables.append(t.replace_schema_metadata(None))
    merged = pa.concat_tables(tables).combine_chunks()
    if len(sketches) == len(files):
        merged = merged.replace_schema_metadata(
            {b"kmv_doc_id": kmv_merge(sketches).tobytes(),
             b"n_docs": str(n_docs).encode()})
    pq.write_table(merged, out_tmp)
    return merged.num_rows


def compact_partition(store_path: str, date: str | None = None,
                      target_bytes: int = 128 << 20) -> dict:
    """Merge a partition's small parquet parts into ~``target_bytes``
    files — the maintenance pass a streaming crawl store needs: the
    epoch tee writes one part per fused task batch, so a long crawl
    accumulates thousands of small files per day and every downstream
    read pays per-file open/footer cost.

    Offline-maintenance semantics: run when no writer holds the
    partition (like Lance/Iceberg compaction, which this stands in
    for).  Bins are rewritten by PARALLEL Ray tasks; the driver then
    journals the swap and commits it (rename + source delete), so a
    crash at any point is repaired by ``recover_compaction`` with no
    row ever duplicated or lost.  Row counts are verified bin-by-bin
    before anything is renamed.  Idempotent: a second call finds
    nothing small enough to merge."""
    import glob as _glob

    import ray as _ray
    part_dir = store_path if date is None \
        else os.path.join(store_path, f"date={date}")
    recover_compaction(part_dir)
    files = sorted(f for f in _glob.glob(os.path.join(part_dir, "*.parquet"))
                   if not os.path.basename(f).startswith("compact-"))
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        cur.append(f)
        cur_bytes += os.path.getsize(f)
        if cur_bytes >= target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        bins.append(cur)
    bins = [b for b in bins if len(b) >= 2]
    if not bins:
        return {"files_before": len(files), "files_after": len(files),
                "bins": 0, "rows": 0}

    task = _ray.remote(_compact_bin)
    import hashlib as _hl
    plans = []
    for i, b in enumerate(bins):
        tag = _hl.md5("|".join(os.path.basename(x) for x in b)
                      .encode()).hexdigest()[:12]
        target = f"compact-{i}-{tag}.parquet"
        plans.append((b, target))
    rows = _ray.get([task.remote(b, os.path.join(part_dir, t) + ".tmp")
                     for b, t in plans])
    # verify before any visible change
    for (b, t), n in zip(plans, rows):
        import pyarrow.parquet as pq
        want = sum(pq.read_metadata(f).num_rows for f in b)
        if n != want:
            raise RuntimeError(
                f"compaction bin {t} rewrote {n} rows, sources hold {want}")
    journal = {"bins": [{"target": t,
                         "sources": [os.path.basename(x) for x in b]}
                        for b, t in plans]}
    jp = os.path.join(part_dir, _COMPACT_JOURNAL)
    with open(jp, "w") as f:
        json.dump(journal, f)
    for b, t in plans:
        tgt = os.path.join(part_dir, t)
        os.rename(tgt + ".tmp", tgt)
        for s in b:
            os.unlink(s)
    os.unlink(jp)
    return {"files_before": len(files),
            "files_after": len(files) - sum(len(b) for b in bins) + len(bins),
            "bins": len(bins), "rows": int(sum(rows))}
