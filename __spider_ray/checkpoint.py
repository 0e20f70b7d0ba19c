"""Per-epoch checkpointing — lineage + metrics + filter snapshots.

The reference has NO checkpoint/resume (SURVEY.md §4): a killed run
re-crawls everything, mitigated only by daily tables + ``replace into``
idempotence (``YlTwistPipeline.py:153-169``).  Here every epoch commit
writes, under ``out_dir``:

    docs/epoch={e}/          span-doc parquet (partitioned output)
    fares/epoch={e}/         depth-1 lowest-fare parquet
    frontier/epoch={e+1}/    the next epoch's frontier
    state/epoch={e}/         URL-seen shard snapshots (npz)
    epoch={e}.json           _SUCCESS marker: metrics + lineage

Resume = find the last epoch with a marker, restore the seen shards
from its snapshot, reload the stored next-frontier, continue.  Nothing
already fetched is fetched again and no doc is emitted twice (the
count-verification invariant from ``YlTwistPipeline.py:166-169`` is
kept: each marker records expected vs written doc counts).
"""

from __future__ import annotations

import json
import os

import numpy as np


def epoch_marker(out_dir: str, epoch: int) -> str:
    return os.path.join(out_dir, f"epoch={epoch}.json")


def chunk_marker(out_dir: str, epoch: int, chunk: int) -> str:
    return os.path.join(out_dir, f"epoch={epoch}.chunk={chunk}.json")


def complete_chunks(out_dir: str, epoch: int) -> list[int]:
    """Chunk ids of this epoch that committed (sorted)."""
    import re
    pat = re.compile(rf"^epoch={epoch}\.chunk=(\d+)\.json$")
    out = []
    for f in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        m = pat.match(f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def write_snapshot(path: str, snap: dict) -> None:
    """One shard snapshot → one npz.  Uncompressed savez: gzip of the
    (mostly-empty) cuckoo tables costs ~2 s of SERIAL driver time per
    commit — pure scaling tax; raw writes are ~10× faster and the
    checkpoint volume is cheap."""
    arrays = {k: np.frombuffer(v, dtype=np.uint8) if isinstance(v, bytes)
              else np.asarray(v) for k, v in snap.items()}
    np.savez(path, **arrays)


def chunk_state_dir(out_dir: str, epoch: int, chunk: int) -> str:
    return os.path.join(out_dir, f"state/epoch={epoch}.chunk={chunk}")


def commit_chunk(out_dir: str, epoch: int, chunk: int, metrics: dict,
                 seen_snapshots: list[dict] | None = None,
                 state_dir: str | None = None) -> None:
    """Intra-epoch commit: chunk outputs + seen-filter snapshot — the
    unit of 'resume without re-fetching' (a killed job loses at most
    one in-flight chunk).

    Either pass ``seen_snapshots`` (driver-side serialize, the simple
    path) or ``state_dir`` pointing at snapshots ALREADY written by the
    shard actors themselves (``UrlSeenSet.snapshot_all_to`` — parallel,
    off the driver's serial clock; the hot path)."""
    if seen_snapshots is not None:
        state_dir = chunk_state_dir(out_dir, epoch, chunk)
        os.makedirs(state_dir, exist_ok=True)
        for i, snap in enumerate(seen_snapshots):
            write_snapshot(os.path.join(state_dir, f"seen_shard_{i}.npz"), snap)
    if state_dir is not None:
        metrics = dict(metrics, seen_snapshot_dir=state_dir)
    tmp = chunk_marker(out_dir, epoch, chunk) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(metrics, epoch=epoch, chunk=chunk), f, ensure_ascii=False)
    os.replace(tmp, chunk_marker(out_dir, epoch, chunk))


def read_chunk_marker(out_dir: str, epoch: int, chunk: int) -> dict:
    with open(chunk_marker(out_dir, epoch, chunk)) as f:
        return json.load(f)


def load_chunk_snapshots(out_dir: str, epoch: int, chunk: int,
                         n_shards: int) -> list[dict]:
    state_dir = os.path.join(out_dir, f"state/epoch={epoch}.chunk={chunk}")
    return _load_snapshots(state_dir, n_shards)


def drop_chunk_state(out_dir: str, epoch: int) -> None:
    """After an epoch-level commit, the per-chunk snapshots are
    superseded — free the space, keep the (tiny) chunk markers."""
    import glob
    import shutil
    for d in glob.glob(os.path.join(out_dir, f"state/epoch={epoch}.chunk=*")):
        shutil.rmtree(d, ignore_errors=True)


def last_complete_epoch(out_dir: str) -> int:
    """Highest epoch with a _SUCCESS marker, or -1."""
    e = -1
    while os.path.exists(epoch_marker(out_dir, e + 1)):
        e += 1
    return e


def commit_epoch(out_dir: str, epoch: int, metrics: dict,
                 seen_snapshots: list[dict] | None = None,
                 reuse_state_dir: str | None = None) -> None:
    """Epoch-level commit.  ``reuse_state_dir`` hardlinks (or copies)
    the FINAL chunk's already-written shard snapshots instead of
    re-pulling every shard actor — the seen set hasn't changed between
    the last chunk commit and the epoch commit, so the re-serialize was
    a pure duplicate (r2→r3 headline-bench attribution: ~1 s/epoch).
    Hardlinks survive ``drop_chunk_state``'s cleanup of the chunk dir."""
    if seen_snapshots is not None or reuse_state_dir is not None:
        state_dir = os.path.join(out_dir, f"state/epoch={epoch}")
        os.makedirs(state_dir, exist_ok=True)
        if seen_snapshots is not None:
            for i, snap in enumerate(seen_snapshots):
                write_snapshot(os.path.join(state_dir, f"seen_shard_{i}.npz"),
                               snap)
        else:
            import glob
            import shutil
            for src in glob.glob(os.path.join(reuse_state_dir, "*.npz")):
                dst = os.path.join(state_dir, os.path.basename(src))
                if os.path.exists(dst):
                    os.remove(dst)
                try:
                    os.link(src, dst)
                except OSError:          # cross-device: fall back to copy
                    shutil.copy2(src, dst)
        metrics = dict(metrics, seen_snapshot_dir=state_dir)
    tmp = epoch_marker(out_dir, epoch) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(metrics, epoch=epoch), f, ensure_ascii=False)
    os.replace(tmp, epoch_marker(out_dir, epoch))   # atomic commit


def read_marker(out_dir: str, epoch: int) -> dict:
    with open(epoch_marker(out_dir, epoch)) as f:
        return json.load(f)


def _load_snapshots(state_dir: str, n_shards: int) -> list[dict]:
    snaps = []
    for i in range(n_shards):
        z = np.load(os.path.join(state_dir, f"seen_shard_{i}.npz"))
        snap = {}
        for k in z.files:
            v = z[k]
            # scalars → int; arrays pass through (CuckooFilter.restore
            # accepts ndarray or bytes for the dense "table" field and
            # ndarrays for the sparse "idx"/"fps" fields)
            snap[k] = int(v) if v.ndim == 0 else v
        snaps.append(snap)
    return snaps


def load_seen_snapshots(out_dir: str, epoch: int, n_shards: int) -> list[dict]:
    return _load_snapshots(os.path.join(out_dir, f"state/epoch={epoch}"), n_shards)
