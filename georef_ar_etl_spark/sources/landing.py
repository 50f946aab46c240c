"""Landing-zone intake: incoming change files → WAL segments, with the
reference's download-step guarantees re-expressed for a file-drop edge.

Reference parity (DownloadURLStep, georef_ar_etl/extractors.py:6-41):
* **MD5 lineage** — every ingested file's digest is recorded in a ledger,
  exactly like the reference stores ``report_data[url] = md5`` per download.
* **Resume / skip** — a file whose digest is already in the ledger is
  skipped (the reference skips an existing download in interactive mode);
  re-delivering the same bytes is a no-op, re-delivering DIFFERENT bytes
  under an already-ingested batch id raises (the engine's ConflictError
  made file-level).
* **Atomicity** — a segment becomes visible under its final
  ``batch-<id>.parquet`` name only via rename, after the ledger entry is
  fsync'd; half-copied files are invisible to ``replay_segments``.

Scale note: intake is per-FILE driver-side work (hashing streams in
chunks, no full-file buffering), sized for control-plane volumes — the
row data inside segments is only ever read by Spark executors.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil


class IngestConflictError(RuntimeError):
    """A batch id was re-delivered with different file content."""


_BATCH_RE = re.compile(r"(?:^|[^0-9])(\d+)\.parquet$")


def file_md5(path: str, chunk_size: int = 1 << 20) -> str:
    """Streaming MD5 (the reference hashes download chunks the same way)."""
    md5 = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(chunk_size), b""):
            md5.update(chunk)
    return md5.hexdigest()


def _ledger_path(wal_dir: str) -> str:
    return os.path.join(wal_dir, "_ingest_ledger.json")


def read_ledger(wal_dir: str) -> dict[str, dict]:
    p = _ledger_path(wal_dir)
    if not os.path.exists(p):
        return {}
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _write_ledger(wal_dir: str, ledger: dict[str, dict]) -> None:
    p = _ledger_path(wal_dir)
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(ledger, f, sort_keys=True, indent=0)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def batch_id_of(filename: str) -> int:
    """Batch id = trailing integer in the file name (``events-003.parquet``
    → 3). Explicit over clever: unparseable names are rejected."""
    m = _BATCH_RE.search(os.path.basename(filename))
    if not m:
        raise ValueError(f"cannot derive a batch id from {filename!r}")
    return int(m.group(1))


def ingest_files(incoming: list[str], wal_dir: str) -> list[dict]:
    """Ingest incoming change files into the WAL-segment layout
    (``batch-<id>.parquet``) that ``CdcEngine.replay_segments`` and the
    streaming front-end consume.

    Per file: digest → ledger lookup → skip (same digest), raise
    (conflicting digest for an ingested batch id), or copy+rename into
    place and append to the ledger. Returns one report row per input file:
    ``{file, batch_id, md5, status}`` with status ingested|skipped.
    """
    os.makedirs(wal_dir, exist_ok=True)
    ledger = read_ledger(wal_dir)
    report: list[dict] = []
    for src in incoming:
        bid = batch_id_of(src)
        digest = file_md5(src)
        key = str(bid)
        row = {"file": os.path.basename(src), "batch_id": bid, "md5": digest}
        dest = os.path.join(wal_dir, f"batch-{bid}.parquet")
        if key in ledger:
            if ledger[key]["md5"] != digest:
                raise IngestConflictError(
                    f"batch {bid} re-delivered with different content: "
                    f"{digest} != {ledger[key]['md5']}"
                )
            if os.path.exists(dest):
                report.append({**row, "status": "skipped"})
                continue
            # crash recovery: ledger entry exists but the segment rename was
            # lost — fall through and redo the copy+rename (idempotent)
        tmp = dest + ".ingesting"
        with open(src, "rb") as fin, open(tmp, "wb") as fout:
            shutil.copyfileobj(fin, fout)
            fout.flush()
            os.fsync(fout.fileno())  # the rename below must never publish
            # a page-cache-only copy: a crash after rename but before
            # writeback would otherwise leave a truncated segment that the
            # skip path (ledger hit + dest exists) accepts forever
        # ledger first, segment rename second: a crash between the two is
        # repaired by the recovery branch above on the next run; a crash
        # before the ledger write leaves only an invisible .ingesting temp
        ledger[key] = {"md5": digest, "source_file": os.path.basename(src)}
        _write_ledger(wal_dir, ledger)
        os.replace(tmp, dest)
        report.append({**row, "status": "ingested"})
    return report
