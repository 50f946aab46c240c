"""Positional deletion vectors for the snapshot table.

The MOR delete path (sinks/mor.py) writes *equality* tombstones: a delta
row carrying the key, resolved by hash against the base at read time. That
is the right shape when deletes arrive mixed with upserts in a change
batch — but for *delete-only* maintenance traffic (GDPR erasure lists,
moderation take-downs, retention sweeps) it forces every subsequent read of
the touched bucket off the native vectorized parquet scan and into the
per-bucket pandas resolve, even though nothing was upserted.

Deletion vectors are the Iceberg-v3 / Delta answer: store the deleted rows'
*positions* per base data file and let the reader mask them out. Here a
bucket's DV is one parquet directory of ``(file: string, pos: long)`` rows
— ``file`` is the base data file's basename, ``pos`` its 0-based row index
(parquet row order, identical for Spark's reader and pyarrow). Readers with
a DV but no pending delta chain stay on the native scan and drop masked
rows with a **broadcast anti-join** against the (tiny) DV on
``(bucket, file, pos)`` via the ``_metadata.file_name`` /
``_metadata.row_index`` scan columns — whole-stage codegen, no Python.
Buckets that also carry an equality-delta chain mask the base positions
inside the existing pandas resolve (``mor.resolve_live(dv_map=...)``).

Each DV commit MERGES the bucket's previous DV (union + distinct), so a
reader consults exactly one DV directory per bucket — the chain-growth
problem stays on the equality-delta side. A base rewrite (compaction,
rescale, COW merge) re-materializes live rows only, so the manifest drops
the bucket's DV at that point (snapshot_table.write_manifest).

Scale contract: a DV is O(deleted rows still pending against the current
base) — bounded by compaction cadence, exactly like Iceberg's delete-file
accumulation, and always ≪ the base (else the bucket should be compacted).
Broadcasting the DV is therefore the right plan; ``read_state`` asserts
nothing about its size because compaction keeps the invariant.

The reference has no incremental delete at all — its pipelines drop and
re-derive whole tables per run (georef_ar_etl/transformers.py:67-151);
deletion vectors exist so a 100 TB table never pays that rewrite for an
erasure list.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

DV_SCHEMA = "bucket int, file string, pos long"


def read_dv_map(dv_dir: str) -> dict[str, np.ndarray]:
    """Task/driver-side read of ONE bucket's DV directory → {base-file
    basename: sorted int64 positions}. Kilobyte-scale metadata read."""
    files = [
        os.path.join(dv_dir, n)
        for n in os.listdir(dv_dir)
        if n.endswith(".parquet")
    ]
    if not files:
        return {}
    t = pq.read_table(files, columns=["file", "pos"])
    fnames = t.column("file").to_numpy(zero_copy_only=False)
    pos = t.column("pos").to_numpy(zero_copy_only=False)
    out: dict[str, np.ndarray] = {}
    for f in np.unique(fnames):
        p = np.unique(pos[fnames == f]).astype(np.int64)
        out[str(f)] = p
    return out


def dv_rows(dv_dir: str) -> int:
    """Number of masked positions in a DV dir (footer metadata only)."""
    total = 0
    for n in os.listdir(dv_dir):
        if n.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(dv_dir, n)).metadata.num_rows
    return total


def mask_positions(n_rows: int, positions: np.ndarray | None) -> np.ndarray:
    """Boolean keep-mask of length ``n_rows`` with ``positions`` dropped."""
    mask = np.ones(n_rows, dtype=bool)
    if positions is not None and len(positions):
        valid = positions[(positions >= 0) & (positions < n_rows)]
        mask[valid] = False
    return mask
