"""Merge-on-read resolution kernel for the snapshot table.

Copy-on-write (the round-1/2 physical layer) rewrites every touched bucket
whole per batch. At 100 TB a batch touching 1% of a bucket's rows pays 100x
write amplification — the Iceberg/Hudi answer is merge-on-read: small
batches append a per-epoch *delta file* (upsert rows + equality-delete
tombstones keyed on ``doc_id``) next to the bucket's base files; readers
resolve base + deltas with last-writer-wins; compaction rewrites the base
when the delta chain grows. The reference itself always rewrites whole
tables (georef_ar_etl/transformers.py:67-151 re-derives every row per run);
MOR changes only the physical layer, never the visible state.

Delta file format: the state payload columns (all nullable) plus an ``op``
column (``upsert`` | ``delete``). Tombstones carry the key and null payload.
Keys are unique within one delta (in-batch last-writer-wins has already
collapsed the batch), so resolution is a concat in epoch order +
``drop_duplicates(keep="last")`` — no sort needed.

Everything here runs INSIDE merge/read tasks (pyarrow + pandas on one
bucket's files) — the same single-bucket-per-task contract the
storage-partitioned merge documents (operators/copart_merge.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OP_COL = "op"
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def _frames_keys(base_files: list[str], delta_files: list[str], key: str):
    """(key, op) frames in resolution order: base first, deltas by epoch."""
    frames = []
    if base_files:
        frames.append(
            pq.read_table(base_files, columns=[key]).to_pandas().assign(_op=OP_UPSERT)
        )
    for f in delta_files:
        frames.append(
            pq.read_table(f, columns=[key, OP_COL])
            .to_pandas()
            .rename(columns={OP_COL: "_op"})
        )
    return frames


def live_keys(base_files: list[str], delta_files: list[str], key: str = "doc_id") -> pd.Index:
    """Resolved live key set — reads ONLY the key (+op) columns, which is the
    cheap read that lets a delta-mode merge classify insert/update/delete
    without touching the (much wider) payload."""
    frames = _frames_keys(base_files, delta_files, key)
    if not frames:
        return pd.Index([], dtype=object)
    allf = pd.concat(frames, ignore_index=True).drop_duplicates(key, keep="last")
    return pd.Index(allf.loc[allf["_op"] != OP_DELETE, key])


def align_payload(pdf: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    """Schema-evolution alignment: columns a (pre-evolution) file lacks read
    as null. Shared by resolution and the changelog's delta read so the two
    paths can't diverge."""
    for c in payload_cols:
        if c not in pdf.columns:
            pdf[c] = None
    return pdf


def resolve_live(
    base_files: list[str],
    delta_files: list[str],
    payload_cols: list[str],
    key: str = "doc_id",
) -> pd.DataFrame:
    """Full-payload resolution: base rows + delta chain, latest version per
    key wins, tombstoned keys removed. Missing columns (pre-evolution base
    files) read as null. Returns payload_cols sorted by key."""
    frames = []

    def aligned(pdf: pd.DataFrame, op_series) -> pd.DataFrame:
        pdf = align_payload(pdf, payload_cols)[payload_cols].copy()
        pdf["_op"] = op_series
        return pdf

    if base_files:
        frames.append(aligned(pq.read_table(base_files).to_pandas(), OP_UPSERT))
    for f in delta_files:
        d = pq.read_table(f).to_pandas()
        frames.append(aligned(d, d[OP_COL].to_numpy()))
    if not frames:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in payload_cols})
    allf = pd.concat(frames, ignore_index=True).drop_duplicates(key, keep="last")
    live = allf.loc[allf["_op"] != OP_DELETE, payload_cols]
    return live.sort_values(key).reset_index(drop=True)


def write_delta(
    path: str,
    ups: pd.DataFrame,
    del_keys,
    payload_cols: list[str],
    arrow_schema: pa.Schema,
    key: str = "doc_id",
) -> int:
    """Write one delta file (upserts + tombstones, sorted by key so task
    retries produce identical bytes). Returns the row count written."""
    ups = ups[payload_cols].copy()
    ups[OP_COL] = OP_UPSERT
    del_keys = list(del_keys)
    if del_keys:
        tomb = pd.DataFrame({c: [None] * len(del_keys) for c in payload_cols})
        tomb[key] = del_keys
        tomb[OP_COL] = OP_DELETE
        full = pd.concat([ups, tomb], ignore_index=True)
    else:
        full = ups
    full = full.sort_values(key).reset_index(drop=True)
    schema = arrow_schema.append(pa.field(OP_COL, pa.string()))
    table = pa.Table.from_pandas(full, schema=schema, preserve_index=False)
    pq.write_table(table, path, compression="lz4", row_group_size=65536)
    return len(full)
