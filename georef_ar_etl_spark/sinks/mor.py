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

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from georef_ar_etl_spark.sinks.zonemap import write_zonemap, zonemap_from_pandas

OP_COL = "op"
OP_UPSERT = "upsert"
OP_DELETE = "delete"

# ---------------------------------------------------------------- key blooms
# Per-delta-dir key bloom sidecar (`_bloom.json`), the Hudi/Delta bloom-index
# idea applied to the MOR chain: a point lookup on a dirty bucket must
# normally read EVERY delta file in the chain (any of them could carry the
# key's latest version or its tombstone); the sidecar lets the reader skip
# chain links whose bloom proves the key absent. No false negatives (a
# skipped delta provably does not mention the key, so last-writer-wins over
# the KEPT links is unchanged); false positives only cost a read. Hashing is
# md5 double-hashing (Kirsch-Mitzenmacher) — NOT Spark's xxhash64 — because
# the membership probe runs driver-side in plain Python at lookup-planning
# time, before any job is launched.
BLOOM_SIDECAR = "_bloom.json"
BLOOM_BITS = 8192  # 1 KiB/delta; ~0.6% fp at 1k keys, k=5
BLOOM_K = 5


def _bloom_positions(value: str, n_bits: int, k: int) -> list[int]:
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd → full period mod 2^m bits
    return [(h1 + i * h2) % n_bits for i in range(k)]


def key_bloom_hex(keys, n_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> str:
    """Bloom filter of ``keys`` as a hex bitstring (bit i = byte i//8, MSB
    first within the byte)."""
    bits = bytearray(n_bits // 8)
    for key in keys:
        for p in _bloom_positions(key, n_bits, k):
            bits[p >> 3] |= 0x80 >> (p & 7)
    return bits.hex()


def sidecar_might_contain(sidecar: dict, key) -> bool:
    bits = bytes.fromhex(sidecar["bits"])
    return all(
        bits[p >> 3] & (0x80 >> (p & 7))
        for p in _bloom_positions(key, int(sidecar["n_bits"]), int(sidecar["k"]))
    )


def write_bloom_sidecar(delta_dir: str, keys) -> None:
    with open(os.path.join(delta_dir, BLOOM_SIDECAR), "w") as f:
        json.dump(
            {"n_bits": BLOOM_BITS, "k": BLOOM_K,
             "bits": key_bloom_hex(keys)},
            f,
        )


def read_bloom_sidecar(delta_dir: str) -> dict | None:
    """None for pre-bloom delta dirs — the reader then keeps the link (no
    sidecar ⇒ no skip, never a wrong skip)."""
    p = os.path.join(delta_dir, BLOOM_SIDECAR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _read_base_file(
    path: str,
    dv_map: dict | None,
    columns: list[str] | None = None,
    filters=None,
) -> pd.DataFrame:
    """Read ONE base file honoring its deletion-vector positions
    (sinks/deletion_vectors.py). Files without a DV entry keep the pushed
    ``filters``; files WITH one must read unfiltered first (a pushed filter
    renumbers rows, breaking the positional mask), mask, then filter in
    pandas — the cost of positional deletes, paid only on masked files."""
    pos = None if not dv_map else dv_map.get(os.path.basename(path))
    if pos is None or not len(pos):
        return pq.read_table([path], columns=columns, filters=filters).to_pandas()
    from georef_ar_etl_spark.sinks.deletion_vectors import mask_positions

    if filters:
        # point lookup on a masked file: a pushed filter renumbers rows, so
        # translate positions → KEYS first with a key-column-only read
        # (cheap — one narrow column), then keep the pushdown on the wide
        # read and drop masked keys. Sound because base files are unique
        # per key, so a masked key has no other (live) row in the base.
        col, _op, vals = filters[0]
        kcol = pq.read_table([path], columns=[col]).column(col)
        valid = pos[(pos >= 0) & (pos < len(kcol))]
        masked_keys = set(kcol.take(valid).to_pylist())
        pdf = pq.read_table([path], columns=columns, filters=filters).to_pandas()
        if masked_keys:
            pdf = pdf[~pdf[col].isin(masked_keys)]
        return pdf.reset_index(drop=True)
    pdf = pq.read_table([path], columns=columns).to_pandas()
    return pdf[mask_positions(len(pdf), pos)].reset_index(drop=True)


def _base_frames(
    base_files: list[str],
    dv_map: dict | None,
    columns: list[str] | None = None,
    filters=None,
) -> list[pd.DataFrame]:
    if not base_files:
        return []
    if not dv_map:
        return [pq.read_table(base_files, columns=columns, filters=filters).to_pandas()]
    return [_read_base_file(f, dv_map, columns, filters) for f in base_files]


def _frames_keys(
    base_files: list[str],
    delta_files: list[str],
    key: str,
    dv_map: dict | None = None,
):
    """(key, op) frames in resolution order: base first, deltas by epoch."""
    frames = [
        b.assign(_op=OP_UPSERT)
        for b in _base_frames(base_files, dv_map, columns=[key])
    ]
    for f in delta_files:
        frames.append(
            pq.read_table(f, columns=[key, OP_COL])
            .to_pandas()
            .rename(columns={OP_COL: "_op"})
        )
    return frames


def live_keys(
    base_files: list[str],
    delta_files: list[str],
    key: str = "doc_id",
    dv_map: dict | None = None,
) -> pd.Index:
    """Resolved live key set — reads ONLY the key (+op) columns, which is the
    cheap read that lets a delta-mode merge classify insert/update/delete
    without touching the (much wider) payload. ``dv_map`` masks the base
    files' deletion-vector positions (a DV-deleted key must classify as an
    INSERT when it comes back, and its delete as a no-op)."""
    frames = _frames_keys(base_files, delta_files, key, dv_map)
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
    keys: list | None = None,
    dv_map: dict | None = None,
) -> pd.DataFrame:
    """Full-payload resolution: base rows + delta chain, latest version per
    key wins, tombstoned keys removed. Missing columns (pre-evolution base
    files) read as null. Returns payload_cols sorted by key.

    ``keys`` restricts resolution to those key values (point lookup): the
    predicate is pushed into the parquet reads, where the files' sort-by-key
    layout turns it into row-group min/max pruning. Filtering by key
    commutes with per-key last-writer-wins, so the restricted resolve equals
    the full resolve filtered.

    ``dv_map`` (basename → positions, sinks/deletion_vectors.py) masks the
    base files' positional deletes BEFORE the chain applies — the DV belongs
    to the base, so resolution order is (base − DV) then deltas LWW."""
    frames = []
    flt = None if keys is None else [(key, "in", list(keys))]

    def aligned(pdf: pd.DataFrame, op_series) -> pd.DataFrame:
        pdf = align_payload(pdf, payload_cols)[payload_cols].copy()
        pdf["_op"] = op_series
        return pdf

    for b in _base_frames(base_files, dv_map, filters=flt):
        frames.append(aligned(b, OP_UPSERT))
    for f in delta_files:
        d = pq.read_table(f, filters=flt).to_pandas()
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
    bloom_cols: list[str] | None = None,
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
    # key-bloom sidecar for point-lookup delta skipping — computed here, in
    # the merge task that already holds the keys (no extra read), and living
    # inside the (orphan-until-manifest) delta dir so it shares the delta
    # file's atomicity and vacuum lifecycle
    write_bloom_sidecar(os.path.dirname(path), full[key].astype(str))
    # column zone-map sidecar for value-predicate scan planning — same
    # lifecycle; computed over the full frame (tombstones' null payload
    # lands in nulls_only, so an all-tombstone delta still excludes).
    # bloom_cols (the manifest's column-bloom list) keeps equality
    # skipping alive on fresh deltas, not just compacted bases
    write_zonemap(
        os.path.dirname(path), zonemap_from_pandas(full, bloom_cols=bloom_cols)
    )
    return len(full)
