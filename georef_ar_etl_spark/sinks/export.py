"""Export sinks mirroring the reference's publication formats (SURVEY.md §2.1).

* ``export_json`` — single JSON document with an envelope
  ``{cantidad, total, inicio, parametros, <name>: [...]}``
  (reference: CreateJSONFileStep, georef_ar_etl/loaders.py:127-155).
* ``export_ndjson`` — NDJSON whose FIRST line is a metadata header
  ``{fecha_creacion, timestamp, version, cantidad}``
  (reference: CreateNDJSONFileStep, georef_ar_etl/loaders.py:158-182).
* ``export_csv`` — nested struct columns flattened depth≤3 with ``_``-joined
  names, sorted columns, non-numeric quoting
  (reference: flatten_dict + CreateCSVFileStep, georef_ar_etl/loaders.py:233-289).
* ``publish`` — atomic move into the destination (reference: CopyFileStep,
  georef_ar_etl/utils.py:138-170) — the final step of the exactly-once story.

Scale note: these are *publication* sinks for result sets that fit a file
(the reference publishes per-entity datasets of ≤1.1M rows). Rows stream
through ``toLocalIterator`` so the driver never holds the full dataset;
truly large exports use ``df.write.json/csv`` directly.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_struct_columns(df: DataFrame, max_depth: int = 3, sep: str = "_") -> DataFrame:
    """Flatten nested struct columns into ``parent_child`` columns, depth ≤ 3,
    sorted by name (reference: flatten_dict, loaders.py:233-260)."""

    def expand(prefix: str, dtype: T.DataType, depth: int):
        if isinstance(dtype, T.StructType) and depth < max_depth:
            out = []
            for f in dtype.fields:
                out.extend(expand(f"{prefix}.{f.name}", f.dataType, depth + 1))
            return out
        alias = prefix.replace(".", sep)
        return [(prefix, alias)]

    cols = []
    for f in df.schema.fields:
        cols.extend(expand(f.name, f.dataType, 1))
    return df.select(*[F.col(p).alias(a) for p, a in sorted(cols, key=lambda x: x[1])])


def _atomic_text_writer(path: str):
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    return tmp, open(tmp, "w", encoding="utf-8", newline="")


def export_json(
    df: DataFrame,
    path: str,
    name: str = "datos",
    parameters: dict[str, Any] | None = None,
    start: int = 0,
) -> int:
    """Envelope JSON: {cantidad, total, inicio, parametros, <name>: [rows]}."""
    total = df.count()
    tmp, f = _atomic_text_writer(path)
    with f:
        f.write(
            '{"cantidad": %d, "total": %d, "inicio": %d, "parametros": %s, "%s": ['
            % (total, total, start, json.dumps(parameters or {}), name)
        )
        first = True
        for row in df.toJSON().toLocalIterator():
            f.write(("" if first else ",\n") + row)
            first = False
        f.write("]}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return total


def export_ndjson(df: DataFrame, path: str, version: str, created: str) -> int:
    """NDJSON with a first-line metadata header (the reference's format);
    timestamps are caller-provided for determinism."""
    total = df.count()
    tmp, f = _atomic_text_writer(path)
    with f:
        f.write(
            json.dumps(
                {
                    "fecha_creacion": created,
                    "timestamp": created,
                    "version": version,
                    "cantidad": total,
                },
                sort_keys=True,
            )
            + "\n"
        )
        for row in df.toJSON().toLocalIterator():
            f.write(row + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return total


def export_csv(df: DataFrame, path: str) -> int:
    """Flattened CSV, sorted columns, QUOTE_NONNUMERIC (reference parity)."""
    flat = flatten_struct_columns(df)
    numeric = {
        f.name
        for f in flat.schema.fields
        if isinstance(f.dataType, (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.DecimalType))
    }
    cols = flat.columns
    tmp, f = _atomic_text_writer(path)
    n = 0
    with f:
        w = csv.writer(f, quoting=csv.QUOTE_NONNUMERIC)
        w.writerow(cols)
        for row in flat.toLocalIterator():
            w.writerow(
                [row[c] if c in numeric else ("" if row[c] is None else str(row[c])) for c in cols]
            )
            n += 1
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return n


def _observed_count(df: DataFrame):
    """(observed_df, getter): row count observed ON the write pass itself —
    a separate df.count() would recompute the whole plan (and could disagree
    with the shards if the plan is nondeterministic); the manifest must
    describe the bytes actually written. The Observation name is unique per
    call: Observations resolve metrics BY NAME session-wide, so two
    concurrent exports with a shared name could read each other's count."""
    import uuid

    from pyspark.sql import Observation
    from pyspark.sql import functions as _F

    obs = Observation(f"sharded_export-{uuid.uuid4().hex[:12]}")
    return df.observe(obs, _F.count(_F.lit(1)).alias("n")), lambda: int(obs.get["n"])


def _commit_sharded(out_dir: str, write, suffixes: tuple[str, ...], body: dict) -> dict:
    """Shared commit protocol for the distributed sinks: shards are written
    into a FRESH generation dir (``data-<nonce>/``), then ``_manifest.json``
    is atomically flipped to reference it, then superseded generation dirs
    are swept. A re-export never overwrites the live generation in place —
    readers either see the old complete dataset or the new one, and a crash
    mid-write leaves the old manifest + old shards fully intact (the
    half-written new generation is invisible and reclaimed by the next
    successful export). Same old-visible-until-flip model as the snapshot
    table's manifest rename."""
    import shutil
    import uuid

    gen = f"data-{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(out_dir, gen)
    # remember which generation the CURRENT manifest references — that is
    # the only dir this export may sweep after its flip. Sweeping every
    # other data-* dir would delete a CONCURRENT export's half-written
    # generation (concurrent exports are accommodated: Observation names
    # are already per-call unique).
    prev_gen = None
    mpath = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(mpath):
        try:
            with open(mpath, encoding="utf-8") as f:
                prev_gen = json.load(f).get("data_dir")
        except (OSError, json.JSONDecodeError):
            prev_gen = None
    total = write(data_dir)
    shards = sorted(
        os.path.relpath(os.path.join(dp, fn), out_dir)
        for dp, _dns, fns in os.walk(data_dir)
        for fn in fns
        if fn.endswith(suffixes)
    )
    manifest = {**body, "cantidad": total, "data_dir": gen, "shards": shards}
    tmp = mpath + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, mpath)
    # the flip is durable; now sweep ONLY the generation the previous
    # manifest referenced (plus the legacy un-generationed "data" dir) —
    # never other data-* dirs, which may belong to a concurrent export
    # still writing. A crashed export's orphan generation is invisible
    # (no manifest references it) and left for out-of-band cleanup.
    for d in ("data", prev_gen):
        if d and d != gen:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    return manifest


def export_ndjson_sharded(
    df: DataFrame, out_dir: str, version: str, created: str,
    partition_by: str | None = None,
) -> dict:
    """Distributed NDJSON export — the 100 TB path the single-file sinks
    above are NOT: executors write gzip'd JSON shards in parallel
    (``df.write.json``), optionally partitioned by a column (the
    reference's per-province file layout, georef_ar_etl/streets.py:33-41),
    and the driver then publishes a tiny ``_manifest.json`` carrying the
    same metadata header the single-file format puts on line one (shard
    list, row count, version, creation time). Readers treat
    manifest+shards as one logical dataset; see ``_commit_sharded`` for the
    crash/re-export atomicity story."""

    def write(data_dir: str) -> int:
        observed, count = _observed_count(df)
        w = observed.write.option("compression", "gzip")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.json(data_dir)
        return count()

    return _commit_sharded(
        out_dir, write, (".json.gz", ".json"),
        {"fecha_creacion": created, "timestamp": created, "version": version},
    )


def export_csv_sharded(df: DataFrame, out_dir: str) -> dict:
    """Distributed CSV export: struct columns flattened exactly like the
    single-file sink, shards written by executors with headers
    (``df.write.csv``), committed behind the same atomic ``_manifest.json``
    flip as the NDJSON twin — count observed on the write pass, never a
    second plan execution. Returns the manifest."""
    flat = flatten_struct_columns(df)

    def write(data_dir: str) -> int:
        observed, count = _observed_count(flat)
        observed.write.option("header", True).csv(data_dir)
        return count()

    return _commit_sharded(out_dir, write, (".csv",), {"columns": flat.columns})


def publish(src: str, dest_dir: str) -> str:
    """Atomic publish of a finished artifact into the destination directory
    (reference: CopyFileStep). Same-filesystem rename; copy+rename otherwise."""
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, os.path.basename(src))
    tmp = dest + ".publishing"
    import shutil

    shutil.copyfile(src, tmp)
    os.replace(tmp, dest)
    return dest
