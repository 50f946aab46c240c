"""Iceberg-style snapshot table: bucketed parquet + atomic epoch manifests.

Layout::

    <root>/data/epoch=K/bucket=B/part-*.parquet   # only buckets touched at K
    <root>/quarantine/epoch=K/*.parquet           # invalid-event side-output
    <root>/manifests/epoch-000000042.json         # THE commit point
    <root>/metrics.jsonl                          # per-commit lineage/metrics

Commit protocol (exactly-once without a transactional catalog):

1. data files for the touched buckets are written under a fresh
   ``epoch=K`` directory (a crashed attempt leaves an orphan dir that the
   next attempt overwrites — harmless, unreferenced);
2. the manifest (schema, per-bucket file dirs, counts, lineage, the input
   batch digest) is written to a temp file, fsync'd, and ``os.replace``'d
   into place — the atomic rename IS the commit, the reference analogue of
   the single ``session.commit()`` per process
   (georef_ar_etl/process.py:250-257);
3. untouched buckets are carried over by reference to the parent epoch's
   directories — copy-on-write at bucket granularity, which is exactly the
   Iceberg COW model at file granularity.

Idempotency / resume: a batch whose ``batch_id`` already appears in a
committed manifest is skipped (re-applying a committed epoch is a no-op);
the latest committed manifest *is* the checkpoint, so a killed run resumes
by replaying from the first uncommitted batch (reference analogue:
skip-existing downloads, extractors.py:14-16, and --start/--end re-entry,
process.py:206-249).

Scale posture: rows are hash-bucketed by ``pmod(xxhash64(doc_id), n_buckets)``
— this randomizes the reference's natural prefix skew (Buenos Aires ≫ Tierra
del Fuego) across buckets, and lets a prefix- or source-skewed change batch
touch (and rewrite) only a subset of buckets. On a real cluster the same
layout is declared as an Iceberg ``bucket(doc_id, N)`` partition spec and the
merge becomes a storage-partitioned join (no state-side shuffle).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_DIR = "manifests"
DATA_DIR = "data"
QUARANTINE_DIR = "quarantine"
METRICS_LOG = "metrics.jsonl"


def bucket_expr(key_col, n_buckets: int):
    """The table's bucketing function — MUST be identical everywhere
    (writer, merge planner, pruning)."""
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")


class ConflictError(RuntimeError):
    """Same epoch committed with a different input digest."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self._manifest_cache: dict[str, dict] = {}
        os.makedirs(os.path.join(self.root, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(self.root, DATA_DIR), exist_ok=True)

    # ------------------------------------------------------------- manifests
    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, MANIFEST_DIR, f"epoch-{epoch:010d}.json")

    def manifests(self) -> list[dict]:
        """All committed manifests, oldest first. Parsed manifests are cached
        by filename — commit history is immutable, so a per-batch re-read is
        pure overhead (it showed up in replay profiles as O(epochs²) IO)."""
        mdir = os.path.join(self.root, MANIFEST_DIR)
        out = []
        for name in sorted(os.listdir(mdir)):
            if name.startswith("epoch-") and name.endswith(".json"):
                m = self._manifest_cache.get(name)
                if m is None:
                    with open(os.path.join(mdir, name)) as f:
                        m = json.load(f)
                    self._manifest_cache[name] = m
                out.append(m)
        return out

    def latest_manifest(self) -> dict | None:
        ms = self.manifests()
        return ms[-1] if ms else None

    def committed_batches(self) -> dict[int, dict]:
        """batch_id → manifest, for idempotent re-apply detection."""
        return {m["batch_id"]: m for m in self.manifests() if m["batch_id"] is not None}

    def schema(self) -> T.StructType | None:
        m = self.latest_manifest()
        return T.StructType.fromJson(m["schema"]) if m else None

    # ------------------------------------------------------------------ read
    def read_state(
        self, buckets: list[int] | None = None, manifest: dict | None = None
    ) -> DataFrame:
        """Current state as a DataFrame (payload columns + ``bucket``).

        ``buckets`` prunes the read to the listed buckets — partition pruning
        on the change batch's key range, the Spark form of the reference's
        source-side CQL_FILTER pruning (georef_ar_etl/streets.py:24-31).
        """
        m = manifest or self.latest_manifest()
        schema = T.StructType.fromJson(m["schema"])
        dirs = []
        for b_str, d in m["buckets"].items():
            if d is None:
                continue
            if buckets is None or int(b_str) in set(buckets):
                dirs.append(os.path.join(self.root, d))
        if not dirs:
            empty = self.spark.createDataFrame([], schema)
            return empty.withColumn("bucket", F.lit(None).cast("int"))
        df = (
            self.spark.read.option("basePath", os.path.join(self.root, DATA_DIR))
            .schema(schema.add("epoch", T.IntegerType()).add("bucket", T.IntegerType()))
            .parquet(*dirs)
            .drop("epoch")
        )
        return df

    def bucket_file_paths(
        self, buckets: list[int], manifest: dict | None = None
    ) -> dict[int, list[str]]:
        """bucket → absolute parquet file paths (for the copartitioned merge)."""
        m = manifest or self.latest_manifest()
        out: dict[int, list[str]] = {}
        for b in buckets:
            d = m["buckets"].get(str(b))
            if d is None:
                out[b] = []
                continue
            full = os.path.join(self.root, d)
            out[b] = sorted(
                os.path.join(full, n) for n in os.listdir(full) if n.endswith(".parquet")
            )
        return out

    def epoch_dir(self, epoch: int) -> str:
        d = os.path.join(self.root, DATA_DIR, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        return d

    # ----------------------------------------------------------------- write
    def _write_buckets(self, df: DataFrame, epoch: int) -> dict[int, str]:
        """Write (payload + bucket) rows under data/epoch=K, one directory per
        bucket, deterministically sorted by doc_id within files."""
        epoch_dir = os.path.join(self.root, DATA_DIR, f"epoch={epoch}")
        (
            df.repartition(self.n_buckets, F.col("bucket"))
            .sortWithinPartitions("bucket", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(epoch_dir)
        )
        out: dict[int, str] = {}
        if os.path.isdir(epoch_dir):
            for name in os.listdir(epoch_dir):
                if name.startswith("bucket="):
                    b = int(name.split("=", 1)[1])
                    out[b] = os.path.join(DATA_DIR, f"epoch={epoch}", name)
        return out

    def write_quarantine(self, df: DataFrame, epoch: int) -> str | None:
        qdir = os.path.join(self.root, QUARANTINE_DIR, f"epoch={epoch}")
        df.write.mode("overwrite").parquet(qdir)
        return os.path.join(QUARANTINE_DIR, f"epoch={epoch}")

    def _bucket_counts(self, dirs: dict[int, str]) -> dict[int, int]:
        import pyarrow.parquet as pq

        counts: dict[int, int] = {}
        for b, rel in dirs.items():
            total = 0
            full = os.path.join(self.root, rel)
            for name in os.listdir(full):
                if name.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(full, name)).metadata.num_rows
            counts[b] = total
        return counts

    # ---------------------------------------------------------------- commit
    def write_data(self, epoch: int, new_buckets_df: DataFrame | None) -> dict[int, str]:
        """Write the epoch's touched-bucket data files (NOT yet committed —
        an orphan epoch dir without a manifest is invisible and harmless)."""
        if new_buckets_df is None:
            return {}
        return self._write_buckets(new_buckets_df, epoch)

    def write_manifest(
        self,
        epoch: int,
        schema: T.StructType,
        written: dict[int, str],
        touched_buckets: list[int],
        batch_id: int | None,
        batch_digest: str | None,
        metrics: dict,
        quarantine_path: str | None = None,
        quarantine_rows: int = 0,
        written_counts: dict[int, int] | None = None,
    ) -> dict:
        """Atomically publish the manifest — THE commit point. Idempotent:
        same epoch + same digest returns the existing manifest.

        ``written_counts``: per-bucket row counts if the writer already knows
        them (the copartitioned merge returns them from the tasks); otherwise
        they are read from the parquet footers."""
        path = self._manifest_path(epoch)
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing.get("batch_digest") == batch_digest:
                return existing  # already committed — no-op re-apply
            raise ConflictError(
                f"epoch {epoch} already committed with a different digest"
            )

        parent = self.latest_manifest()
        buckets: dict[str, str | None] = (
            dict(parent["buckets"]) if parent else {str(b): None for b in range(self.n_buckets)}
        )
        bucket_counts: dict[str, int] = (
            dict(parent["bucket_counts"]) if parent else {str(b): 0 for b in range(self.n_buckets)}
        )
        new_counts = written_counts if written_counts is not None else self._bucket_counts(written)
        for b in touched_buckets:
            buckets[str(b)] = written.get(b)  # None → bucket emptied out
            bucket_counts[str(b)] = new_counts.get(b, 0)

        manifest = {
            "epoch": epoch,
            "parent": parent["epoch"] if parent else None,
            "batch_id": batch_id,
            "batch_digest": batch_digest,
            "schema": schema.jsonValue(),
            "n_buckets": self.n_buckets,
            "buckets": buckets,
            "bucket_counts": bucket_counts,
            "total_rows": sum(bucket_counts.values()),
            "touched_buckets": sorted(touched_buckets),
            "quarantine_path": quarantine_path if quarantine_rows else None,
            "quarantine_rows": quarantine_rows,
            "metrics": metrics,
            "committed_unix": time.time(),
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # ← the commit point
        self._manifest_cache[os.path.basename(path)] = manifest

        with open(os.path.join(self.root, METRICS_LOG), "a") as f:
            f.write(
                json.dumps(
                    {
                        "epoch": epoch,
                        "batch_id": batch_id,
                        "total_rows": manifest["total_rows"],
                        "quarantine_rows": quarantine_rows,
                        **metrics,
                    },
                    sort_keys=True,
                )
                + "\n"
            )
        return manifest

    def commit(
        self,
        epoch: int,
        schema: T.StructType,
        new_buckets_df: DataFrame | None,
        touched_buckets: list[int],
        batch_id: int | None,
        batch_digest: str | None,
        metrics: dict,
        quarantine_path: str | None = None,
        quarantine_rows: int = 0,
    ) -> dict:
        """Convenience: write data then atomically publish the manifest."""
        path = self._manifest_path(epoch)
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing.get("batch_digest") == batch_digest:
                return existing
            raise ConflictError(
                f"epoch {epoch} already committed with a different digest"
            )
        written = self.write_data(epoch, new_buckets_df)
        return self.write_manifest(
            epoch, schema, written, touched_buckets, batch_id, batch_digest,
            metrics, quarantine_path, quarantine_rows,
        )
