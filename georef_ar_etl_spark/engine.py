"""CdcEngine — the end-to-end change-apply pipeline.

Per micro-batch (reference pipeline analogue: ingest → validate → per-row
process → diff-upsert → report, georef_ar_etl/transformers.py:67-151):

1. schema-contract check (+ additive evolution)   utils.py:62-91 analogue
2. validate → quarantine side-output              transformers.py:96-101
3. vectorized token normalization (Arrow)         utils.py:190-195 analogue
4. in-batch dedup, last-writer-wins by seq        transformers.py:89-94 (relaxed)
5. bucket-pruned full-outer MERGE                 transformers.py:103-136
6. atomic manifest commit + lineage metrics       process.py:250-257, Report

Everything between read and write is one declarative DataFrame plan —
Catalyst handles pushdown/pruning; AQE handles partition skew. The only
Python on the data path is the Arrow-batched normalization UDF.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.functions.tokens import with_normalized_tokens
from georef_ar_etl_spark.operators.dedup_events import latest_per_key
from georef_ar_etl_spark.operators.merge import align_columns, merge_upsert
from georef_ar_etl_spark.operators.validate import (
    quarantine_empty_after_norm,
    split_quarantine,
    tag_invalid,
)
from georef_ar_etl_spark.schemas import (
    EVENT_META_COLS,
    STATE_SCHEMA,
    SchemaContractError,
    evolved_state_schema,
    validate_contract,
)
from georef_ar_etl_spark.sinks.snapshot_table import (
    ConflictError,
    SnapshotTable,
    bucket_expr,
)


def content_digest(df: DataFrame) -> str:
    """Order-insensitive content hash: bit_xor of per-row xxhash64 over all
    columns (rows are unique by seq, so xor cancellation can't occur).
    Reference analogue: MD5 of every downloaded input
    (georef_ar_etl/extractors.py:30-39)."""
    cols = [F.col(c) for c in sorted(df.columns)]
    row = df.select(F.xxhash64(*cols).alias("h"), F.lit(1).alias("one"))
    agg = row.agg(F.expr("bit_xor(h)").alias("x"), F.count("one").alias("n")).collect()[0]
    return f"{agg['x']}:{agg['n']}"


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table_root: str,
        n_buckets: int = 32,
        dim: DataFrame | None = None,
        strict_dup: bool = False,
        normalize_impl: str = "pandas",
    ):
        self.spark = spark
        self.table = SnapshotTable(spark, table_root, n_buckets)
        self.dim = dim
        self.strict_dup = strict_dup
        self.normalize_impl = normalize_impl

    # ------------------------------------------------------------- bootstrap
    def bootstrap(self, initial: DataFrame) -> dict:
        """Epoch 0: load the initial snapshot (already-normalized state)."""
        if self.table.latest_manifest() is not None:
            return self.table.latest_manifest()
        digest = "bootstrap:" + content_digest(initial)
        df = align_columns(initial, STATE_SCHEMA).withColumn(
            "bucket", bucket_expr(F.col("doc_id"), self.table.n_buckets)
        )
        t0 = time.time()
        return self.table.commit(
            epoch=0,
            schema=STATE_SCHEMA,
            new_buckets_df=df,
            touched_buckets=list(range(self.table.n_buckets)),
            batch_id=None,
            batch_digest=digest,
            metrics={"kind": "bootstrap", "wall_sec": time.time() - t0},
        )

    # ------------------------------------------------------------------ state
    def state(self) -> DataFrame:
        return self.table.read_state().drop("bucket")

    # ------------------------------------------------------------ apply batch
    def apply_batch(self, events: DataFrame, batch_id: int) -> dict:
        t0 = time.time()
        latest = self.table.latest_manifest()
        if latest is None:
            raise RuntimeError("bootstrap() the table before applying batches")

        # idempotent re-apply: a committed batch_id is a verified no-op
        digest = content_digest(events)
        committed = self.table.committed_batches()
        if batch_id in committed:
            if committed[batch_id]["batch_digest"] != digest:
                raise ConflictError(
                    f"batch {batch_id} re-delivered with different content"
                )
            return committed[batch_id]

        # 1. schema contract + additive evolution
        state_schema = T.StructType.fromJson(latest["schema"])
        contract = validate_contract(events.schema, STATE_SCHEMA)
        if not contract.ok:
            raise SchemaContractError("; ".join(contract.errors))
        new_schema = evolved_state_schema(state_schema, events.schema)
        payload_cols = [f.name for f in new_schema.fields]

        # make older-shape batches mergeable after evolution (missing → null)
        events = align_columns(events, T.StructType(
            [f for f in new_schema.fields if f.name not in EVENT_META_COLS]
        ).add("batch_id", "long").add("seq", "long").add("op", "string"))

        # 2-3. validate → quarantine; normalize (Arrow); re-validate
        vb = split_quarantine(tag_invalid(events, self.dim))
        norm = with_normalized_tokens(vb.valid, impl=self.normalize_impl)
        vb2 = quarantine_empty_after_norm(norm)
        norm_valid = vb2.valid.persist()
        quarantine = vb.quarantined.unionByName(vb2.quarantined)

        # 4. in-batch dedup (last-writer-wins by seq; strict = reference mode)
        deduped = latest_per_key(norm_valid, strict=self.strict_dup)

        # 5. bucket pruning: read/merge/rewrite ONLY buckets the batch touches
        nb = self.table.n_buckets
        touched = [
            r["b"]
            for r in deduped.select(
                bucket_expr(F.col("doc_id"), nb).alias("b")
            ).distinct().collect()
        ]
        state_touched = align_columns(
            self.table.read_state(buckets=touched, manifest=latest), new_schema
        )
        merged = merge_upsert(state_touched, deduped, payload_cols)
        merged.tagged.persist()
        action_counts = merged.action_counts()
        new_buckets_df = merged.new_state.withColumn(
            "bucket", bucket_expr(F.col("doc_id"), nb)
        )

        # quarantine reason histogram (lineage)
        q_counts = {
            r["reason"]: r["count"]
            for r in quarantine.groupBy("reason").count().collect()
        }
        events_in = digest.rsplit(":", 1)[1]

        wall = time.time() - t0
        metrics = {
            "kind": "apply",
            "events_in": int(events_in),
            "quarantined": q_counts,
            "actions": action_counts,
            "touched_buckets": len(touched),
            "schema_added_columns": [
                f.name for f in new_schema.fields
                if f.name not in {x.name for x in state_schema.fields}
            ],
            "wall_sec": wall,
            "events_per_sec": int(events_in) / wall if wall > 0 else None,
        }
        epoch = latest["epoch"] + 1
        try:
            manifest = self.table.commit(
                epoch=epoch,
                schema=new_schema,
                new_buckets_df=new_buckets_df,
                touched_buckets=touched,
                batch_id=batch_id,
                batch_digest=digest,
                metrics=metrics,
                quarantine_df=quarantine,
            )
        finally:
            merged.tagged.unpersist()
            norm_valid.unpersist()
        return manifest

    # ---------------------------------------------------------------- replay
    def replay(self, events: DataFrame) -> list[dict]:
        """Apply every batch in ``events`` in batch_id order, skipping batches
        already committed (resume-from-checkpoint)."""
        batch_ids = [
            r["batch_id"]
            for r in events.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        out = []
        for b in batch_ids:
            out.append(self.apply_batch(events.filter(F.col("batch_id") == b), b))
        return out
