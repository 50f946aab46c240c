"""WAL-tail streaming ingest: readStream over a landing directory →
``foreachBatch`` → CdcEngine.apply_batch.

The reference is a periodic full-reload batch pipeline; this is its
incremental replacement (the point of the north rule). Exactly-once comes
from TWO layers, which makes redelivery safe in every failure interleaving:

1. Spark Structured Streaming checkpointing (which files were read) —
   at-least-once delivery into ``foreachBatch``;
2. the engine's manifest commit (batch_id + content digest) — re-applying an
   already-committed change batch is a verified no-op
   (sinks/snapshot_table.py), turning at-least-once into exactly-once.

Ordering: within one streaming micro-batch, logical change batches are
applied in ``batch_id`` order; the landing producer must not split one
``batch_id`` across files read by different triggers (one file per
batch_id — the natural WAL-segment layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.schemas import EVENT_SCHEMA


def _refresh_consumers(engine: CdcEngine, consumers) -> None:
    head_m = engine.table.latest_manifest()
    if head_m is None:
        return
    head = head_m["epoch"]
    for c in consumers:
        last = c.last_source_epoch
        if last is None:
            # silently skipping would leave the index empty forever while
            # the stream reports success — fail loudly instead
            raise ValueError(
                f"changelog consumer {type(c).__name__} is not bootstrapped "
                f"(last_source_epoch is None) — call bootstrap() before "
                f"attaching it to stream_apply"
            )
        # heal a torn refresh (crash between the consumer's two table
        # commits) by re-running exactly that range first — idempotent
        pending = getattr(c, "pending_refresh_epoch", None)
        if pending is not None:
            c.refresh(engine.changes(last, pending), pending)
            last = c.last_source_epoch
        if last < head:
            c.refresh(engine.changes(last, head), head)


def stream_apply(
    spark: SparkSession,
    engine: CdcEngine,
    events_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    consumers=(),
):
    """Consume event parquet files from ``events_dir`` and apply them.

    ``available_now=True`` drains everything currently in the directory and
    stops (the batch-replay mode); ``False`` runs continuously tailing new
    files (the WAL-tail mode).

    ``consumers``: changelog consumers kept fresh alongside the stream —
    anything with the DerivedValueIndex protocol (``last_source_epoch`` +
    ``refresh(changes_df, to_epoch)``, operators/index_maintenance.py).
    Each trigger applies its change batches, then refreshes every consumer
    over the new epoch range (one multi-epoch changelog read per trigger —
    the latest-change-per-doc collapse makes that equivalent to per-epoch
    refreshes). Consumers also CATCH UP before the stream starts: their
    progress lives in their own index manifests, so a crash after the
    engine's commit but before a refresh — or a previous run that drained
    the directory — is healed on the next call even if no new file ever
    arrives (foreachBatch would then never fire)."""
    _refresh_consumers(engine, consumers)  # heal lag before tailing

    reader = spark.readStream.schema(schema or EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)

    def handle(df: DataFrame, _epoch_id: int) -> None:
        batch_ids = [
            r["batch_id"]
            for r in df.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        for b in batch_ids:
            engine.apply_batch(df.filter(F.col("batch_id") == b), b)
        _refresh_consumers(engine, consumers)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
