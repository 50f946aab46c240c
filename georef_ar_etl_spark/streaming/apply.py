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
batch_id — the natural WAL-segment layout). ACROSS triggers, file
DISCOVERY order is not delivery order — same-mtime ties under
``maxFilesPerTrigger`` and object-store listing inconsistency can surface
segment N+1 a trigger before segment N — so both front-ends route every
trigger through a persistent REORDER BUFFER (``_apply_batches_in_order``):
contiguity is enforced upward, batches ahead of a gap spill to a
generation-versioned parquet dir under the checkpoint and retry on every
subsequent trigger until the gap fills. Crash-safe by layering: the spill
generation is written before old ones are deleted, and a re-applied
batch is a verified no-op, so any crash interleaving at worst re-verifies.
A gap that never fills fails LOUDLY after ``max_stall_triggers`` (a
silently-buffering tail that never advances is an outage, not a wait).
"""

from __future__ import annotations

import json
import os
import shutil

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


def _read_pending(spark: SparkSession, pending_dir: str):
    """Newest COMPLETE spill generation (marker present) → (df, gen, meta).
    Older/torn generations are ignored here and swept after the next write."""
    if not os.path.isdir(pending_dir):
        return None, 0, {}
    gens = sorted(
        int(n.split("-")[1])
        for n in os.listdir(pending_dir)
        if n.startswith("gen-")
        and os.path.exists(os.path.join(pending_dir, n, "_META.json"))
    )
    if not gens:
        return None, 0, {}
    g = gens[-1]
    gdir = os.path.join(pending_dir, f"gen-{g}")
    with open(os.path.join(gdir, "_META.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(gdir), g, meta


def _apply_batches_in_order(
    spark: SparkSession,
    engine: CdcEngine,
    df: DataFrame,
    id_col: str,
    pending_dir: str,
    apply_fn,
    max_stall_triggers: int = 1000,
) -> None:
    """Apply one trigger's logical change batches in ``id_col`` order with a
    persistent reorder buffer (see the module doc). ``apply_fn(sub_df, b)``
    does the per-batch work. Batches at or below the committed watermark
    pass straight to the engine (idempotent redelivery verification / the
    out-of-order refusal, both unchanged); the batch extending the
    watermark and every contiguous successor apply; batches AHEAD of a gap
    spill and retry next trigger.

    Crash-safety layering: spill gen N+1 is fully written (files, then the
    _META.json marker) BEFORE gens ≤ N are deleted, and before Spark's
    checkpoint advances; a batch present in both a redelivered trigger file
    and an old spill is taken from the trigger file (anti-join), so no
    interleaving duplicates rows into a digest."""
    pend, gen, meta = _read_pending(spark, pending_dir)
    combined = df
    if pend is not None:
        # the redelivered trigger file wins over a stale spill of the same
        # batch — unioning both would double the rows inside one digest
        pend = pend.join(
            df.select(id_col).distinct(), on=id_col, how="left_anti"
        )
        combined = df.unionByName(pend, allowMissingColumns=True)
    committed = engine.table.committed_batches()
    hi = max(committed) if committed else -1
    ids = [
        r[id_col]
        for r in combined.select(id_col).distinct().orderBy(id_col).collect()
    ]
    nxt = hi + 1
    if hi < 0:
        non_null = [int(b) for b in ids if b is not None]
        if non_null:
            # no committed anchor yet: the stream's first VISIBLE id starts
            # the sequence (WAL batch ids need not be 0-based). If the true
            # first segment is still in flight when a later one surfaces
            # alone in the first trigger, that ambiguity is unresolvable
            # without producer metadata — the engine's replay-order guard
            # then fails loudly rather than reorder silently.
            nxt = min(non_null)
    deferred: list[int] = []
    for b in ids:
        if b is None or int(b) <= hi:
            apply_fn(combined.filter(F.col(id_col) == b), b)
        elif int(b) == nxt:
            apply_fn(combined.filter(F.col(id_col) == b), int(b))
            nxt = int(b) + 1
        else:
            deferred.append(int(b))
    if deferred:
        stall = (
            meta.get("stall", 0) + 1 if meta.get("waiting_for") == nxt else 0
        )
        if stall >= max_stall_triggers:
            raise RuntimeError(
                f"reorder buffer stalled: batches {deferred} have waited "
                f"{stall} triggers for batch {nxt}, which never arrived — "
                f"the WAL segment is lost or the producer skipped an id; "
                f"re-ship it, or apply_batch(..., allow_out_of_order=True) "
                f"deliberately and clear {pending_dir}"
            )
        new_gen = os.path.join(pending_dir, f"gen-{gen + 1}")
        combined.filter(F.col(id_col).isin(deferred)).write.mode(
            "overwrite"
        ).parquet(new_gen)
        with open(os.path.join(new_gen, "_META.json"), "w") as f:
            json.dump(
                {"deferred": deferred, "waiting_for": nxt, "stall": stall}, f
            )
    # sweep superseded generations (and everything, once nothing is deferred)
    if os.path.isdir(pending_dir):
        for n in os.listdir(pending_dir):
            if n.startswith("gen-") and int(n.split("-")[1]) <= gen:
                shutil.rmtree(os.path.join(pending_dir, n), ignore_errors=True)


def stream_apply(
    spark: SparkSession,
    engine: CdcEngine,
    events_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    consumers=(),
    max_stall_triggers: int = 1000,
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

    pending_dir = os.path.join(checkpoint_dir, "reorder-pending")

    def handle(df: DataFrame, _epoch_id: int) -> None:
        _apply_batches_in_order(
            spark, engine, df, "batch_id", pending_dir,
            lambda sub, b: engine.apply_batch(sub, b),
            max_stall_triggers=max_stall_triggers,
        )
        _refresh_consumers(engine, consumers)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_apply_envelopes(
    spark: SparkSession,
    engine: CdcEngine,
    wire_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    consumers=(),
    malformed_dir: str | None = None,
    extra_cols=None,
    max_stall_triggers: int = 1000,
):
    """``stream_apply`` for a Debezium-envelope NDJSON wire directory —
    the streaming twin of ``sources.cdc_envelope.parse_debezium``: tail
    ``wire_dir``, decode each segment, apply it, keep consumers fresh.

    Segment naming contract: one logical change batch per file, the
    batch_id as the file name's LAST integer run before the extension
    (``epoch-7.ndjson`` → 7) — the layout ``to_debezium`` exports and any
    per-transaction/per-epoch WAL shipper naturally produces. Splitting
    one batch across trigger boundaries would break replay order, same
    rule as stream_apply.

    Malformed lines land in ``malformed_dir`` as parquet (raw + reason +
    batch_id, appended per trigger) instead of failing the stream — the
    dead-letter discipline; with no dir configured they still fail loudly
    (a silently-dropping wire tail is how replicas diverge).

    Exactly-once layering is unchanged: streaming checkpoints give
    at-least-once file delivery, the engine's content digest turns
    re-decoded redeliveries into verified no-ops.

    Schema-change envelopes (Debezium schema-history lines carrying
    ``tableChanges``) are consumed, not quarantined: an ADD COLUMN widens
    the decode schema for that batch and every later one, and the engine's
    additive evolution widens the table on the next data batch — without
    this a new upstream column would decode as NULL forever. Restart-safe
    WITHOUT a side ledger: at stream start the decode schema is seeded from
    the engine's manifest-authoritative table schema (any payload column
    beyond the base contract was once discovered or configured). Type
    changes on known columns raise; drops are tolerated (the column stays,
    later envelopes carry NULLs — history is never rewritten).
    """
    from georef_ar_etl_spark.schemas import STATE_SCHEMA
    from georef_ar_etl_spark.sources.cdc_envelope import (
        columns_from_schema_changes,
        parse_debezium,
        schema_change_filter,
    )

    _refresh_consumers(engine, consumers)

    base_types = {f.name: f.dataType for f in STATE_SCHEMA.fields}
    known: dict = dict(extra_cols or {})
    m = engine.table.latest_manifest()
    if m is not None:
        from pyspark.sql import types as T

        for f in T.StructType.fromJson(m["schema"]).fields:
            if f.name not in base_types:
                known.setdefault(f.name, f.dataType)

    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(wire_dir).select(
        F.col("value"),
        F.regexp_extract(F.input_file_name(), r"(\d+)\.[A-Za-z]+$", 1)
        .cast("long")
        .alias("_wire_batch"),
    )

    pending_dir = os.path.join(checkpoint_dir, "reorder-pending")

    def handle(df: DataFrame, _epoch_id: int) -> None:
        _apply_batches_in_order(
            spark, engine, df, "_wire_batch", pending_dir,
            apply_segment, max_stall_triggers=max_stall_triggers,
        )
        _refresh_consumers(engine, consumers)

    def apply_segment(seg: DataFrame, b) -> None:
        if b is None:
            raise ValueError(
                f"wire file in {wire_dir} has no trailing integer batch id "
                f"in its name — the segment naming contract requires one"
            )
        ddl_lines = [
            r["value"]
            for r in seg.filter(schema_change_filter()).select("value").collect()
        ]
        if ddl_lines:
            full = columns_from_schema_changes(ddl_lines)
            for name, typ in full.items():
                have = base_types.get(name) or known.get(name)
                # simpleString: compare value shape, not containsNull /
                # nullable flags (the wire can't express those anyway)
                if have is not None and have.simpleString() != typ.simpleString():
                    raise ValueError(
                        f"wire schema change re-types column {name!r} "
                        f"from {have} to {typ} — not additive; widen "
                        f"deliberately via the engine's schema path"
                    )
                if name not in base_types:
                    known[name] = typ
        # coalesce: NOT NULL is NULL — a null/garbled value must stay on
        # the data path (where it quarantines), not vanish in the filter
        raw = seg.filter(
            ~F.coalesce(schema_change_filter(), F.lit(False))
        ).select("value")
        if ddl_lines and raw.isEmpty():
            # pure-DDL segment (a migration with no data): nothing to
            # apply — the widened decode schema is the whole effect
            return
        events, malformed = parse_debezium(
            raw, batch_id=int(b), extra_cols=known
        )
        if malformed_dir is not None:
            malformed.withColumn(
                "batch_id", F.lit(int(b)).cast("long")
            ).write.mode("append").parquet(malformed_dir)
        else:
            n_bad = malformed.count()
            if n_bad:
                raise ValueError(
                    f"{n_bad} malformed wire lines in batch {b} and no "
                    f"malformed_dir configured — refusing to drop them"
                )
        engine.apply_batch(events, int(b))

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
