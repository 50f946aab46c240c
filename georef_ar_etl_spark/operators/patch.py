"""Patch operators: predicate-scoped mutations expressed as change events.

The reference patches staging tables in place before the diff
(georef_ar_etl/patch.py): ``update_field`` (equality-filtered UPDATE),
``apply_fn`` (filtered per-row function, supports LIKE predicates) and
``delete`` (filtered DELETE returning the count). In a CDC engine, in-place
mutation of committed state is an anti-pattern — a patch IS a change batch.
These helpers compile a predicate + assignment into update/delete events
against the current state, which then flow through the normal apply pipeline
(validation, lineage, exactly-once manifest) like any other batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seq(offset: int) -> Column:
    """seq = the patch-part index, constant across the part.

    Last-writer-wins only needs seq to be a total order BETWEEN parts that
    touch the same key: within one part a doc_id appears at most once (each
    part filters the unique-keyed state with one predicate), so equal seqs
    never share a key and both dedup paths (max(seq)+semi-join and the
    in-task drop_duplicates(keep="last")) keep exactly one winner. A prior
    version mixed monotonically_increasing_id() with ``offset << 40``, which
    collides: mid encodes the partition id at bit 33, so partition 128 of
    part 0 equals bit 40 of part 1 and the part order silently broke."""
    return F.lit(offset + 1).cast("long")


def patch_update(
    state: DataFrame,
    predicate: Column,
    assignments: dict[str, Column],
    batch_id: int,
    source: str = "patch",
    seq_offset: int = 0,
    stamp_source: bool = False,
) -> DataFrame:
    """Update events for all state rows matching ``predicate``, with the
    given column assignments applied (reference: update_field, patch.py:1-15,
    and apply_fn, patch.py:18-44 — an arbitrary Column expression covers the
    per-row-function case, e.g. ``F.col('id').startswith('94014')`` for the
    reference's LIKE patches).

    Reference-equivalent by default: ONLY the assigned columns change (the
    reference's update_field mutates just the named field, so patched rows
    keep their original ``source`` provenance). Pass ``stamp_source=True``
    to additionally stamp the patch ``source`` on every patched row for
    lineage (matching patch_delete's tombstones); an explicit ``source``
    key in ``assignments`` always wins either way."""
    updated = state.filter(predicate)
    if stamp_source:
        assignments = {"source": F.lit(source), **assignments}
    for name, expr in assignments.items():
        updated = updated.withColumn(name, expr)
    return updated.select(
        F.lit(batch_id).cast("long").alias("batch_id"),
        _seq(seq_offset).alias("seq"),
        F.lit("update").alias("op"),
        *[F.col(c) for c in state.columns],
    )


def patch_delete(
    state: DataFrame,
    predicate: Column,
    batch_id: int,
    source: str = "patch",
    seq_offset: int = 0,
) -> DataFrame:
    """Delete events for all state rows matching ``predicate``
    (reference: delete, patch.py:47-58)."""
    payload_nulls = [
        F.lit(None).cast(dict(state.dtypes)[c]).alias(c)
        for c in state.columns
        if c not in ("doc_id", "source")
    ]
    return state.filter(predicate).select(
        F.lit(batch_id).cast("long").alias("batch_id"),
        _seq(seq_offset).alias("seq"),
        F.lit("delete").alias("op"),
        F.col("doc_id"),
        *payload_nulls,
        F.lit(source).alias("source"),
    )


def apply_patch(
    engine,
    batch_id: int,
    updates: list[tuple[Column, dict[str, Column]]] = (),
    deletes: list[Column] = (),
    source: str = "patch",
    stamp_source: bool = False,
) -> dict:
    """Compile update/delete patches against the engine's current state into
    one change batch and apply it (full exactly-once semantics).

    Note: a patch batch is derived from the state it targets, so re-running
    apply_patch with the same batch_id AFTER it committed raises
    ConflictError (the regenerated batch differs) — patches are one-shot,
    unlike redeliverable WAL batches."""
    state = engine.state()
    parts: list[DataFrame] = []
    for predicate, assignments in updates:
        parts.append(
            patch_update(
                state, predicate, assignments, batch_id, source, len(parts),
                stamp_source=stamp_source,
            )
        )
    for predicate in deletes:
        parts.append(patch_delete(state, predicate, batch_id, source, len(parts)))
    if not parts:
        raise ValueError("no patches given")
    batch = parts[0]
    for p in parts[1:]:
        batch = batch.unionByName(p)
    return engine.apply_batch(batch, batch_id)
