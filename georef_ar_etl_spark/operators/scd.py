"""Slowly-Changing-Dimension Type 2 history from a change stream.

The warehouse-native consumer of a CDC feed: instead of applying upserts
destructively (the engine's snapshot table, ``engine.py``), SCD2 KEEPS
every version — each key's payload history becomes validity intervals
``[valid_from, valid_to)`` with ``is_current`` on the open one — so
downstream joins can ask "what was this dimension worth at sequence S?"
(pair it with ``temporal.asof_join`` for the point-in-time lookup).

Plan shape at 10^10 events: ONE shuffle, period. Both windows (the
change-point ``lag`` and the interval-closing ``lead``) partition by the
key and order by the sequence, and the change-point FILTER between them
preserves both the hash partitioning and the sort, so Catalyst plans a
single Exchange + Sort feeding two Window operators back-to-back —
``tests/test_plan_shapes.py::test_scd2_single_exchange`` pins that.
Per-key state is bounded by that key's version count (no group
materializes more than its own rows), and skew follows the CDC feed's
key skew — pre-salt ONLY if one key dominates, which for dimension
history (the SCD use case) it does not.

Semantics (matching the classic Kimball Type 2 + CDC conventions):

* input rows are (key, seq, op, payload...) with op ∈ {'u','d'} — 'u' is
  an upsert carrying the full payload, 'd' a delete (payload ignored);
* consecutive no-change upserts COLLAPSE: an upsert whose payload equals
  the key's previous effective state opens no version (CDC feeds love
  re-emitting unchanged rows; without collapsing, history size is O(feed)
  instead of O(true changes)) — comparison is null-safe per column;
* a delete closes the open version and emits nothing; repeated deletes
  collapse; a re-insert after a delete opens a fresh version;
* output: one row per version — key, payload columns, ``valid_from``
  (the opening seq), ``valid_to`` (the seq of the NEXT change-point:
  half-open intervals, so versions tile the sequence axis with no gaps
  or overlaps), ``is_current`` (open interval, i.e. live at head).

Reference analogue: none — georef-ar-etl drops and reloads each entity
table per run (georef_ar_etl/loaders.py), discarding history; this is
the history-preserving twin the north rule's changelog enables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Build the Type 2 history table from ``changes``. ``seq_col`` must
    be unique per key (the CDC total order — the engine's (batch_id, seq)
    collapses to one long); duplicate (key, seq) pairs are a malformed
    feed and yield nondeterministic lag/lead, so fix the feed, not this.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in changes.columns if c not in (key_col, seq_col, op_col)
        ]
    w = Window.partitionBy(key_col).orderBy(seq_col)

    up = F.col(op_col) == "u"
    # effective payload: NULL-masked for deletes, so a delete compares
    # equal to a delete regardless of junk in its payload columns
    eff = [F.when(up, F.col(c)).alias(f"_e_{c}") for c in payload_cols]
    m = changes.select(key_col, seq_col, op_col, *eff)

    same_as_prev = F.col(op_col).eqNullSafe(F.lag(op_col).over(w))
    for c in payload_cols:
        same_as_prev = same_as_prev & F.col(f"_e_{c}").eqNullSafe(
            F.lag(f"_e_{c}").over(w)
        )
    is_first = F.row_number().over(w) == 1
    cp = m.withColumn(
        "_keep", is_first | ~same_as_prev
    ).filter("_keep")

    # same partitioning AND sort as w — no second exchange (plan-tested)
    out = cp.select(
        F.col(key_col),
        *[F.col(f"_e_{c}").alias(c) for c in payload_cols],
        F.col(seq_col).alias("valid_from"),
        F.lead(seq_col).over(w).alias("valid_to"),
        F.col(op_col).alias("_op"),
    )
    return out.filter(F.col("_op") == "u").select(
        key_col,
        *payload_cols,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    time_col: str,
    payload_cols: list[str],
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time dimension lookup — THE consumer of an SCD2 history:
    attach to every fact row the dimension version live at the fact's
    sequence/time, or nulls when the key had no live version there (before
    its first insert, or inside a deletion gap — ``scd2_history`` emits no
    row for deleted intervals, so liveness needs the explicit
    ``valid_to`` check below, not just "latest version at or before t").

    Semantics: version [valid_from, valid_to) is live at t iff
    valid_from <= t AND (valid_to IS NULL OR t < valid_to) — half-open,
    matching ``scd2_history``'s interval contract; versions are disjoint
    per key so at most one matches.

    Plan shape: NOT an interval join (which Spark would plan as a theta
    join — a per-key cross product). Versions are disjoint and tile the
    axis, so the live version is exactly the as-of (backward) match on
    ``valid_from`` filtered by its own ``valid_to`` — ONE shuffle via
    ``temporal.asof_join``'s union+window formulation, O((facts +
    versions) log) per key, no pair explosion at any fact:version ratio.
    """
    from georef_ar_etl_spark.operators.temporal import asof_join

    carried = list(dict.fromkeys([*payload_cols, "valid_to"]))
    j = asof_join(
        facts,
        history,
        key_col,
        key_col,
        time_col,
        "valid_from",
        right_cols=carried,
        prefix="_scd_",
    )
    live = F.col("_scd_valid_to").isNull() | (
        F.col(time_col) < F.col("_scd_valid_to")
    )
    return j.select(
        *facts.columns,
        *[
            F.when(live, F.col(f"_scd_{c}")).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )


def golden_record(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Per-COLUMN survivorship (the MDM/golden-record consolidation rule
    "most recent non-null wins, per attribute"): one output row per key
    where each value column independently carries its latest non-null
    observation by the ``order_cols`` tuple — unlike whole-row LWW
    (operators/dedup_events.py), where one stale-but-newer row nulls out
    attributes an older row knew.

    ``order_cols`` must form a TOTAL order (include a unique tiebreaker —
    e.g. ``["ts", "event_id"]`` — or ties pick an arbitrary winner). Per
    attribute the aggregate is ``max(struct(*order, value))`` gated on the
    value being non-null — struct comparison is lexicographic and a fully
    null WHEN branch is ignored by max, giving exact latest-non-null
    semantics as ONE map-side-combinable aggregate: one shuffle carrying
    one partial row per (key, map task), no window, no self-join — the
    shape that survives a 10^10-row event log with hot keys (partials
    combine before the exchange).

    Reference parity: the reference consolidates entity attributes from
    per-field census updates where later files override only the fields
    they carry (georef_ar_etl/transformers.py:96-139 field-wise update
    loop); this is that rule as one distributed aggregate.
    """
    order = [F.col(o) for o in order_cols]
    aggs = [
        F.max(
            F.when(
                F.col(c).isNotNull(), F.struct(*order, F.col(c).alias("__v"))
            )
        )["__v"].alias(c)
        for c in value_cols
    ]
    return df.groupBy(*key_cols).agg(*aggs)
