"""Temporal joins Spark lacks as built-ins, expressed Spark-first.

``asof_join`` — for every left row, the latest right row at or before the
left timestamp per key (pandas ``merge_asof`` semantics, the kdb ``aj``).
The naive formulations both fail at scale: a range-join
(``l.t >= r.t``) explodes to O(left × right-history) before taking the
max, and a per-key collect serializes. This is the sort-merge
formulation instead: UNION both sides, ONE shuffle+sort per key, and a
``last(payload, ignorenulls)`` running window carries the most recent
right payload forward onto each left probe — O((L+R) log(L+R)) work, no
pair explosion, no Python on the data path. Skewed keys are plain window
skew, handled by AQE like any hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tie_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join (backward, inclusive): attach to every left row the
    right row with the greatest ``right_time`` <= ``left_time`` for the
    same key, or nulls when no such row exists.

    Ordering contract: right rows AT the probe timestamp match (inclusive
    <=); among right rows sharing (key, time), the one with the greatest
    ``tie_col`` wins — pass the event sequence column for deterministic
    results, or leave None when (key, time) is unique.

    Output: every left column plus ``<prefix><col>`` for ``right_cols``.
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("_tie"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(
            r.schema["_payload"].dataType
        ).alias("_payload"),
        *left.columns,
    )
    # sort: time asc, then right rows BEFORE left probes at equal time
    # (inclusive semantics), right ties ascending so last() = max tie
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").desc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 0).select(
        *left.columns,
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
