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


def time_bucket_s(time_col, seconds: int):
    """Bucket start as epoch seconds (long): timezone-free, exact, and
    identical across engines (string-formatting a timestamp is where
    cross-engine comparisons go to die)."""
    return (F.floor(F.unix_timestamp(time_col) / seconds) * seconds).cast("long")


def rollup(
    df: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """The hypertable continuous-aggregate LEAF: per (time bucket, keys)
    partials — count / sum / min / max (avg derives as sum/count, so it
    re-aggregates; never materialize avg itself). One hash aggregate with
    map-side combine; ``bucket_s`` becomes the storage partition column of
    the rollup table at scale."""
    return df.groupBy(
        time_bucket_s(F.col(time_col), bucket_seconds).alias("bucket_s"),
        *key_cols,
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def rollup_coarser(
    fine: DataFrame, key_cols: list[str], bucket_seconds: int
) -> DataFrame:
    """Re-aggregate a finer rollup into a coarser one — the rollup CHAIN:
    the hour table reads the minute table's partials (counts sum, sums
    sum, mins min, maxs max), NEVER the raw events — which is the entire
    point of materialized rollups at 100 TB: each coarser granularity
    costs O(finer rollup), not O(raw). Requires ``bucket_seconds`` to be a
    multiple of the finer granularity (buckets nest)."""
    return fine.groupBy(
        (F.floor(F.col("bucket_s") / bucket_seconds) * bucket_seconds)
        .cast("long")
        .alias("bucket_s"),
        *key_cols,
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window_seconds: int,
) -> DataFrame:
    """Interval join — right rows with ``left_time <= right_time <
    left_time + window`` per key — WITHOUT the naive theta-join explosion:
    both sides bucketize time into window-sized epochs, the join runs as
    an EQUI join on (key, bucket) over each left row's two candidate
    buckets (an interval of length W overlaps at most 2 W-sized buckets),
    and the exact range predicate refines the bounded candidate set. Join
    fan-out is <= 2 candidate buckets per left row instead of the full
    per-key history — the standard band-join technique Spark's optimizer
    lacks natively. Returns matched (left ⋈ right) rows; aggregate on top.
    """
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1, got {window_seconds}")
    # buckets from SECOND-truncated epochs (sub-second precision is
    # irrelevant for bucketing: an interval of W seconds still spans at
    # most 2 W-sized buckets); the refine predicate below compares the
    # raw timestamps EXACTLY — never epoch seconds, which would silently
    # truncate microseconds
    w = F.lit(window_seconds)
    lb = F.floor(F.unix_timestamp(F.col(left_time)) / w)
    rb = F.floor(F.unix_timestamp(F.col(right_time)) / w)
    l = left.withColumn("_b", F.explode(F.array(lb, lb + 1)))
    r = right.withColumn("_b", rb)
    upper = F.col(f"l.{left_time}") + F.expr(f"INTERVAL {window_seconds} SECONDS")
    cond = (
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & (F.col("l._b") == F.col("r._b"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (F.col(f"r.{right_time}") < upper)
    )
    return (
        l.alias("l")
        .join(r.alias("r"), cond)
        .select(
            *[F.col(f"l.{c}") for c in left.columns],
            *[
                F.col(f"r.{c}").alias(f"r_{c}" if c in left.columns else c)
                for c in right.columns
            ],
        )
    )


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
