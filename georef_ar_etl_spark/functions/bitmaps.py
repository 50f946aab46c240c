"""Fixed-width presence bitmaps — the roaring-bitmap-lite aggregate.

Per-key presence over a small bounded position domain (days of month,
hours of day, experiment arms) packs into ONE long via ``bit_or(1 << pos)``
— a map-side-combinable aggregate whose per-group state is 8 bytes,
versus ``collect_set``'s per-group array. Set algebra then runs on longs:
cardinality = ``bit_count``, intersection = ``&``, union = ``|`` — the
retention/engagement matrix over 10^9 users costs one hash aggregate and
no array materialization anywhere.

Reference analogue: none (the reference has no per-entity activity
summaries); standard warehouse engagement-bitmap pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def presence_bitmap(
    df: DataFrame,
    key_cols: list[str],
    pos: Column,
    width: int = 64,
) -> DataFrame:
    """Aggregate ``df`` to one row per key: ``bitmap`` = OR of
    ``1 << pos`` over the group's rows, ``n_set`` = popcount. ``pos``
    must land in [0, width); out-of-range or NULL positions raise at
    runtime (a silent wrap would corrupt set algebra downstream) —
    pre-filter or mod-reduce in the caller if wrap is intended.
    ``width`` <= 64 (one long)."""
    if not 1 <= width <= 64:
        raise ValueError(f"width must be in [1, 64], got {width}")
    checked = F.when(
        pos.isNull() | (pos < 0) | (pos >= width),
        F.raise_error(
            F.concat(F.lit("presence_bitmap: position out of range: "), pos)
        ).cast("long"),
    ).otherwise(pos.cast("long"))
    # shiftleft() takes a literal shift in the DataFrame API; 2^pos via
    # pow is exact (powers of two are exact doubles through 2^62)
    return (
        df.select(*key_cols, F.pow(F.lit(2.0), checked).cast("long").alias("_b"))
        .groupBy(*key_cols)
        .agg(
            F.bit_or("_b").alias("bitmap"),
            F.bit_count(F.bit_or("_b")).cast("int").alias("n_set"),
        )
    )
