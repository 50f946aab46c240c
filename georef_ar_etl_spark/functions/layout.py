"""Task-parallelism vs file-layout decoupling.

A Spark scan's partition count comes from the INPUT LAYOUT (files ×
row-group-aligned byte splits). For IO-bound plans that is correct; for a
COMPUTE-bound stage (per-row UDF, heavy regex/array derivation) it is a
trap: a small or single-row-group file yields one partition and the whole
stage runs on one core of a 1000-core cluster. The classic symptom is a
pandas-UDF pipeline pinned at 1/N CPU because upstream compaction produced
one tidy file.

``spread_for_compute`` restores compute parallelism ONLY when the plan is
under-partitioned: a round-robin repartition up to defaultParallelism,
and a guaranteed NO-OP (no shuffle inserted) when the scan already carries
enough partitions — which is the normal state at production scale, where
inputs arrive in thousands of splits. The shuffle it may insert moves
exactly the bytes the compute stage was going to read anyway — negligible
against per-row compute that is the reason to call this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: defaultParallelism)
    partitions iff it currently has fewer — no-op otherwise. Results are
    row-identical; only task placement changes (callers' semantics must
    be partition-independent, which every operator in this package is)."""
    sc = df.sparkSession.sparkContext
    t = int(target or sc.defaultParallelism)
    # getNumPartitions inspects the planned scan; it launches no job
    if df.rdd.getNumPartitions() >= t:
        return df
    return df.repartition(t)


def zorder_key(cols, bits: int = 16):
    """Z-order (Morton) interleave of ``len(cols)`` NON-NEGATIVE integer
    columns, ``bits`` low bits each, into one long: output bit
    ``i*len(cols)+c`` is bit ``i`` of column ``c``. Clustering a table by
    this key (``cluster_by_zorder``) makes every participating column's
    per-file min/max ranges narrow SIMULTANEOUSLY — the Delta/Iceberg
    OPTIMIZE ZORDER trick — so multi-dimensional predicates prune files
    regardless of which dimension they hit, where a lexicographic sort
    only prunes on its leading column. Caller normalizes values into
    [0, 2^bits): quantile-rank or fixed-grid — the curve only needs
    ORDER preservation per dimension, not exact values.

    Built as a constant-folded chain of shift/and/or terms — pure
    whole-stage-codegen arithmetic, no UDF, no shuffle.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if not 1 <= bits * n <= 63:
        raise ValueError(
            f"bits*len(cols) must be in [1, 63], got {bits}*{n}"
        )
    z = F.lit(0).cast("long")
    for c, col in enumerate(cols):
        col = col.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1).cast("long")),
                    i * n + c,
                )
            )
    return z


def cluster_by_zorder(df, cols, bits: int = 16, n_partitions: int | None = None):
    """Physically cluster ``df`` on the Z-curve: range-partition by the
    interleaved key (contiguous curve segments per output partition —
    range, NOT hash, or locality dies at the partition boundary) and sort
    within partitions, so a subsequent partitioned write emits files whose
    per-column min/max zones are tight in EVERY ``cols`` dimension. One
    shuffle — the layout pass is paid once at write time, amortized over
    every pruned read after."""
    from pyspark.sql import functions as F

    key = zorder_key([F.col(c) if isinstance(c, str) else c for c in cols], bits)
    out = df.withColumn("_zkey", key)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "_zkey")
    else:
        out = out.repartitionByRange("_zkey")
    return out.sortWithinPartitions("_zkey").drop("_zkey")
