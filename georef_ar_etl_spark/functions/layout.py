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
