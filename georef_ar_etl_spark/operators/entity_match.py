"""Entity resolution: blocked fuzzy matching (block -> verify -> best).

The reference normalizes entity names and joins records by cleaned-name
equality (georef_ar_etl/utils.py::clean_string consumers; street/locality
name joins in the process modules) — exact match after normalization. At
web scale the dirty side never normalizes perfectly, so the standard ER
shape is: a cheap BLOCKING key bounds the candidate space (equi-join, one
shuffle), an edit-distance VERIFY prunes candidates (JVM levenshtein,
codegen), and a map-side-combinable min(struct) picks the best match per
probe. Never all-pairs: the block key is the contract that bounds the
join fan-out, exactly like the LSH bands in doc_dedup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def digits_block(col: Column) -> Column:
    """Digit-only blocking key — the ER-classic 'block on the phone/zip/id
    digits' rule, robust to any non-numeric corruption of the name."""
    return F.regexp_replace(col, "[^0-9]", "")


def blocked_fuzzy_match(
    probe: DataFrame,
    clean: DataFrame,
    probe_id: str = "probe_id",
    clean_id: str = "clean_id",
    probe_name: str = "name",
    clean_name: str = "name",
    block: Callable[[Column], Column] = digits_block,
    max_dist: int = 2,
) -> DataFrame:
    """Match each probe row to its best clean-side row: equi-join on the
    blocking key, keep candidates with levenshtein <= max_dist, then the
    minimum (dist, clean_id) per probe — deterministic tie-break, partial
    aggregation (no per-probe window sort). Probes with no candidate
    within max_dist are absent from the output (caller decides the
    unmatched policy). Output: (probe_id, clean_id, dist).

    An empty blocking key (nothing survives the block fn) is dropped on
    BOTH sides rather than cross-matching all degenerate rows.
    """
    pb = probe.select(
        F.col(probe_id),
        F.col(probe_name).alias("_pname"),
        block(F.col(probe_name)).alias("_blk"),
    ).filter(F.col("_blk") != "")
    cl = clean.select(
        F.col(clean_id),
        F.col(clean_name).alias("_cname"),
        block(F.col(clean_name)).alias("_blk"),
    ).filter(F.col("_blk") != "")
    cand = pb.join(cl, "_blk").select(
        probe_id,
        clean_id,
        F.levenshtein("_pname", "_cname").alias("dist"),
    )
    return (
        cand.filter(F.col("dist") <= max_dist)
        .groupBy(probe_id)
        .agg(F.min(F.struct("dist", clean_id)).alias("b"))
        .select(
            probe_id,
            F.col(f"b.{clean_id}").alias(clean_id),
            F.col("b.dist").alias("dist"),
        )
    )
