"""Skyline (Pareto frontier) over arbitrary minimize/maximize dimensions.

The multi-criteria "best rows" operator (Börzsönyi et al. ICDE'01): a row
survives iff no other row is at-least-as-good on EVERY dimension and
strictly better on at least one. The reference ranks entities by single
percentages (georef_ar_etl/processes.py report ordering); the skyline is
the multi-objective generalization an analytics engine needs (cheapest ∧
largest, newest ∧ highest-quality, ...).

Scale posture: dominance is transitive, so a two-phase
local-prune → global-prune plan is exact — phase 1 computes each
partition's skyline with a vectorized O(k·s) pandas kernel (s = local
skyline size, typically ≪ partition rows), phase 2 reduces the union of
local skylines (bounded: only locally non-dominated points remain) on one
task. The global phase is the classic sequential step of distributed
skyline algorithms; if the local-skyline union itself were huge, the
standard fix is recursive re-partition-and-prune — not needed while
frontier sizes are output-sized. No shuffle touches the full input:
phase 1 runs on the scan partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prune(pdf: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Exact skyline of one in-memory frame of DISTINCT points, all dims
    pre-negated to MINIMIZE. Sum-ascending order makes the head point
    always skyline (a dominator would need a strictly smaller sum), so:
    take the head, vector-drop every point it dominates, repeat — s fully
    vectorized passes over a shrinking array (s = skyline size), no
    per-row Python loop."""
    if pdf.empty:
        return pdf
    import numpy as np

    vals = pdf[cols].to_numpy()
    order = np.argsort(vals.sum(axis=1), kind="stable")
    vals, idx = vals[order], order
    kept: list[int] = []
    while len(vals):
        v = vals[0]
        kept.append(int(idx[0]))
        # rows are distinct, so (x >= v).all ⇔ v dominates x (or x is v)
        survive = ~(vals >= v).all(axis=1)
        vals, idx = vals[survive], idx[survive]
    return pdf.iloc[sorted(kept)]


def skyline(df: DataFrame, dims: dict[str, str]) -> DataFrame:
    """Distinct Pareto-optimal points over ``dims`` (col -> 'min'|'max').

    Returns the DISTINCT frontier points (the dim columns only) — a set,
    deterministic under any partitioning. Dominance uses weak inequality
    on every dim plus strict on ≥1; duplicate points collapse first so
    equal points don't eliminate each other.
    """
    bad = {d for d in dims.values() if d not in ("min", "max")}
    if bad:
        raise ValueError(f"directions must be 'min' or 'max', got {bad}")
    cols = list(dims)
    # negate max-dims once: everything below is pure MINIMIZE
    raw = df.select(
        *[
            (F.col(c) if d == "min" else (-F.col(c))).alias(c)
            for c, d in dims.items()
        ]
    ).dropna()
    # exact dominance-preserving pre-reduction in pure Catalyst (guide
    # §4.1: built-ins before any Python boundary): among points equal on
    # every dim but the last, only the one with the minimal last dim can
    # be skyline (the others are dominated by it — equal elsewhere,
    # strictly worse on the last). group-by + min is map-side combinable,
    # subsumes the old distinct() (one shuffle on FEWER columns), and
    # shrinks the frame crossing into the pandas prune from the full
    # distinct point set to one row per dims[:-1] prefix — at sf1.0 that
    # is 6M lineitem rows → 50 rows before Arrow ever moves a byte.
    last = cols[-1]
    pts = (
        raw.groupBy(*cols[:-1]).agg(F.min(last).alias(last))
        if len(cols) > 1
        else raw.groupBy().agg(F.min(last).alias(last))
    ).select(*cols)

    schema = pts.schema

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _prune(pdf, cols)

    locals_ = pts.mapInPandas(local, schema)
    glob = locals_.coalesce(1).mapInPandas(local, schema)
    return glob.select(
        *[
            (F.col(c) if d == "min" else (-F.col(c))).alias(c)
            for c, d in dims.items()
        ]
    )
