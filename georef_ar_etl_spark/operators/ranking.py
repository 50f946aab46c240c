"""Rank fusion for retrieval pipelines.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009): combine
N ranked lists by ``score(d) = Σ_lists 1/(k + rank_list(d))`` — the
robust, training-free way to fuse heterogeneous retrievers (BM25 q84,
embedding cosine q18, recency priors, ...) whose raw scores are not
comparable. k=60 is the paper's constant.

Scale contract: inputs are RETRIEVAL OUTPUTS — top-k lists, thousands of
rows — not corpora. Ranks are computed with a global ordered window
(single sorted partition) by design; feeding an unbounded frame here is
a caller bug, not a missing optimization (rank a corpus with
weighted/top-k operators instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    frames: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    round_to: int = 9,
) -> DataFrame:
    """Fuse ranked lists into (id_col, rrf). Each frame needs
    (id_col, score_col); rank = row_number over (score desc, id asc) —
    deterministic under ties. Items absent from a list contribute
    nothing for it. Per-list contributions are rounded then summed as
    exact decimals (the q68/q84 pattern), so the fused score never
    depends on union/partition order."""
    if not frames:
        raise ValueError("rrf_fuse requires at least one ranked frame")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.orderBy(F.desc(score_col), F.col(id_col).asc())
    parts = [
        f.select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(k) + F.row_number().over(w)), 12)
            .cast("decimal(18,12)")
            .alias("_contrib"),
        )
        for f in frames
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.round(F.sum("_contrib"), round_to).cast("double").alias("rrf")
    )
