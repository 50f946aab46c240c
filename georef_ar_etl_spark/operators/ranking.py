"""Rank fusion for retrieval pipelines.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009): combine
N ranked lists by ``score(d) = Σ_lists 1/(k + rank_list(d))`` — the
robust, training-free way to fuse heterogeneous retrievers (BM25 q84,
embedding cosine q18, recency priors, ...) whose raw scores are not
comparable. k=60 is the paper's constant.

Scale contract: per-list ranks ride the two-phase range-partitioned
global rank (entity_match.with_global_rank), so corpus-sized lists fuse
without the single-task ORDER BY window the naive formulation plans —
a recency prior or an exhaustive scorer legitimately ranks the whole
corpus, not just a top-k slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    depends on union/partition order.

    The per-list global rank rides ``with_global_rank`` (range partition
    → local rank → broadcast offsets) — a bare ``row_number() OVER
    (ORDER BY score)`` window pulls the whole list through ONE task,
    the classic Spark scale trap this repo pins tests against."""
    from georef_ar_etl_spark.operators.entity_match import with_global_rank

    if not frames:
        raise ValueError("rrf_fuse requires at least one ranked frame")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = []
    for f in frames:
        ranked = with_global_rank(
            f.select(
                F.col(id_col), (-F.col(score_col).cast("double")).alias("_neg")
            ),
            ["_neg", id_col],
            rank_col="_rank",
        )
        parts.append(
            ranked.select(
                F.col(id_col),
                F.round(F.lit(1.0) / (F.lit(k) + F.col("_rank")), 12)
                .cast("decimal(18,12)")
                .alias("_contrib"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.round(F.sum("_contrib"), round_to).cast("double").alias("rrf")
    )
