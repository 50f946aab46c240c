"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator catalog
(georef_ar_etl_spark/plans/queries.py), one entry per operator family from
SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` the matching DuckDB
SQL. Every entry has a full rows+schema+hash oracle — including the
full-engine replay (q24) and the incremental changelog (q30) — except
q108_bpe_merges (iterative argmax, not SQL-expressible: rows-only for the
driver, pinned to a pure-Python reference in tests/test_bpe_skyline.py;
its per-round aggregate IS hash-oracled as q110_bpe_pair_counts).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from georef_ar_etl_spark.plans.queries import QUERY_FNS, all_oracle_sql


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC MERGE kernel (full-outer upsert classification)
    applied to a change stream derived from the events table."""
    return QUERY_FNS["q03_cdc_merge_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    # includes lazily-built data-dependent oracles (q26 inlines an index
    # trained on the sf0.01 embeddings — built here, not at import)
    return all_oracle_sql()
