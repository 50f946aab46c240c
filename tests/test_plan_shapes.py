"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in the plans, not assumed (pushdown, pruning, broadcast, codegen)."""

import pytest
from pyspark.sql import functions as F

from georef_ar_etl_spark.plans.queries import QUERY_FNS

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet_scan(spark):
    df = QUERY_FNS["q01_pricing_summary"](spark, SF_DIR)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_column_pruning_reads_only_needed_columns(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter(F.col("l_quantity") > 10)
    )
    p = plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_dimension_join_is_broadcast(spark):
    df = QUERY_FNS["q04_broadcast_enrich"](spark, SF_DIR)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_anti_join_strategy(spark):
    df = QUERY_FNS["q05_anti_join_deletes"](spark, SF_DIR)
    assert "LeftAnti" in plan(df)


def test_whole_stage_codegen_covers_agg(spark):
    df = QUERY_FNS["q01_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE finalizes the physical plan only on execution
    p = plan(df)
    # AQE plan strings mark whole-stage-codegen spans with the *(n) prefix
    assert "*(1)" in p and "HashAggregate" in p


def test_bucket_pruned_state_read(spark, tmp_path):
    """read_state(buckets=[...]) must scan only the requested buckets'
    files — the manifest-driven partition pruning the merge relies on."""
    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.bootstrap(datagen.state_to_df(spark, datagen.gen_initial_state(200, seed=61, max_len=8)))
    pruned = eng.table.read_state(buckets=[0, 1])
    full = eng.table.read_state()
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    assert all("bucket=0" in f or "bucket=1" in f for f in pruned.inputFiles())
    buckets_seen = {r["bucket"] for r in pruned.select("bucket").distinct().collect()}
    assert buckets_seen <= {0, 1}
