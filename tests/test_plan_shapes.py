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


def test_ivf_probe_plan_has_no_corpus_join(spark):
    """ivf_topk must be ONE fused scan (assign + probe-filter + score in a
    single mapInPandas), not a corpus⋈assignment join — the round-1 plan
    shuffled the whole corpus per probe."""
    import numpy as np

    from georef_ar_etl_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    C = similarity.ivf_index(emb, n_clusters=4, n_iter=2, seed=7)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    p = plan(similarity.ivf_topk(emb, qv, C, k=5, nprobe=2))
    assert "Join" not in p, p
    assert p.count("FileScan") == 1
    assert "MapInPandas" in p or "ArrowEvalPython" in p


def test_minhash_plan_single_shuffle_no_pair_join(spark):
    """minhash_lsh_pairs: one exchange (by band) between the two Arrow
    kernels; no join anywhere (verification happens inside band groups)."""
    from georef_ar_etl_spark.operators import doc_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = doc_dedup.minhash_lsh_pairs(docs, n_hashes=8, n_bands=4,
                                      min_jaccard=0.35, shingle_k=8)
    p = plan(out)
    assert "Join" not in p, p
    assert p.count("FileScan") == 1


def test_repetition_features_stay_jvm_side(spark):
    """q31's repetition ratios must be pure Catalyst (higher-order
    functions), never a Python UDF — one BatchEvalPython/ArrowEval node
    here would put an interpreter on every row of a 100 TB corpus."""
    p = plan(QUERY_FNS["q31_repetition_quality"](spark, SF_DIR))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "mapinpandas" not in p.lower()


def test_quantized_probe_scan_prunes_float_vectors(spark, tmp_path):
    """The point of the int8-quantized IVF probe is reading codes + scale
    instead of float vectors — so when both live in one table, the probe's
    parquet scan must NOT read the float embedding column."""
    from georef_ar_etl_spark.operators import similarity

    emb = spark.range(200).selectExpr(
        "id AS vec_id",
        "array(cast(id % 7 AS double), cast(id % 5 AS double)) AS embedding",
    )
    path = str(tmp_path / "qtab")
    similarity.quantize_embeddings(emb).write.parquet(path)
    qdf = spark.read.parquet(path)
    probe = similarity.ivf_topk_quantized(
        qdf, [1.0, 1.0], [[0.0, 0.0], [5.0, 5.0]], k=5, nprobe=1
    )
    p = plan(probe)
    assert "embedding" not in p.split("ReadSchema")[-1]
    assert "q_scale" in p and "vec_id" in p


def test_index_refresh_lookup_never_shuffles_the_bucket_read(spark, tmp_path):
    """The incremental index's old-value lookup must be broadcast end to
    end (semi-trim + small-small join) — a shuffle here re-moves the whole
    pruned forward-bucket read per refresh, the exact cost the changelog
    consumer exists to avoid. (A broadcast hint on the preserved side of an
    outer join is silently ignored by Spark — this pins the supported
    formulation.)"""
    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.operators.index_maintenance import (
        FingerprintIndex,
        fingerprint_of_tokens,
    )
    from georef_ar_etl_spark.sinks.snapshot_table import bucket_expr

    initial = datagen.gen_initial_state(150, seed=31, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    idx = FingerprintIndex(spark, str(tmp_path / "idx"), n_buckets=4)
    idx.bootstrap(eng.state(epoch=0))
    staged = (
        datagen.state_to_df(spark, initial[:5])
        .select(
            "doc_id",
            F.lit("upsert").alias("op"),
            fingerprint_of_tokens(F.col("tokens")).alias("_new"),
            bucket_expr(F.col("doc_id"), 4).alias("bucket"),
        )
        .localCheckpoint(eager=True)
    )
    p = plan(idx._lookup_old(staged, [0, 1, 2, 3]))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_asof_nearest_single_exchange_two_sorts(spark):
    """The nearest as-of needs BOTH window orderings (opposite side order
    at equal timestamps) — the plan must reuse ONE hash exchange of the
    union and pay only a second within-partition sort, never a second
    shuffle of the data."""
    from georef_ar_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([(1, 9, 5)], "k long, t long, v long")
    df = asof_join(
        left, right, "k", "k", "t", "t", right_cols=["v"], direction="nearest"
    )
    p = plan(df)
    # exchanges partitioning by the join key _k: exactly one (the two
    # leaf-side round-robin/parallelize exchanges don't carry _k)
    key_exchanges = [
        ln for ln in p.splitlines()
        if "Exchange hashpartitioning(_k" in ln
    ]
    assert len(key_exchanges) == 1, p
    assert p.count("Window ") >= 2  # both direction windows present


def test_tpch_q68_filters_reach_all_three_scans(spark):
    p = plan(QUERY_FNS["q68_shipping_priority"](spark, SF_DIR))
    assert "EqualTo(c_mktsegment,BUILDING)" in p
    assert "LessThan(o_orderdate" in p
    assert "GreaterThan(l_shipdate" in p


def test_tpch_q69_dims_are_broadcast(spark):
    p = plan(QUERY_FNS["q69_local_supplier_volume"](spark, SF_DIR))
    # nation and region must ride broadcasts — a shuffle for a 25/5-row dim
    # is the classic 1000-executor plan bug
    assert p.count("BroadcastHashJoin") >= 2
    assert "EqualTo(r_name,ASIA)" in p


def test_scd2_single_exchange(spark):
    """SCD2's two stacked windows (change-point lag + interval lead) share
    partitioning and order, so the whole history build costs ONE exchange."""
    from georef_ar_etl_spark.operators.scd import scd2_history

    df = spark.createDataFrame(
        [(1, 1, "u", "a")], "key int, seq int, op string, v string"
    )
    p = plan(scd2_history(df, "key", "seq", "op", ["v"]))
    assert p.count("Exchange") == 1, p


def test_heavy_hitters_big_side_never_shuffles_raw_items(spark):
    """Pass 2 must be broadcast (semi join + total): no SortMergeJoin, no
    exchange keyed by the raw item before the candidate filter."""
    from georef_ar_etl_spark.operators.sketches import heavy_hitters

    df = spark.range(1000).select((F.col("id") % 50).cast("string").alias("w"))
    p = plan(heavy_hitters(df, "w", k=10))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_set_similarity_join_never_nested_loop(spark):
    """q104's exact join must stay equi-joinable end to end — a
    BroadcastNestedLoopJoin or CartesianProduct anywhere means the
    prefix-filter candidate join degenerated into all-pairs."""
    from georef_ar_etl_spark.operators.doc_dedup import set_similarity_join

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = set_similarity_join(
        df, min_jaccard_pct=80, shingle_k=8, checkpoint=False
    )
    p = plan(out)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the id<id / length / positional predicates ride the token equi-join
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_golden_record_single_exchange(spark):
    """Per-column survivorship is ONE map-side-combinable aggregate: a
    single Exchange, no window, no join."""
    from georef_ar_etl_spark.operators.scd import golden_record

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    out = golden_record(
        ev, ["user_id"], ["ts", "event_id"], ["event_type", "value"]
    )
    p = plan(out)
    assert p.count("Exchange") == 1
    assert "Window" not in p and "Join" not in p
    assert "partial_max" in p or "partial" in p.lower()


def test_negative_samples_plan_no_cartesian(spark):
    """The rank pairing must stay an equi-join on rank: any cartesian or
    nested-loop shape would explode at corpus scale."""
    p = plan(QUERY_FNS["q118_negative_samples"](spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Join" in p


def test_sorted_neighborhood_plan_no_global_window_over_data(spark):
    """with_global_rank must never move the DATA through a single-task
    window: every WindowExec in the plan is partitioned by _pid."""
    p = plan(QUERY_FNS["q117_sorted_neighborhood"](spark, SF_DIR))
    for line in p.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, line
    assert "CartesianProduct" not in p


def test_fk_audit_plan_uses_anti_joins(spark):
    p = plan(QUERY_FNS["q113_fk_audit"](spark, SF_DIR))
    assert "LeftAnti" in p


def test_dup_span_plan_shuffles_hashed_grams(spark):
    """The gram aggregate must exchange 60-bit hashes, never the 8-word
    gram strings: the hash projection happens BEFORE the exchange."""
    p = plan(QUERY_FNS["q120_dup_span_coverage"](spark, SF_DIR))
    assert "hashpartitioning(g#" in p, p


def test_random_projection_no_shuffle(spark):
    # the JL sketch is a pure map: sign matrix folded into the plan as
    # literals (never a join), projection pipelined into the scan. The only
    # permitted exchange is _t's input-spread round-robin (a no-op at
    # production split counts) — never a HASH shuffle.
    p = plan(QUERY_FNS["q124_random_projection"](spark, SF_DIR))
    assert "hashpartitioning" not in p, p
    assert "Join" not in p


def test_state_runs_single_exchange(spark):
    # both window passes and the island agg ride ONE hash partitioning
    p = plan(QUERY_FNS["q123_state_runs"](spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1


def test_pack_layout_single_exchange(spark):
    # layout windows reuse the pack-assignment window's shuffle
    p = plan(QUERY_FNS["q125_pack_layout"](spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1


def test_decayed_sum_pushes_asof_filter(spark):
    p = plan(QUERY_FNS["q127_decayed_sum"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(ts), LessThanOrEqual(ts" in p


def test_fellegi_sunter_is_pure_projection_over_block_join(spark):
    # FS scoring adds NO shuffle beyond the blocker's equi-join
    p = plan(QUERY_FNS["q126_fellegi_sunter"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_psi_report_scan_reduced_before_spine(spark):
    # the corpus leaves the scan as a (side,bin) partial agg: the plan
    # must show a partial_count BEFORE the exchange (map-side combine)
    p = plan(QUERY_FNS["q122_psi_drift"](spark, SF_DIR))
    assert "partial_count" in p


def test_envelope_decode_no_shuffle(spark):
    # decode is a pure map: one from_json inside the scan projection —
    # no exchange beyond _t's round-robin input spread, no join
    p = plan(QUERY_FNS["q130_cdc_envelope_decode"](spark, SF_DIR))
    assert "hashpartitioning" not in p, p
    assert "from_json" in p
    assert "Join" not in p


def test_scd2_lookup_two_exchanges_no_theta_join(spark):
    # history build shuffles once on the key; the as-of lookup unions
    # facts+versions and shuffles once more — NEVER an interval join
    # (no theta/nested-loop/cartesian pair explosion)
    p = plan(QUERY_FNS["q132_scd2_temporal_lookup"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_dup_span_removal_hashed_grams_no_python(spark):
    # grams exchange as 60-bit ints (projection before the window's
    # shuffle); reconstruction is array expressions — no Python workers
    p = plan(QUERY_FNS["q133_dup_span_removal"](spark, SF_DIR))
    assert "hashpartitioning(g#" in p, p
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p


def test_corr_matrix_single_partial_aggregate(spark):
    # every moment rides ONE map-side-combined aggregate: a single
    # single-partition exchange, no per-pair scans, no join
    p = plan(QUERY_FNS["q134_corr_matrix"](spark, SF_DIR))
    assert "Join" not in p
    assert p.count("Exchange") <= 2, p  # input spread + SinglePartition
    assert "partial_" in p


def test_table_checksum_map_side_combined(spark):
    # per-bucket checksum partials combine before the exchange
    p = plan(QUERY_FNS["q138_replica_reconciliation"](spark, SF_DIR))
    assert "partial_sum" in p and "partial_count" in p


def test_rrf_fusion_no_global_window(spark):
    # per-list ranks ride with_global_rank: every row_number window in the
    # plan is partitioned by _pid, never a single-task ORDER BY window
    p = plan(QUERY_FNS["q91_rrf_fusion"](spark, SF_DIR))
    for line in p.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, line


def test_suffix_array_rounds_no_global_window(spark):
    p = plan(QUERY_FNS["q142_suffix_array"](spark, SF_DIR))
    for line in p.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, line
    assert "CartesianProduct" not in p
