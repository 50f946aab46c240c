"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR plus the CDC
change-apply replay (the north-rule metric). Prints ONE JSON line.

Usage: python bench.py            # sf dir from env, cores from env
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)
       BENCH_CDC_SCALE    (events count override for the CDC replay)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from georef_ar_etl_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_latest_event_per_user",
    "q03_cdc_merge_state",
    "q04_broadcast_enrich",
    "q05_anti_join_deletes",
    "q08_union_append",
    "q10_group_minmax",
    "q12_token_count",
    "q14_lang_id",
    "q15_fingerprint_groups",
    "q16_exact_dedup",
    "q17_minhash_lsh_pairs",
    "q18_cosine_topk",
    "q21_normalize_tokens",
    "q22_knn_join",
    "q28_count_distinct",
    "q29_grouped_payload_union",
    "q31_repetition_quality",
    "q40_winnow_candidate_pairs",
    "q41_sequence_packing",
    "q42_hash_tokenize",
    "q43_vocabulary_topk",
    "q44_dedup_components",
    "q45_contamination_pairs",
    "q46_quality_gate",
    "q47_token_budget_sample",
    "q48_asof_join",
    "q49_range_join_window_agg",
    "q50_hypertable_rollup",
    "q51_count_min_sketch",
    "q52_unigram_lm_score",
    "q53_sessionize",
    "q54_embedding_mean_pool",
    "q55_per_group_sample",
    "q57_count_min_estimate",
    "q58_asof_join_forward_tolerance",
    "q59_asof_join_nearest",
    "q61_bloom_build",
    "q62_bloom_runtime_filter",
    "q64_tf_idf",
    "q65_rollup_grouping_sets",
    "q66_moving_window",
    "q67_group_quantile_profile",
    "q68_shipping_priority",
    "q69_local_supplier_volume",
    "q70_line_dedup",
    "q71_json_schema_on_read",
    "q72_pivot_crosstab",
    "q73_blocked_fuzzy_match",
    "q74_salted_skew_join",
    "q75_ohlc_resample",
    "q76_unpivot_melt",
    "q77_retention_cohort",
    "q78_funnel_stages",
    "q79_topk_per_group",
    "q80_time_spine_gap_fill",
    "q81_hll_registers",
    "q82_snapshot_diff",
    "q83_posting_search",
    "q84_bm25_rank",
    "q85_url_normalize",
    "q86_weighted_sample",
    "q87_pmi_cooccurrence",
    "q88_minhash_jaccard_estimate",
    "q89_pagerank",
    "q90_chunk_text",
    "q91_rrf_fusion",
    "q92_dedup_lines_in_doc",
    "q93_group_representative",
    "q94_interval_overlap_join",
    "q95_hist_sketch",
    "q96_hist_quantile",
    "q97_scd2_history",
    "q98_hll_group_registers",
    "q99_presence_bitmap",
    "q100_markov_transitions",
    "q101_heavy_hitters",
    "q102_zorder_key",
    "q104_set_similarity_join",
    "q105_triangles",
    "q106_skyline",
    "q107_mask_tokens",
    "q108_bpe_merges",
    "q109_golden_record",
    "q110_bpe_pair_counts",
    "q111_k_core",
    "q112_hll_set_algebra",
    "q113_fk_audit",
    "q114_bigram_lm_score",
    "q115_expectations",
    "q116_mad_outliers",
    "q117_sorted_neighborhood",
    "q118_negative_samples",
    "q119_quantile_binning",
    "q120_dup_span_coverage",
    "q121_link_prediction",
    "q122_psi_drift",
    "q123_state_runs",
    "q124_random_projection",
    "q125_pack_layout",
    "q126_fellegi_sunter",
    "q127_decayed_sum",
    "q128_source_minhash_similarity",
    "q129_stratified_sample",
    "q130_cdc_envelope_decode",
    "q131_cdc_envelope_quarantine",
    "q132_scd2_temporal_lookup",
    "q133_dup_span_removal",
    "q134_corr_matrix",
    "q135_lexical_diversity",
    "q136_tx_boundary_assembly",
    "q137_redelivery_dedupe",
    "q138_replica_reconciliation",
    "q139_ngram_novelty",
    "q140_sliding_hll_uniques",
    "q144_group_linreg",
    "q145_cdc_envelope_partial_images",
]
# q141_incremental_gram_index drives a full engine replay like q34 — the
# CDC replay benchmark measures that path
# q142_suffix_array / q143_repeated_spans are O(n log n) INDEX BUILDS
# (prefix-doubling suffix array: ceil(log2(max_len)) global-rank rounds,
# ~40 s / ~27 s at sf0.1) — like q36 they are deliberately not in the
# headline; their per-round cost is driver round-trips that amortize at
# cluster scale, not per-row work
# q56_continuous_aggregate, q60_cdc_patch_replay_state, q63_mor_point_lookup
# and q103_scd2_incremental drive a full engine replay like q24/q30/q34 —
# the CDC replay benchmark below measures that path end-to-end
# deliberately NOT in the headline: q36_ngram_jaccard_pairs is the exact
# blocked-quadratic baseline (its O(block²) cost is the point — ~90 s at
# sf0.1; the LSH families above are the scale path it calibrates)
# q146_zonemap_pruned_scan, q147_purge_keys, q148_incremental_join_view and
# q149_replica_repair_plan drive full engine replays like q24 — the CDC
# replay benchmark measures that path; their own deltas are A/B'd in
# BENCH/zonemap_ab.py and the maintenance-op pytest suites
# q150_wap_audited_replay, q151_deletion_vector_replay,
# q152_tagged_snapshot_read, q153_predicate_delete_replay,
# q154_rename_drop_replay, q155_predicate_update_replay and
# q156_merge_into_conditional and q157_clone_fork_replay are likewise
# full engine replays (WAP gate / DV masks / tag pinning / predicate
# sweep-or-update / rename-drop binding layered on the q24 fold); the
# deletion-vector read/apply trade is A/B'd in BENCH/dv_ab.py


def run_cdc_replay(
    spark,
    n_initial: int,
    n_events: int,
    n_batches: int,
    merge_impl: str = "copartitioned",
    trials: int = 1,
    patch_frac: float = 0.0,
) -> dict:
    """The north-rule workload: bootstrap a token-sequence table, replay a
    change-event log, measure end-to-end change-events/sec applied.

    ``trials`` > 1 repeats the whole bootstrap+replay on a fresh table root
    each time and reports the BEST replay plus the raw trial list — this
    shared box shows up to ±2x run-to-run noise (BENCH/BASELINE.md), so a
    single-trial headline cannot distinguish a regression from scheduler
    luck (the round-2 lesson: an unreproducible 13% 'regression')."""
    from georef_ar_etl_spark.benchgen import gen_bench_workload
    from georef_ar_etl_spark.engine import CdcEngine

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/cdc_bench_cache")
    mean_tokens = float(os.environ.get("BENCH_CDC_MEAN_TOKENS", "64"))
    ipath, edir = gen_bench_workload(
        cache, n_initial, n_events, n_batches, mean_tokens=mean_tokens,
        patch_frac=patch_frac,
    )
    initial = spark.read.parquet(ipath)

    boots, replays = [], []
    for _ in range(max(trials, 1)):
        root = tempfile.mkdtemp(
            prefix="cdc_bench_",
            dir=os.environ.get(
                "BENCH_TABLE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
            ),
        )
        try:
            eng = CdcEngine(
                spark, root, n_buckets=64, normalize_impl="pandas", merge_impl=merge_impl
            )
            t0 = time.time()
            eng.bootstrap(initial)
            boots.append(time.time() - t0)
            t1 = time.time()
            eng.replay_segments(edir)
            replays.append(time.time() - t1)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    best = min(replays)
    return {
        "cdc_initial_rows": n_initial,
        "cdc_events": n_events,
        "cdc_batches": n_batches,
        "cdc_bootstrap_sec": round(min(boots), 3),
        "cdc_replay_sec": round(best, 3),
        "cdc_events_per_sec": round(n_events / best, 1),
        "cdc_replay_trials": [round(t, 3) for t in replays],
        "cdc_replay_spread": round(max(replays) / best, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="bench", cores=cores)

    from georef_ar_etl_spark.plans.queries import QUERY_FNS

    # warmup (untimed): session bring-up, JIT, parquet footer cache, Python
    # worker spawn — without this the first timed query absorbs ~4 s of
    # one-time cost and regressions in it are invisible. Touch EVERY table
    # family a headline query reads, or the first reader of each file
    # absorbs its cold footer/page-cache cost and the per-query numbers
    # measure IO order instead of compute (observed: q12 "1.4 s" for three
    # rounds was ~1.1 s of first-documents-read).
    QUERY_FNS["q10_group_minmax"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    for t in (
        "lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings", "events",
    ):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).write.mode(
            "overwrite"
        ).format("noop").save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    # best-of-N per query (default 3): this box shows ±2x run-to-run noise
    # (BENCH/BASELINE.md), so a single trial cannot distinguish a regression
    # from scheduler luck — round 3's q14 "3x regression" was exactly that
    # (first-trial plan-compile + cold-column cost landing on whichever
    # query touched the expression first). Best + spread makes round-over-
    # round comparisons meaningful; the spread column is the noise floor.
    q_trials = int(os.environ.get("BENCH_QUERY_TRIALS", "3"))
    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERY_FNS[name]
        trials = []
        for _ in range(q_trials):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            trials.append(time.time() - t0)
        times[name] = round(min(trials), 3)
        spreads[name] = round(max(trials) / min(trials), 2)
        print(f"  {name}: {times[name]}s (spread {spreads[name]}x)", file=sys.stderr)

    try:
        sf_f = float(sf)
    except ValueError:
        sf_f = 0.1
    n_events = int(os.environ.get("BENCH_CDC_SCALE", int(2_000_000 * sf_f / 0.1)))
    cdc = run_cdc_replay(
        spark,
        n_initial=max(n_events // 4, 1000),
        n_events=n_events,
        n_batches=8,
        trials=int(os.environ.get("BENCH_CDC_TRIALS", "3")),
    )
    times["cdc_replay"] = cdc["cdc_replay_sec"]

    # track BOTH merge plans every round: the join-based merge shuffles the
    # touched state per batch, the copartitioned (default) one does not —
    # this keeps the copartitioned speedup claim measured, not remembered.
    # Quarter-scale workload bounds the extra bench time.
    join_events = max(n_events // 4, 1000)
    cdc_join = run_cdc_replay(
        spark,
        n_initial=max(join_events // 4, 1000),
        n_events=join_events,
        n_batches=4,
        merge_impl="join",
        trials=int(os.environ.get("BENCH_JOIN_TRIALS", "2")),
    )
    cdc["cdc_join_merge_events_per_sec"] = cdc_join["cdc_events_per_sec"]
    times["cdc_replay_join_merge"] = cdc_join["cdc_replay_sec"]

    # patch workload (25% partial-column updates): every patch forces a
    # read-modify-write of its bucket's payload, so this tracks the cost of
    # the patch-resolve path relative to the plain replay above.
    patch_events = max(n_events // 4, 1000)
    cdc_patch = run_cdc_replay(
        spark,
        n_initial=max(patch_events // 4, 1000),
        n_events=patch_events,
        n_batches=4,
        trials=int(os.environ.get("BENCH_PATCH_TRIALS", "2")),
        patch_frac=0.25,
    )
    cdc["cdc_patch_events_per_sec"] = cdc_patch["cdc_events_per_sec"]
    times["cdc_replay_patch"] = cdc_patch["cdc_replay_sec"]

    total = round(sum(times.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "query_trials": q_trials,
        "query_spreads": spreads,
        "sf": sf_f,
        "cores": cores,
        **cdc,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
