"""A/B: zone-map planning on read_state(where=...) vs sidecars removed.

Measures what the dir-level skip buys where it actually bites on this
layout: (a) MOR-heavy tables probed on columns whose per-delta bounds are
narrow (each batch touches few keys → tight doc_id/source ranges per delta
dir), and (b) out-of-range probes, where EVERY dir skips and the "query"
never launches a Spark job. Hash-bucketed BASES intentionally don't skip on
uncorrelated predicates (each bucket spans the full value range) — that
honest non-win is reported too, as base_dirs_kept.

Both variants run the SAME read_state(where=...) code path; variant B
deletes the sidecars first (the reader's no-sidecar fallback = never skip),
so the timing isolates the planner, not the filter.

Protocol: alternating pairs, best-of-N (this box shows up to ±2x
run-to-run noise — single trials are meaningless, BENCH/BASELINE.md).

Usage: python BENCH/zonemap_ab.py [n_rows] [n_batches] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.session import get_spark
from georef_ar_etl_spark.sinks.zonemap import ZONEMAP_SIDECAR


def build(spark, root: str, n_rows: int, n_batches: int) -> CdcEngine:
    if os.path.isdir(root):
        shutil.rmtree(root)
    eng = CdcEngine(spark, root, n_buckets=32, mor_max_deltas=8)
    initial = datagen.gen_initial_state(n_rows, seed=11, max_len=64)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=n_rows // 20,
        n_batches=n_batches,
        seed=12,
        max_len=64,
    )
    eng.replay(datagen.events_to_df(spark, events))
    return eng


def strip_sidecars(root: str) -> int:
    n = 0
    for dirpath, _dn, names in os.walk(root):
        if ZONEMAP_SIDECAR in names:
            os.remove(os.path.join(dirpath, ZONEMAP_SIDECAR))
            n += 1
    return n


def run_queries(eng, where_list) -> tuple[float, dict]:
    t0 = time.time()
    agg_stats: dict = {}
    for where in where_list:
        stats: dict = {}
        n = eng.state(where=where, stats=stats).count()
        for k, v in stats.items():
            agg_stats[k] = agg_stats.get(k, 0) + v
        agg_stats["rows"] = agg_stats.get("rows", 0) + n
    return time.time() - t0, agg_stats


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    base = os.environ.get(
        "BENCH_TABLE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    )
    spark = get_spark(app_name="zonemap_ab", cores=32, shuffle_partitions=32)

    root_a = os.path.join(base, "zm_ab_with")
    root_b = os.path.join(base, "zm_ab_without")
    eng_a = build(spark, root_a, n_rows, n_batches)
    eng_b = build(spark, root_b, n_rows, n_batches)
    stripped = strip_sidecars(root_b)

    # probe mix: 8 point-ish probes with narrow delta relevance, 2 range
    # probes, 2 out-of-range probes (the all-skip fast path)
    ids = sorted(
        r["doc_id"]
        for r in eng_a.state().select("doc_id").limit(8).collect()
    )
    where_list = (
        [[("doc_id", "=", i)] for i in ids]
        + [[("n_tok", ">=", 60)], [("source", "=", "wal"), ("n_tok", "<", 4)]]
        + [[("n_tok", ">", 10**6)], [("doc_id", ">", "z")]]
    )

    best_a, best_b = float("inf"), float("inf")
    stats_a = stats_b = {}
    for _ in range(trials):
        ta, sa = run_queries(eng_a, where_list)
        tb, sb = run_queries(eng_b, where_list)
        if ta < best_a:
            best_a, stats_a = ta, sa
        if tb < best_b:
            best_b, stats_b = tb, sb
    assert stats_a["rows"] == stats_b["rows"], (stats_a, stats_b)

    # phase 2: CLUSTERED bases (OPTIMIZE move) — value-ordered multi-file
    # buckets make per-file pruning bite on range probes over the cluster
    # column; same probes, A keeps sidecars, B stripped again post-compact
    range_probes = [
        [("n_tok", ">=", 60)],
        [("n_tok", "<", 4)],
        [("n_tok", ">=", 20), ("n_tok", "<", 24)],
        [("n_tok", ">=", 40), ("n_tok", "<", 44)],
    ]
    rpf = max(n_rows // 32 // 16, 256)  # ~16 files per bucket
    eng_a.compact(min_deltas=0, cluster_by=["n_tok"], rows_per_file=rpf)
    eng_b.compact(min_deltas=0, cluster_by=["n_tok"], rows_per_file=rpf)
    stripped2 = strip_sidecars(root_b)
    best_ca, best_cb = float("inf"), float("inf")
    stats_ca = stats_cb = {}
    for _ in range(trials):
        ta, sa = run_queries(eng_a, range_probes)
        tb, sb = run_queries(eng_b, range_probes)
        if ta < best_ca:
            best_ca, stats_ca = ta, sa
        if tb < best_cb:
            best_cb, stats_cb = tb, sb
    assert stats_ca["rows"] == stats_cb["rows"], (stats_ca, stats_cb)

    print(
        json.dumps(
            {
                "metric": "zonemap_ab",
                "n_rows": n_rows,
                "n_batches": n_batches,
                "sidecars_stripped_in_B": stripped,
                "with_zonemaps_sec": round(best_a, 3),
                "without_zonemaps_sec": round(best_b, 3),
                "speedup": round(best_b / best_a, 3) if best_a else None,
                "dirs_skipped_with": stats_a.get("zonemap_dirs_skipped"),
                "dirs_kept_with": stats_a.get("zonemap_dirs_kept"),
                "rows_matched_both": stats_a["rows"],
                "clustered": {
                    "sidecars_stripped_in_B": stripped2,
                    "with_sec": round(best_ca, 3),
                    "without_sec": round(best_cb, 3),
                    "speedup": round(best_cb / best_ca, 3) if best_ca else None,
                    "files_skipped_with": stats_ca.get("zonemap_files_skipped"),
                    "dirs_skipped_with": stats_ca.get("zonemap_dirs_skipped"),
                    "rows_matched_both": stats_ca["rows"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
