"""A/B: column-Bloom skipping on point probes vs min/max zone maps alone.

The scenario blooms exist for: EQUALITY probes on the HIGH-CARDINALITY
key column of a hash-bucketed table. Every bucket spans the whole id
domain, so min/max bounds keep all dirs and the probe scans the full
table; a per-dir bloom proves the key absent from all but the (at most
one) bucket that hashes it — or from every dir when the key never
existed. Variant A enables blooms via one indexing compact
(``compact(min_deltas=0, bloom_cols=["doc_id", "source"])``); variant B
is the identical table without them. Both run the SAME
``read_state(where=...)`` code path, so the timing isolates the planner.

Also reported: the absent-category probe (an in-range ``source`` value
bounds can't refute) and the dirs-kept counters proving WHY the wins
happen.

Protocol: alternating pairs, best-of-N (this box shows up to ±2x
run-to-run noise — single trials are meaningless, BENCH/BASELINE.md).

Usage: python BENCH/bloom_ab.py [n_rows] [n_batches] [trials]
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


def build(spark, root: str, n_rows: int, n_batches: int, bloom: bool) -> CdcEngine:
    if os.path.isdir(root):
        shutil.rmtree(root)
    eng = CdcEngine(spark, root, n_buckets=32, mor_max_deltas=8)
    initial = datagen.gen_initial_state(n_rows, seed=21, max_len=64)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    if bloom:
        eng.compact(min_deltas=0, bloom_cols=["doc_id", "source"])
    events = datagen.gen_events(
        [r["doc_id"] for r in initial],
        n_events=n_rows // 20,
        n_batches=n_batches,
        seed=22,
        max_len=64,
    )
    eng.replay(datagen.events_to_df(spark, events))
    return eng


def run_queries(eng, where_list) -> tuple[float, dict]:
    t0 = time.time()
    agg: dict = {}
    for where in where_list:
        stats: dict = {}
        n = eng.state(where=where, stats=stats).count()
        for k, v in stats.items():
            agg[k] = agg.get(k, 0) + v
        agg["rows"] = agg.get("rows", 0) + n
    return time.time() - t0, agg


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    base = os.environ.get(
        "BENCH_TABLE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    )
    spark = get_spark(app_name="bloom_ab", cores=32, shuffle_partitions=32)

    eng_a = build(spark, os.path.join(base, "bl_ab_with"), n_rows, n_batches, True)
    eng_b = build(spark, os.path.join(base, "bl_ab_without"), n_rows, n_batches, False)

    # probe mix: 6 present-key point probes, 6 absent-key probes (in the id
    # range, so bounds keep everything), 1 absent-category probe, 1 small IN
    ids = sorted(
        r["doc_id"] for r in eng_a.state().select("doc_id").limit(6).collect()
    )
    absent = [i[:-1] + ("1" if i[-1] != "1" else "2") for i in ids]
    where_list = (
        [[("doc_id", "=", i)] for i in ids]
        + [[("doc_id", "=", i)] for i in absent]
        + [[("source", "=", "mid")]]
        + [[("doc_id", "in", ids[:3] + absent[:3])]]
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

    print(
        json.dumps(
            {
                "metric": "bloom_ab",
                "n_rows": n_rows,
                "n_batches": n_batches,
                "trials": trials,
                "bloom_sec": round(best_a, 3),
                "nobloom_sec": round(best_b, 3),
                "speedup": round(best_b / best_a, 2),
                "bloom_dirs_kept": stats_a.get("zonemap_dirs_kept", 0),
                "bloom_dirs_skipped": stats_a.get("zonemap_dirs_skipped", 0),
                "nobloom_dirs_kept": stats_b.get("zonemap_dirs_kept", 0),
                "nobloom_dirs_skipped": stats_b.get("zonemap_dirs_skipped", 0),
                "rows": stats_a["rows"],
            }
        )
    )


if __name__ == "__main__":
    main()
