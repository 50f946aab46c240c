"""Point-lookup scale evidence: lookup_keys (bucket prune + bloom delta
skip + row-group prune) vs the naive full-scan filter on the same MOR
table. Launched standalone:

    spark-submit --py-files /tmp/engine.zip BENCH/lookup_bench.py \
        [n_initial] [n_events] [n_batches] [n_keys]

Prints one JSON line with both timings and the pruning stats. The ratio is
the point: the naive plan's cost grows with table size, lookup_keys' cost
grows with len(keys) — at 100 TB that is the difference between a scan and
an index probe."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_initial = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_keys = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    from georef_ar_etl_spark.benchgen import gen_bench_workload
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.session import get_spark

    spark = get_spark(app_name="lookup_bench")
    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/cdc_bench_cache")
    ipath, edir = gen_bench_workload(
        cache, n_initial, n_events, n_batches, mean_tokens=64.0
    )
    initial = spark.read.parquet(ipath)
    root = tempfile.mkdtemp(
        prefix="lookup_bench_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        # mor_rewrite_ratio=1.0 keeps every batch on the delta path: the
        # lookup must traverse real chains, the adversarial case for it
        eng = CdcEngine(spark, root, n_buckets=64, mor_rewrite_ratio=1.0,
                        mor_max_deltas=n_batches + 1)
        eng.bootstrap(initial)
        eng.replay_segments(edir)
        m = eng.table.latest_manifest()
        chains = sum(len(v) for v in (m.get("bucket_deltas") or {}).values())

        # real keys, deterministically hash-spread across the table; the
        # collect is n_keys rows (metadata-sized), never the key column
        from pyspark.sql import functions as F

        keys = [
            r["doc_id"]
            for r in initial.select("doc_id")
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(997)) == 0)
            .orderBy("doc_id")
            .limit(n_keys)
            .collect()
        ]
        key_sql = ",".join(f"'{k}'" for k in keys)

        def best_of(fn, n=3):
            ts = []
            for _ in range(n):
                t0 = time.time()
                rows = fn()
                ts.append(time.time() - t0)
            return min(ts), rows

        stats: dict = {}
        t_lookup, n_rows = best_of(
            lambda: eng.table.lookup_keys(keys, stats=stats).count()
        )
        t_scan, n_rows_scan = best_of(
            lambda: eng.table.read_state()
            .filter(f"doc_id in ({key_sql})")
            .count()
        )
        assert n_rows == n_rows_scan
        print(json.dumps({
            "n_initial": n_initial, "n_events": n_events,
            "n_batches": n_batches, "n_keys": n_keys,
            "delta_chain_links": chains,
            "lookup_sec": round(t_lookup, 3),
            "full_scan_filter_sec": round(t_scan, 3),
            "speedup": round(t_scan / t_lookup, 2),
            "rows_found": n_rows,
            "stats": stats,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
