"""Single CDC-replay run at a given core count. Launched by run_scaling.py
via spark-submit --py-files (the north-rule launch mode). Prints one JSON line."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    cores = int(sys.argv[1])
    n_initial = int(sys.argv[2])
    n_events = int(sys.argv[3])
    n_batches = int(sys.argv[4])
    cache_dir = sys.argv[5]
    mean_tokens = float(sys.argv[6]) if len(sys.argv) > 6 else 256.0

    from georef_ar_etl_spark.benchgen import gen_bench_workload
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores)
    ipath, edir = gen_bench_workload(
        cache_dir, n_initial, n_events, n_batches, mean_tokens=mean_tokens
    )
    initial = spark.read.parquet(ipath)

    # table root on tmpfs: the scaling evidence isolates CPU scaling — on a
    # real cluster the sink is distributed storage whose bandwidth scales
    # with node count, which a single sandbox disk (386 MB/s) cannot emulate
    root = tempfile.mkdtemp(
        prefix=f"cdc_scale_{cores}_", dir=os.environ.get("SCALING_TABLE_DIR", "/dev/shm")
    )
    try:
        n_buckets = int(os.environ.get("SCALING_N_BUCKETS", max(64, cores * 2)))
        # SCALING_MOR_RATIO=0 forces pure copy-on-write — the A/B control
        # for attributing merge-on-read gains on the same box, same day
        eng = CdcEngine(
            spark, root, n_buckets=n_buckets,
            mor_rewrite_ratio=float(os.environ.get("SCALING_MOR_RATIO", "0.5")),
            # opt-in batch caching (wide-payload pipelines; see engine docstring)
            cache_batch=os.environ.get("SCALING_CACHE_BATCH", "0") == "1",
        )
        eng.bootstrap(initial)
        t0 = time.time()
        eng.replay_segments(edir)
        wall = time.time() - t0
        final_rows = eng.table.latest_manifest()["total_rows"]
        print(json.dumps({
            "cores": cores,
            "events": n_events,
            "batches": n_batches,
            "replay_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
            "final_rows": final_rows,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
