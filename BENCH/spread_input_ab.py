"""A/B: CdcEngine(spread_input=True) vs default on the 2M-event replay.
A change batch that arrives as ONE small parquet file runs the whole
pre-pass map side (parse, validate, digest) on one core; spread_input
round-robins it to defaultParallelism first, at the cost of one extra
exchange of the batch. Alternating pairs, best-of-N each.

    spark-submit --py-files /tmp/engine.zip BENCH/spread_input_ab.py [n_events] [pairs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from georef_ar_etl_spark.benchgen import gen_bench_workload
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.session import get_spark

    spark = get_spark(app_name="spread_input_ab")
    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/cdc_bench_cache")
    ipath, edir = gen_bench_workload(cache, n_events // 4, n_events, 8, mean_tokens=64.0)
    initial = spark.read.parquet(ipath)

    def run(spread: bool) -> float:
        root = tempfile.mkdtemp(
            prefix="spread_ab_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        try:
            eng = CdcEngine(spark, root, n_buckets=64, spread_input=spread)
            eng.bootstrap(initial)
            t0 = time.time()
            eng.replay_segments(edir)
            return time.time() - t0
        finally:
            shutil.rmtree(root, ignore_errors=True)

    res = {"off": [], "on": []}
    for _ in range(pairs):
        res["off"].append(round(run(False), 3))
        res["on"].append(round(run(True), 3))
    out = {
        "n_events": n_events,
        "off_best": min(res["off"]), "on_best": min(res["on"]),
        "off_trials": res["off"], "on_trials": res["on"],
        "on_speedup": round(min(res["off"]) / min(res["on"]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
