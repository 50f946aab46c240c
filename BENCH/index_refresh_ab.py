"""A/B: incremental index refresh (changelog consumer) vs batch recompute.

The claim behind operators/index_maintenance.py is that a derived index
refreshed from engine.changes() costs O(changed rows + their index
buckets), while the alternative — recompute the index from the full state —
costs O(corpus). This measures both on the same table: bootstrap a
multi-million-row token table, apply one small change batch, then time

  (a) refresh: changes(epoch-1, epoch) -> FingerprintIndex.refresh
  (b) recompute: FingerprintIndex.bootstrap on a fresh root from the
      full post-batch state (what every epoch would pay without the
      changelog)

Honest notes: hash bucketing spreads even a 1%% change batch across ALL
index buckets (locality is destroyed by design), so the bucket-pruned
lookup only prunes for batches with fewer distinct keys than buckets —
the second scenario measures that; the first scenario's win comes from
never rescanning the (heavy) token corpus. Alternating best-of-N trials
(±2x box noise, BENCH/BASELINE.md).

Usage: python BENCH/index_refresh_ab.py [n_docs] [n_events] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georef_ar_etl_spark.benchgen import gen_bench_workload
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.operators.index_maintenance import FingerprintIndex
from georef_ar_etl_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    if trials < 1:
        raise SystemExit("trials must be >= 1")  # fail before the expensive setup
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    cache = os.environ.get("BENCH_CACHE_DIR", os.path.join(shm, "cdc_bench_cache"))
    root = os.path.join(shm, "idx_refresh_ab")
    shutil.rmtree(root, ignore_errors=True)

    spark = get_spark(app_name="index_refresh_ab")
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()  # warm workers

    ipath, edir = gen_bench_workload(
        cache, n_docs, n_events, 1, mean_tokens=64.0
    )
    eng = CdcEngine(spark, os.path.join(root, "src"), n_buckets=64)
    eng.bootstrap(spark.read.parquet(ipath))

    # index at epoch 0 (pre-timing), then the change batch
    idx_root = os.path.join(root, "idx_inc")
    idx = FingerprintIndex(spark, idx_root, n_buckets=64)
    idx.bootstrap(eng.state(epoch=0), source_epoch=0)
    m = eng.apply_batch(
        spark.read.parquet(os.path.join(edir, "batch-000000.parquet")), 0
    )
    head = m["epoch"]

    inc, full = [], []
    for t in range(trials):
        # (a) incremental: fresh copy of the epoch-0 index each trial so the
        # refresh is always epoch0 -> epoch1 (copy cost outside the timing)
        trial_root = os.path.join(root, f"idx_trial_{t}")
        shutil.copytree(idx_root, trial_root)
        idx_t = FingerprintIndex(spark, trial_root, n_buckets=64)
        t0 = time.time()
        idx_t.refresh(eng.changes(0, head), head)
        inc.append(time.time() - t0)

        # (b) recompute from the full post-batch state
        re_root = os.path.join(root, f"idx_full_{t}")
        idx_f = FingerprintIndex(spark, re_root, n_buckets=64)
        t0 = time.time()
        idx_f.bootstrap(eng.state(), source_epoch=head)
        full.append(time.time() - t0)

    # sanity: incremental == recompute (cheap count + anti-join emptiness)
    a = idx_t.groups()
    b = idx_f.groups()
    mismatch = a.join(b, ["fp", "n_dups", "keep_id"], "left_anti").count() \
        + b.join(a, ["fp", "n_dups", "keep_id"], "left_anti").count()

    out = {
        "n_docs": n_docs, "n_events": n_events, "trials": trials,
        "n_buckets": 64,
        "refresh_best_sec": round(min(inc), 3),
        "refresh_trials": [round(x, 3) for x in inc],
        "recompute_best_sec": round(min(full), 3),
        "recompute_trials": [round(x, 3) for x in full],
        "speedup_best": round(min(full) / min(inc), 2),
        "group_mismatches": mismatch,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
