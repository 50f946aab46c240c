"""A/B: positional deletion vectors vs equality-tombstone deltas for
delete-only maintenance traffic.

Workload: bootstrap N rows, then apply K delete-only waves of M keys each
(disjoint, spread across all buckets — the erasure-list shape). Variant A
applies each wave with ``delete_keys_dv`` (positional masks; chain-free
reads stay on the native scan + broadcast anti-join). Variant B applies
the same waves as op='delete' change batches through the normal merge
(delta-mode equality tombstones; every later read of a touched bucket
resolves base+chain in the per-bucket pandas task).

Measured per variant:
  * apply wall — the K delete commits themselves;
  * read wall  — full read_state().count(), best-of-R (the recurring cost
    the DV design exists to kill);
  * lookup wall — 16-key point lookup, best-of-R.

Both variants end in the SAME visible state (asserted). Protocol:
alternating trials, best-of-R per site (this box shows up to ±2x run-to-run
noise; BENCH/BASELINE.md).

Usage: python BENCH/dv_ab.py [n_rows] [n_waves] [keys_per_wave] [trials]
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

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_WAVES = int(sys.argv[2]) if len(sys.argv) > 2 else 6
KEYS_PER_WAVE = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
TRIALS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def build(spark, root: str, initial) -> CdcEngine:
    if os.path.isdir(root):
        shutil.rmtree(root)
    eng = CdcEngine(spark, root, n_buckets=32, mor_max_deltas=8)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    return eng


def main() -> None:
    spark = get_spark(app_name="dv_ab", cores=8, shuffle_partitions=32)
    initial = datagen.gen_initial_state(N_ROWS, seed=11, max_len=64)
    all_ids = [r["doc_id"] for r in initial]
    waves = [
        all_ids[w::N_ROWS // KEYS_PER_WAVE][:KEYS_PER_WAVE]
        for w in range(N_WAVES)
    ]
    probe = all_ids[-16:]

    out: dict = {
        "n_rows": N_ROWS, "n_waves": N_WAVES,
        "keys_per_wave": KEYS_PER_WAVE, "trials": TRIALS,
    }
    states = {}
    for variant in ("dv", "tombstone"):
        root = f"/tmp/dv_ab_{variant}"
        eng = build(spark, root, initial)
        t0 = time.time()
        for w, keys in enumerate(waves):
            if variant == "dv":
                eng.delete_keys_dv(keys, batch_id=w + 1)
            else:
                ev = [
                    {"batch_id": w + 1, "seq": i, "op": "delete",
                     "doc_id": k, "tokens": None, "n_tok": None,
                     "source": "erasure"}
                    for i, k in enumerate(keys)
                ]
                eng.apply_batch(datagen.events_to_df(spark, ev), batch_id=w + 1)
        apply_wall = time.time() - t0

        read_walls, lookup_walls = [], []
        for _ in range(TRIALS):
            t = time.time()
            n = eng.state().count()
            read_walls.append(time.time() - t)
            t = time.time()
            eng.table.lookup_keys(probe).count()
            lookup_walls.append(time.time() - t)
        man = eng.table.latest_manifest()
        out[variant] = {
            "apply_wall_s": round(apply_wall, 3),
            "read_wall_s_best": round(min(read_walls), 3),
            "read_walls": [round(x, 3) for x in read_walls],
            "lookup_wall_s_best": round(min(lookup_walls), 3),
            "rows": n,
            "dv_buckets": len(man.get("bucket_dvs") or {}),
            "chain_buckets": len(man.get("bucket_deltas") or {}),
        }
        states[variant] = n

    assert states["dv"] == states["tombstone"], states
    a, b = out["dv"], out["tombstone"]
    out["read_speedup_dv_over_tombstone"] = round(
        b["read_wall_s_best"] / a["read_wall_s_best"], 2
    )
    out["lookup_speedup"] = round(
        b["lookup_wall_s_best"] / a["lookup_wall_s_best"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
