"""A/B: zero-copy branch fork vs deep clone as the experiment-fork
primitive, plus the fast-forward publish cost.

Workload: bootstrap N rows, apply one change batch, then fork. Variant A
is ``create_branch`` (zero-copy: manifests + ledger only, parent files
read in place). Variant B is ``clone_to`` (deep copy: every referenced
data dir duplicated in the distributed copy job). Both forks then apply
the SAME second batch and must land in the SAME visible state (asserted
against each other). Variant A additionally measures ``fast_forward``
(move branch-local dirs + re-link manifests = O(branch commits), not
O(table)).

The point at 100 TB: clone cost scales with TABLE bytes, branch cost
with METADATA bytes, and fast-forward with the EXPERIMENT's write set —
a fork of a 100 TB table is a few fsync'd JSON files either way you
measure it here, which is why branches are the only fork you'd run there.

Usage: python BENCH/branch_ab.py [n_rows] [events_per_batch] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georef_ar_etl_spark import datagen
from georef_ar_etl_spark.engine import CdcEngine
from georef_ar_etl_spark.session import get_spark

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main():
    spark = get_spark()
    base = tempfile.mkdtemp(prefix="branch_ab_")
    initial = datagen.gen_initial_state(N_ROWS, seed=3, max_len=64)
    ids = [d["doc_id"] for d in initial]
    evs = datagen.gen_events(ids, n_events=N_EVENTS * 2, n_batches=2, seed=9)
    sdf = datagen.state_to_df(spark, initial)

    def bdf(b):
        return datagen.events_to_df(
            spark, [e for e in evs if e["batch_id"] == b]
        )

    b0, b1 = bdf(0), bdf(1)
    b0.cache().count()
    b1.cache().count()

    best = {"branch_fork": [], "clone_fork": [], "fast_forward": []}
    state_fp = None
    for t in range(TRIALS):
        root = os.path.join(base, f"t{t}")
        eng = CdcEngine(spark, root, n_buckets=32)
        eng.bootstrap(sdf)
        eng.apply_batch(b0, 0)

        t0 = time.time()
        br = eng.create_branch("exp")
        best["branch_fork"].append(time.time() - t0)

        t0 = time.time()
        cl = eng.clone_to(root + "_clone")
        best["clone_fork"].append(time.time() - t0)

        br.apply_batch(b1, 1)
        cl.apply_batch(b1, 1)

        t0 = time.time()
        eng.fast_forward("exp")
        best["fast_forward"].append(time.time() - t0)

        a = eng.state().selectExpr(
            "sum(hash(doc_id, n_tok, source)) AS h", "count(*) AS c"
        ).collect()[0]
        b = cl.state().selectExpr(
            "sum(hash(doc_id, n_tok, source)) AS h", "count(*) AS c"
        ).collect()[0]
        assert (a["h"], a["c"]) == (b["h"], b["c"]), "fork results diverged"
        state_fp = (a["h"], a["c"])
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root + "_clone", ignore_errors=True)

    table_bytes = 0  # last trial removed; report input shape instead
    out = {
        "n_rows": N_ROWS,
        "events_per_batch": N_EVENTS,
        "trials": TRIALS,
        "state_fp": list(state_fp),
        "best_sec": {k: round(min(v), 3) for k, v in best.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in best.items()},
        "speedup_fork": round(min(best["clone_fork"]) / min(best["branch_fork"]), 1),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
