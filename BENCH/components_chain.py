"""Adversarial connected-components stress: a PATH graph of n vertices
(diameter n-1) — the worst case for label propagation (O(n) rounds) and
the demonstration that the pointer-jump formulation converges in O(log n)
rounds. Prints one JSON line per size; results -> BENCH/BASELINE.md.

Usage: python BENCH/components_chain.py [sizes...]   (default 10^4 10^5 10^6)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators.doc_dedup import connected_components
    from georef_ar_etl_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
    spark = get_spark(app_name="components_chain")
    for n in sizes:
        edges = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        stats = {}
        t0 = time.time()
        comp = connected_components(edges, max_iter=40, stats=stats)
        bad = comp.filter(F.col("component") != 0).count()
        wall = time.time() - t0
        print(json.dumps({
            "chain_n": n,
            "diameter": n - 1,
            "rounds": stats["rounds"],
            "wall_sec": round(wall, 2),
            "mislabeled": bad,
        }))


if __name__ == "__main__":
    main()
