"""A/B: IVF probe over float vectors vs int8-quantized codes.

Measures what quantization actually buys at probe time: both variants are
the same fused mapInPandas scan (assignment + probe filter + cosine); the
only difference is the bytes read — float32 vectors vs int8 codes + one
scale double (~4x less). Codes are PRE-MATERIALIZED to parquet (the
production model: you quantize at ingest, not per query), so the timing
isolates the probe.

Protocol: alternating pairs, best-of-N (this box shows ±2x run-to-run
noise — single trials are meaningless, BENCH/BASELINE.md).

Usage: python BENCH/quant_probe_ab.py [n_vectors] [dim] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from georef_ar_etl_spark.operators import similarity
from georef_ar_etl_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    root = os.environ.get(
        "BENCH_TABLE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    )
    fdir = os.path.join(root, "quant_ab_float")
    qdir = os.path.join(root, "quant_ab_codes")

    spark = get_spark(app_name="quant_probe_ab")
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    # generate in Spark (mapInPandas, seeded per partition) to avoid a
    # driver-side gigabyte collect
    nparts = 32

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for pid in pdf["id"].to_numpy():
                r = np.random.RandomState(1000 + int(pid))
                cnt = n // nparts
                base = int(pid) * cnt
                V = r.randn(cnt, dim).astype(np.float32)
                yield pd.DataFrame({
                    "vec_id": np.arange(base, base + cnt, dtype=np.int64),
                    "embedding": list(V),
                })

    src = (
        spark.range(nparts).toDF("id").repartition(nparts)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )
    src.write.mode("overwrite").parquet(fdir)
    emb = spark.read.parquet(fdir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    similarity.quantize_embeddings(emb).select("vec_id", "q_scale", "q").write.mode(
        "overwrite"
    ).parquet(qdir)

    centroids = similarity.ivf_index(emb, n_clusters=16, n_iter=5, seed=7)
    qv = [float(x) for x in rng.randn(dim)]

    femb = spark.read.parquet(fdir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qemb = spark.read.parquet(qdir)

    def run_float():
        similarity.ivf_topk(femb, qv, centroids, k=10, nprobe=4).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_quant():
        similarity.ivf_topk_quantized(qemb, qv, centroids, k=10, nprobe=4).write.mode(
            "overwrite"
        ).format("noop").save()

    # warmup both once (JIT, Python workers, page cache)
    run_float()
    run_quant()
    ft, qt = [], []
    for _ in range(trials):  # alternating pairs
        t0 = time.time(); run_float(); ft.append(time.time() - t0)
        t0 = time.time(); run_quant(); qt.append(time.time() - t0)

    def dbytes(d):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _dd, fs in os.walk(d) for f in fs if f.endswith(".parquet")
        )

    out = {
        "n_vectors": n, "dim": dim, "trials": trials,
        "float_bytes": dbytes(fdir), "code_bytes": dbytes(qdir),
        "bytes_ratio": round(dbytes(fdir) / dbytes(qdir), 2),
        "float_best_sec": round(min(ft), 3), "float_trials": [round(t, 3) for t in ft],
        "quant_best_sec": round(min(qt), 3), "quant_trials": [round(t, 3) for t in qt],
        "speedup_best": round(min(ft) / min(qt), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
