"""Row-level op cost points: predicate UPDATE / conditional MERGE vs the
equivalent change batch through apply_batch, on the same table shape.

The point being measured: `update_where` reads ONLY the predicate-matching
rows (zone-map pruned) and writes one MOR link per touched bucket — it
never shuffles an event batch, never runs validation/dedup, and its cost
scales with matches, not table size. `merge_into` adds one equi-join of
the bucket-pruned state against the source. `apply_batch` is the general
CDC path (digest pre-pass + validation + dedup + merge). All three land
the same final state here; the deltas are the machinery.

Run: spark-submit --py-files /tmp/engine.zip BENCH/rowops_ab.py [n_rows]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("rowops-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    import tempfile

    from georef_ar_etl_spark.engine import CdcEngine

    def fresh(root):
        initial = (
            spark.range(n_rows)
            .select(
                F.lpad(F.col("id").cast("string"), 13, "0").alias("doc_id"),
                F.sequence(
                    F.lit(1), (F.pmod(F.col("id"), 60) + F.lit(4)).cast("int")
                ).cast("array<int>").alias("tokens"),
                (F.pmod(F.col("id"), 60) + F.lit(4)).cast("int").alias("n_tok"),
                F.when(F.pmod(F.col("id"), 10) < 3, F.lit("wal"))
                .otherwise(F.lit("backfill"))
                .alias("source"),
            )
        )
        eng = CdcEngine(spark, root, n_buckets=32)
        eng.bootstrap(initial)
        return eng

    base = tempfile.mkdtemp(prefix="rowops_")
    out = {}

    # --- predicate UPDATE: touch the 30% 'wal' slice
    eng = fresh(base + "/upd")
    t0 = time.time()
    rep = eng.update_where(
        {"tokens": "concat(tokens, array(7))", "source": "'swept'"},
        [("source", "=", "wal")],
        batch_id=1,
    )
    out["update_where_s"] = round(time.time() - t0, 3)
    out["update_rows"] = rep["metrics"]["updated"]

    # --- equivalent change batch through apply_batch (same final state):
    # the caller must BUILD the batch (read matching rows) + the engine
    # validates/dedups/merges it
    eng2 = fresh(base + "/ab")
    t0 = time.time()
    matching = eng2.state().filter(F.col("source") == "wal")
    batch = matching.select(
        F.lit(0).cast("long").alias("batch_id"),
        F.monotonically_increasing_id().alias("seq"),
        F.lit("update").alias("op"),
        "doc_id",
        F.concat("tokens", F.array(F.lit(7))).alias("tokens"),
        (F.col("n_tok") + 1).alias("n_tok"),
        F.lit("swept").alias("source"),
    )
    eng2.apply_batch(batch, batch_id=1)
    out["apply_batch_equiv_s"] = round(time.time() - t0, 3)

    # --- conditional MERGE: 10% updates + 2% inserts + 1% deletes
    eng3 = fresh(base + "/mrg")
    src = (
        spark.range(int(n_rows * 0.13))
        .select(
            F.lpad(
                (F.col("id") * 104729 % int(n_rows * 1.02)).cast("string"),
                13, "0",
            ).alias("doc_id"),
            F.when(F.pmod(F.col("id"), 13) == 0, F.array().cast("array<int>"))
            .otherwise(F.sequence(F.lit(1), F.lit(3)).cast("array<int>"))
            .alias("tokens"),
            F.lit("m").alias("source"),
        )
        .dropDuplicates(["doc_id"])
    )
    t0 = time.time()
    rep3 = eng3.merge_into(
        src,
        batch_id=1,
        when_matched=[
            ("size(s_tokens) = 0", "delete", None),
            (None, "update", {"tokens": "concat(t_tokens, s_tokens)"}),
        ],
        when_not_matched=[("size(s_tokens) > 0", None)],
    )
    out["merge_into_s"] = round(time.time() - t0, 3)
    out["merge_counts"] = {
        k: rep3["metrics"][k] for k in ("inserted", "updated", "deleted")
    }

    # --- selective UPDATE on a source-CLUSTERED table: compaction sorted
    # and split files by `source`, so the predicate prunes FILES via the
    # per-file zone maps — the shape where the predicate path beats
    # building a change batch (cost scales with matches, not table size)
    eng4 = fresh(base + "/updc")
    eng4.compact(min_deltas=0, cluster_by=["source"], rows_per_file=4_000)
    t0 = time.time()
    rep4 = eng4.update_where(
        {"tokens": "concat(tokens, array(7))", "source": "'swept'"},
        [("source", "=", "wal")],
        batch_id=1,
    )
    out["update_where_clustered_s"] = round(time.time() - t0, 3)
    out["clustered_files_skipped"] = rep4["metrics"]["zonemap_files_skipped"]

    shutil.rmtree(base, ignore_errors=True)
    import json

    print(json.dumps({"n_rows": n_rows, **out}))


if __name__ == "__main__":
    main()
