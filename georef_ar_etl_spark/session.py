"""SparkSession factory tuned for the CDC-apply workload.

Design notes (100 TB posture):
* AQE on — runtime coalescing and skew-join splitting replace the reference's
  manual per-province partition loop (reference: intersections.py:29-40).
* Arrow on, with a bounded ``maxRecordsPerBatch`` — token arrays are large
  (up to 2048 int32 each ≈ 8 KiB/row), so unbounded Arrow batches would blow
  executor memory; 2048 rows/batch keeps a batch ≲ 16 MiB.
* ``spark.sql.shuffle.partitions`` defaults to the core count locally; on a
  real cluster this is set to ~2-3× total cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "georef_ar_etl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's standard configuration.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS]`` (default all cores), which is
    the sandbox stand-in for a multi-executor cluster; the same code runs
    unchanged under ``spark-submit --py-files`` against a real master.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    # Arrow/pandas workers churn tens of MB per task; with one worker per
    # core the default allocators hand pages back to the kernel on every
    # free (jemalloc madvise / glibc munmap) and the page-allocator lock
    # serializes the box — observed as 80-97% SYSTEM cpu at local[32].
    # Keep freed memory in-process instead. Routed via spark.executorEnv so
    # the python workers (forked by the JVM) actually inherit them.
    worker_env = {
        "ARROW_DEFAULT_MEMORY_POOL": "system",
        "MALLOC_MMAP_THRESHOLD_": "536870912",
        "MALLOC_TRIM_THRESHOLD_": "536870912",
    }

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # throughput GC: G1's concurrent barriers anti-scale on this workload
        # (KB-sized token arrays churned by 32 mutator threads measured 2×
        # slower than ParallelGC end-to-end)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # split/pack scans to ~2 tasks per core at sandbox data sizes —
        # the 128 MB default packs a bucketed state scan into 3-8 partitions
        # and caps every downstream stage's parallelism at that; on a real
        # cluster leave the default (files are 128 MB+ there)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "32m"),
        )
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # shuffle/spill scratch: a fast local device (tmpfs here, NVMe on a
        # real executor) — the CDC merge moves ~6 bytes of shuffle per payload
        # byte, so slow scratch serializes the whole pipeline
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-scratch"))
        .config("spark.ui.enabled", "false")
        # lz4_raw is pure-Java (aircompressor): snappy-java's JNI
        # GetPrimitiveArrayCritical sections serialize GC at high core counts
        # (GCLocker retries measured 3× whole-job slowdown at local[32])
        .config("spark.sql.parquet.compression.codec", "lz4_raw")
        # wide rows (KB token arrays): shuffled-hash beats sort-merge — no
        # sort of the payload; bucket layout bounds partition size, AQE
        # handles skew splits
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in worker_env.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
