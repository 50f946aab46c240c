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

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
