"""Tabular file ingest — the Ogr2ogrStep analogue (georef_ar_etl/
loaders.py:22-99) minus the geometry reprojection (out of scope per the
north rule): external CSV/JSON files become a staging DataFrame with an
enforced schema, and ``append`` mode unions per-file reads into one table
(the reference appends 24 per-province CSVs into one staging table,
streets.py:33-41).

Spark-first: the read IS the ingest — no subprocess, no intermediate
table; schema enforcement happens at scan time (malformed rows are routed
to a rescue column, never fatal — the quarantine philosophy applied to the
ingestion edge).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESCUE_COL = "_corrupt"


def read_csv_tables(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType,
    header: bool = True,
    source_col: str | None = "_source_file",
) -> DataFrame:
    """Read one or many CSV files under one enforced schema and union them
    (the append mode). Malformed rows land in ``_corrupt`` (PERMISSIVE mode)
    for quarantine-style handling instead of failing the load; an optional
    lineage column records which input file each row came from."""
    if not paths:
        raise ValueError("read_csv_tables: no input files given")
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(RESCUE_COL, T.StringType())]
    )
    parts = []
    for p in paths:
        df = (
            spark.read.schema(read_schema)
            .option("header", header)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", RESCUE_COL)
            .csv(p)
        )
        if source_col:
            df = df.withColumn(source_col, F.lit(p))
        parts.append(df)
    return reduce(lambda a, b: a.unionByName(b), parts)


def split_malformed(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_rescue_col, malformed_rows) — the ingest-side
    quarantine split.

    The PARSE is materialized once (eager localCheckpoint) and both sides
    split from the materialized rows. This is load-bearing, not a cache
    nicety: on a live CSV scan (a) plans whose only required column is the
    internal corrupt-record column are rejected by Spark, and (b) column
    pruning changes WHICH rows are malformed — a projection of the good
    side that skips the unparseable column re-parses nothing and lets the
    bad row through, so the same row appears on BOTH sides. Materializing
    the full parse fixes both; staging reads are bounded by design (this is
    the ingest edge, not the data plane).
    """
    snap = df.localCheckpoint(eager=True)
    good = snap.filter(F.col(RESCUE_COL).isNull()).drop(RESCUE_COL)
    bad = snap.filter(F.col(RESCUE_COL).isNotNull())
    return good, bad
