"""Structured Streaming front-end for the CDC engine."""

from georef_ar_etl_spark.streaming.apply import stream_apply  # noqa: F401
