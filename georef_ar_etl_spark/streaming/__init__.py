"""Structured Streaming front-end for the CDC engine."""

from georef_ar_etl_spark.streaming.apply import (  # noqa: F401
    stream_apply,
    stream_apply_envelopes,
)
