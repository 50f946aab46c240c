"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` over bounded batches (the session caps
``arrow.maxRecordsPerBatch`` so a batch of blobs stays in memory).

The actual codec step is STUBBED (no image/audio libs in this container):
``decode_stub`` raises ``NotImplementedError`` unless ``fake=True``, in which
case it produces deterministic fake features from the bytes — the Spark-side
schema, partitioning, UDF signature, and batch shape are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("byte_mean", T.DoubleType()),
])


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo source: wrap a column as an opaque binary payload + metadata
    struct (in production the payload arrives as real image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).cast("int").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes, fake: bool) -> np.ndarray:
    """The codec boundary. Real implementation would call PIL/av/soundfile —
    not available here, so it is STUBBED."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this "
            "container; run with fake=True for the deterministic stub"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_meta).

    Deterministic fake features (n_bytes, first_byte, byte_mean) stand in for
    real decoded features; the plumbing (mapInPandas, bounded Arrow batches,
    schema) is production-shaped.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["media_meta"]):
                arr = decode_stub(bytes(payload), fake)
                feats.append(
                    (
                        doc_id,
                        meta["media_type"],
                        int(arr.size),
                        int(arr[0]) if arr.size else None,
                        round(float(arr.mean()), 6) if arr.size else None,
                    )
                )
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, FEATURE_SCHEMA)
