"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` over bounded batches (the session caps
``arrow.maxRecordsPerBatch`` so a batch of blobs stays in memory).

Decoders are REAL for container formats that need no external codec lib —
the headers are parsed with ``struct``/numpy and features are computed on
the genuine raster/sample bytes:

* ``image/bmp`` — BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit
  BGR, bottom-up rows with 4-byte padding → width, height, pixel mean.
* ``audio/wav`` — RIFF/WAVE chunk walk, PCM16 → sample rate, duration, RMS.
* ``text/plain`` — byte stats straight off the payload.

Formats that require external codecs (JPEG/PNG/MP3/...) raise
``NotImplementedError`` at the decode boundary — an honest stub; the
surrounding Spark plumbing (schema, batching, dispatch) is identical for
them. ``encode_bmp``/``encode_wav`` generate real files deterministically
for tests and demos.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from georef_ar_etl_spark.functions.layout import spread_for_compute
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
    # image features (null for non-images)
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_mean", T.DoubleType()),
    # audio features (null for non-audio)
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    # per-row quarantine: a corrupt blob or unsupported codec must never
    # poison the batch (reference skips+reports invalid rows,
    # georef_ar_etl/transformers.py:96-101) — byte stats survive, decoded
    # features stay null, the reason lands here
    T.StructField("decode_error", T.StringType()),
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


# ------------------------------------------------------------ encoders
def encode_bmp(pixels: np.ndarray) -> bytes:
    """Real 24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array —
    pure struct/numpy, deterministic (test/demo data generator)."""
    h, w, _ = pixels.shape
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    raster = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    raster[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return header + info + raster.tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Real PCM16 mono WAV from an int16 sample array (test/demo data
    generator)."""
    samples = samples.astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


# ------------------------------------------------------------ decoders
def decode_bmp(payload: bytes) -> dict:
    """Parse the two BMP headers and compute raster stats on the real pixel
    bytes (uncompressed 24-bit only — the container-in-scope subset)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    row_size = (3 * w + 3) // 4 * 4
    raster = np.frombuffer(payload, dtype=np.uint8, count=row_size * abs(h), offset=data_offset)
    rows = raster.reshape(abs(h), row_size)[:, : 3 * w]
    return {"width": int(w), "height": int(abs(h)), "px_mean": round(float(rows.mean()), 6)}


def decode_wav(payload: bytes) -> dict:
    """Walk the RIFF chunks, decode PCM16 samples, compute rate/duration/RMS
    on the real sample values."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, bits, channels, samples = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + csize]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if not rate or not channels:
        raise ValueError("corrupt WAV fmt chunk: zero sample_rate/channels")
    n_frames = len(samples) // channels
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
    return {
        "sample_rate": int(rate),
        "duration_s": round(n_frames / rate, 6),
        "rms": round(rms, 6),
    }


def decode_media(payload: bytes, media_type: str) -> dict:
    """The codec boundary: dependency-free container decoders run on the
    genuine bytes; codec formats raise (no image/audio libs in this
    environment — the honest stub is the error, not fake data)."""
    if media_type == "image/bmp":
        return decode_bmp(payload)
    if media_type == "audio/wav":
        return decode_wav(payload)
    if media_type == "text/plain":
        return {}
    raise NotImplementedError(
        f"decode for {media_type!r} requires codec libs not present here"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_meta):
    byte stats for every payload plus per-modality decoded features
    (width/height/px_mean for BMP, rate/duration/rms for WAV).

    Decode failures are quarantined per row, not raised: a corrupt header,
    truncated raster, or unsupported codec yields null decoded features and
    the reason in ``decode_error`` while byte stats are still computed —
    one bad blob in 100 TB must not kill the job. The direct
    ``decode_media`` API keeps the hard raise for callers that want it.

    Byte stats (n_bytes/first_byte/byte_mean) are VECTORIZED across the
    Arrow batch — all payloads concatenate into one buffer, per-row sums
    come from one cumsum + offset-diff (the winnow_series flattened-buffer
    technique). The per-row Python loop runs only for rows whose modality
    actually decodes (BMP/WAV header walks are inherently per-blob); rows
    that don't (text at a multimodal table's scale is most of them) never
    enter Python row code."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            raws = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter((len(b) for b in raws), dtype=np.int64, count=n)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            flat = np.frombuffer(b"".join(raws), dtype=np.uint8)
            cs = np.zeros(flat.size + 1, dtype=np.int64)
            np.cumsum(flat, dtype=np.int64, out=cs[1:])
            sums = cs[offsets[1:]] - cs[offsets[:-1]]
            nonempty = lens > 0
            first = np.full(n, np.nan)
            first[nonempty] = flat[offsets[:-1][nonempty]]
            bmean = np.full(n, np.nan)
            bmean[nonempty] = np.round(sums[nonempty] / lens[nonempty], 6)

            mt = np.array([m["media_type"] for m in pdf["media_meta"]], dtype=object)
            dec = {
                k: np.full(n, np.nan)
                for k in ("width", "height", "px_mean", "sample_rate", "duration_s", "rms")
            }
            err = np.full(n, None, dtype=object)
            for i in np.flatnonzero(mt != "text/plain"):
                try:
                    d = decode_media(raws[i], mt[i])
                except (
                    ValueError,
                    NotImplementedError,
                    struct.error,
                    IndexError,
                    ZeroDivisionError,
                ) as e:
                    err[i] = f"{type(e).__name__}: {e}"
                else:
                    for k, v in d.items():
                        dec[k][i] = v
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "media_type": mt,
                "n_bytes": lens.astype("int32"),
                "first_byte": pd.Series(first).astype("Int32"),
                "byte_mean": bmean,
                "width": pd.Series(dec["width"]).astype("Int32"),
                "height": pd.Series(dec["height"]).astype("Int32"),
                "px_mean": dec["px_mean"],
                "sample_rate": pd.Series(dec["sample_rate"]).astype("Int32"),
                "duration_s": dec["duration_s"],
                "rms": dec["rms"],
                "decode_error": err,
            })

    # decode is per-row Python — spread regardless of file layout
    return spread_for_compute(df).mapInPandas(run, FEATURE_SCHEMA)
