"""Multimodal (image/audio/video) column support for training-data
pipelines.

Design: media rides as an opaque `binary` column plus a typed metadata
struct — the same convention as large-scale multimodal datasets
(WebDataset/Parquet blobs).  All Spark-side plumbing (schemas,
partition-size control, Arrow batch shape, UDF signatures) is real and
tested; the actual codec calls (image decode, audio resample, frame
extraction) are STUBBED behind `NotImplementedError` or a
deterministic fake because media libraries are not available in this
environment — swap `_decode_image_impl` etc. for Pillow/ffmpeg calls in
production.

Scale notes:
- blobs make rows big: keep `spark.sql.files.maxPartitionBytes` in mind
  and use `media_repartition` to bound decoded-batch memory;
- decode is mapInPandas so one Arrow batch of blobs is decoded per
  python invocation — batch size is controlled by
  spark.sql.execution.arrow.maxRecordsPerBatch, not row count
  assumptions in the UDF.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])


def make_media_df(spark, rows) -> DataFrame:
    """rows: (media_id, kind, mime, bytes, (w, h, dur, sr)) tuples."""
    return spark.createDataFrame(
        [(i, k, m, d, meta) for i, k, m, d, meta in rows], MEDIA_SCHEMA
    )


def media_repartition(df: DataFrame, target_bytes_per_partition: int = 128 << 20,
                      data_col: str = "data") -> DataFrame:
    """Bound decode-batch memory by BLOB BYTES (row count is the wrong
    proxy when blob sizes vary 1000x): one pass sums `length(data)`,
    then repartitions so each partition carries ~target bytes.  The
    sizing job reads only the blob-length column statistics-style scan,
    not the decoded content."""
    total = df.select(
        F.sum(F.coalesce(F.length(F.col(data_col)), F.lit(0))).alias("b")
    ).first()["b"] or 0
    parts = max(1, int((total + target_bytes_per_partition - 1)
                       // target_bytes_per_partition))
    return df.repartition(parts)


# --------------------------------------------------------- stubs -----

def _decode_image_impl(data: bytes, mime: str) -> np.ndarray:
    """STUB: replace with Pillow/turbojpeg. Deterministic fake: derives a
    4x4 gray image from the blob hash so pipelines are testable."""
    import zlib

    h = zlib.crc32(data)
    return np.full((4, 4), h % 256, dtype=np.uint8)


def _audio_samples_impl(data: bytes, mime: str) -> np.ndarray:
    """STUB: replace with soundfile/ffmpeg decode."""
    raise NotImplementedError("audio decode requires ffmpeg/soundfile")


# ------------------------------------------------------- operators ---

def image_features(
    df: DataFrame,
    data_col: str = "data",
    mime_col: str = "mime",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode images and emit per-image features (mean/std intensity +
    dims).  Real mapInPandas plumbing; decode is the stub above."""
    schema = T.StructType([
        T.StructField(id_col, T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("decoded_h", T.IntegerType()),
        T.StructField("decoded_w", T.IntegerType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "mean_intensity": [], "std_intensity": [],
                   "decoded_h": [], "decoded_w": []}
            for mid, blob, mime in zip(pdf[id_col], pdf[data_col], pdf[mime_col]):
                img = _decode_image_impl(bytes(blob), mime)
                out[id_col].append(mid)
                out["mean_intensity"].append(float(img.mean()))
                out["std_intensity"].append(float(img.std()))
                out["decoded_h"].append(int(img.shape[0]))
                out["decoded_w"].append(int(img.shape[1]))
            yield pd.DataFrame(out)

    return df.select(id_col, data_col, mime_col).mapInPandas(kernel, schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Expand each video row into (media_id, frame_ts_ms) sampling rows —
    the explode side of frame extraction is pure Spark (sequence +
    explode); actual frame decode would join this plan against the blob
    via the stubbed decoder."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Blob-size/meta profile per kind — pure relational, no decode."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.length("data")).alias("total_bytes"),
            F.min(F.length("data")).alias("min_bytes"),
            F.max(F.length("data")).alias("max_bytes"),
            F.avg("meta.duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
