"""Multimodal (image/audio/video) column support for training-data
pipelines.

Design: media rides as an opaque `binary` column plus a typed metadata
struct — the same convention as large-scale multimodal datasets
(WebDataset/Parquet blobs).  All Spark-side plumbing (schemas,
partition-size control, Arrow batch shape, UDF signatures) is real and
tested; the actual codec calls (image decode, audio resample, frame
extraction) are STUBBED behind `NotImplementedError` or a
deterministic fake because media libraries are not available in this
environment.  Codecs are PLUGGABLE: operators resolve their decode
function from `DEFAULT_CODECS` (a priority registry) at plan-build
time, so production swaps in Pillow/soundfile/ffmpeg without touching
any operator — either automatically (`probe_codecs()` registers real
implementations for whatever imports cleanly) or explicitly
(`DEFAULT_CODECS.register("image_decode", my_fn, "mylib", priority=20)`).
The deterministic fakes stay registered at priority 0 as the fallback.

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


# ----------------------------------------------------- codec registry

class CodecRegistry:
    """Priority registry mapping an operation name ("image_decode",
    "audio_decode", ...) to decode callables `(bytes, mime) -> ndarray`.

    Spark contract: `resolve()` runs on the DRIVER at plan-build time
    and the returned function is captured in the UDF closure, so it
    must be a module-level (picklable) function; heavy imports belong
    INSIDE the function body so executors import them lazily.  The
    registry object itself never ships to executors."""

    def __init__(self) -> None:
        self._ops: dict[str, list[tuple[int, str, object]]] = {}

    def register(self, op: str, fn, provider: str, priority: int = 0) -> None:
        entries = [e for e in self._ops.get(op, []) if e[1] != provider]
        entries.append((priority, provider, fn))
        entries.sort(key=lambda e: -e[0])
        self._ops[op] = entries

    def unregister(self, op: str, provider: str) -> None:
        self._ops[op] = [e for e in self._ops.get(op, [])
                         if e[1] != provider]

    def resolve(self, op: str):
        """Highest-priority codec for `op` (ties: latest registration)."""
        entries = self._ops.get(op)
        if not entries:
            raise KeyError(f"no codec registered for {op!r}")
        return entries[0][2]

    def providers(self, op: str) -> list[str]:
        return [provider for _, provider, _ in self._ops.get(op, [])]


def _decode_image_fake(data: bytes, mime: str) -> np.ndarray:
    """Deterministic fake (priority-0 fallback): derives a 4x4 gray
    image from the blob hash so pipelines are testable end-to-end
    without Pillow."""
    import zlib

    h = zlib.crc32(data)
    return np.full((4, 4), h % 256, dtype=np.uint8)


def _decode_audio_stub(data: bytes, mime: str) -> np.ndarray:
    """Priority-0 fallback: audio has no meaningful deterministic fake
    (sample streams feed DSP downstream), so absent a real codec this
    raises instead of fabricating samples."""
    raise NotImplementedError(
        "audio decode requires a registered codec (soundfile/ffmpeg); "
        "run probe_codecs() or DEFAULT_CODECS.register('audio_decode', ...)")


def _decode_image_pillow(data: bytes, mime: str) -> np.ndarray:
    import io

    from PIL import Image  # noqa: executor-side lazy import

    return np.asarray(Image.open(io.BytesIO(data)))


def _decode_audio_soundfile(data: bytes, mime: str) -> np.ndarray:
    import io

    import soundfile  # noqa: executor-side lazy import

    samples, _sr = soundfile.read(io.BytesIO(data))
    return np.asarray(samples, dtype=np.float32)


DEFAULT_CODECS = CodecRegistry()
DEFAULT_CODECS.register("image_decode", _decode_image_fake, "fake", 0)
DEFAULT_CODECS.register("audio_decode", _decode_audio_stub, "stub", 0)


def probe_codecs(registry: CodecRegistry | None = None) -> dict[str, str]:
    """Register real codecs for every media library that imports
    cleanly (call once at startup in production; harmless when nothing
    is installed).  Returns {operation: provider} for what was wired."""
    reg = registry if registry is not None else DEFAULT_CODECS
    wired: dict[str, str] = {}
    try:
        import PIL  # noqa: F401
        reg.register("image_decode", _decode_image_pillow, "pillow", 10)
        wired["image_decode"] = "pillow"
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401
        reg.register("audio_decode", _decode_audio_soundfile, "soundfile", 10)
        wired["audio_decode"] = "soundfile"
    except ImportError:
        pass
    return wired


# ------------------------------------------------------- operators ---

def image_features(
    df: DataFrame,
    data_col: str = "data",
    mime_col: str = "mime",
    id_col: str = "media_id",
    codec=None,
) -> DataFrame:
    """Decode images and emit per-image features (mean/std intensity +
    dims).  Real mapInPandas plumbing; decode comes from the codec
    registry (deterministic fake unless a real one is registered)."""
    decode = codec if codec is not None else DEFAULT_CODECS.resolve(
        "image_decode")
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
                img = decode(bytes(blob), mime)
                out[id_col].append(mid)
                out["mean_intensity"].append(float(img.mean()))
                out["std_intensity"].append(float(img.std()))
                out["decoded_h"].append(int(img.shape[0]))
                out["decoded_w"].append(int(img.shape[1]))
            yield pd.DataFrame(out)

    return df.select(id_col, data_col, mime_col).mapInPandas(kernel, schema)


def audio_features(
    df: DataFrame,
    data_col: str = "data",
    mime_col: str = "mime",
    id_col: str = "media_id",
    codec=None,
) -> DataFrame:
    """Decode audio and emit per-clip sample stats (n_samples, RMS,
    peak).  Same registry contract as image_features: with only the
    default stub registered this raises NotImplementedError AT
    EXECUTION (the plan builds fine), which is the honest sandbox
    behavior — register a soundfile/ffmpeg codec to light it up."""
    decode = codec if codec is not None else DEFAULT_CODECS.resolve(
        "audio_decode")
    schema = T.StructType([
        T.StructField(id_col, T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "n_samples": [], "rms": [], "peak": []}
            for mid, blob, mime in zip(pdf[id_col], pdf[data_col], pdf[mime_col]):
                samples = np.asarray(
                    decode(bytes(blob), mime), dtype=np.float64).ravel()
                out[id_col].append(mid)
                out["n_samples"].append(int(samples.size))
                out["rms"].append(
                    float(np.sqrt(np.mean(samples ** 2))) if samples.size else 0.0)
                out["peak"].append(
                    float(np.abs(samples).max()) if samples.size else 0.0)
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
