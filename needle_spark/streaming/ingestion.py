"""Structured Streaming ingestion + change streams.

Reference semantics (/root/reference/src/streaming/ingestion.rs):
micro-batches flushed by size (1000) or time (100 ms), dedup by vector
id (:62-63), exactly-once via offset checkpointing (:57-66, 271-335),
backpressure via buffer caps (:55-56), retry with backoff (:58-61).

The Spark mapping inverts the bookkeeping: Structured Streaming already
owns offsets, checkpoints, and redelivery, so exactly-once collapses to
"checkpointLocation + an idempotent foreachBatch sink".  Batch size /
flush interval map to trigger(processingTime) and source rate options;
backpressure to maxFilesPerTrigger / maxOffsetsPerTrigger; retry to
Spark task retry.  Change streams (stream_manager.rs:20, resume tokens
core.rs:290) are a readStream over the collection's append-only _cdc
directory — the file source tails new files, and "resume token" IS the
streaming checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_SCHEMA = (
    "sequence long, timestamp_ms long, event_type string, "
    "vector_id string, metadata string"
)


@dataclass
class IngestionConfig:
    """Mirrors IngestionConfig (ingestion.rs:49-86) in Spark terms."""

    batch_size: int = 1000            # -> maxFilesPerTrigger / rowsPerSecond caps
    flush_interval_ms: int = 100      # -> trigger(processingTime)
    dedup_by_id: bool = True          # -> dropDuplicates within batch
    checkpoint_dir: str | None = None  # -> exactly-once resume


# source-order columns probed (in order) when no explicit order_col is given
_ORDER_COL_CANDIDATES = ("sequence", "event_time", "timestamp_ms", "timestamp", "ts")


def micro_batch_upsert(collection, id_col: str | None = None,
                       order_col: str | None = None,
                       dedup_by_id: bool = True):
    """foreachBatch sink: dedup within the batch (last write wins, like
    the reference's buffer dedup ingestion.rs:62-63), then idempotently
    upsert into the collection.  Replaying the same batch after a crash
    converges to the same state -> exactly-once end-to-end.

    "Last" is defined by `order_col` (an event-time / sequence column;
    auto-detected from common names when unset).  Without one we fall
    back to monotonically_increasing_id(), which orders by PARTITION
    INDEX, not source arrival order — fine for single-partition batches
    (file sources), approximate for multi-partition ones."""
    ic = id_col or collection.id_col

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if dedup_by_id and ic in batch_df.columns:
            from pyspark.sql import Window

            oc = order_col
            if oc is None:
                oc = next((c for c in _ORDER_COL_CANDIDATES
                           if c in batch_df.columns), None)
            tagged = batch_df.withColumn("__ord", F.monotonically_increasing_id())
            keys = [F.col(oc).desc(), F.col("__ord").desc()] if oc else [
                F.col("__ord").desc()]
            w = Window.partitionBy(ic).orderBy(*keys)
            deduped = (
                tagged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__ord", "__rn")
            )
        else:
            deduped = batch_df
        collection.upsert(deduped)

    return _sink


def ingest_stream(
    stream_df: DataFrame,
    collection,
    config: IngestionConfig | None = None,
    available_now: bool = False,
):
    """Wire a streaming DataFrame into a collection.

    Returns the StreamingQuery.  `available_now=True` drains everything
    currently available then stops (used by tests and backfills)."""
    config = config or IngestionConfig()
    writer = stream_df.writeStream.foreachBatch(
        micro_batch_upsert(collection, dedup_by_id=config.dedup_by_id))
    if config.batch_size:
        # bound each micro-batch where the source supports it (file
        # sources; rate/kafka sources set their own caps at the reader)
        writer = writer.option("maxFilesPerTrigger", str(config.batch_size))
    if config.checkpoint_dir:
        writer = writer.option("checkpointLocation", config.checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{config.flush_interval_ms} milliseconds")
    return writer.start()


def file_source(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-drop ingestion source (the Spark analog of the reference's
    channel/SSE sources): new files in `path` become micro-batches."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


# ------------------------------------------------ push-handle sources ---
# Reference: ingestion.rs builds WebSocket (:433), Redis Streams (:652),
# Kafka (:691) and SSE (:730) on one generic PushHandleSource (:536-600):
# a bounded in-memory buffer an external consumer pushes IngestionRecords
# into, drained in batches, with acknowledged offsets handed back for
# external commit.  The Spark twin keeps the push/ack surface but drains
# through Structured Streaming: `flush()` spools the buffer as a JSONL
# file that `stream()` (a file source) picks up as the next micro-batch.
# Offsets/checkpoints then give exactly-once downstream for free.


class SourceClosed(RuntimeError):
    pass


@dataclass
class WebSocketSourceConfig:
    """WebSocketSourceConfig (ingestion.rs:435-449).  `host`/`port`
    additionally wire the Spark `socket` source stand-in (a WS endpoint
    sends text frames; the socket source consumes newline-framed text in
    tests and dev)."""

    buffer_capacity: int = 4096
    max_message_bytes: int = 16 * 1024 * 1024
    host: str = "localhost"
    port: int = 9999

    def source_name(self) -> str:
        return "websocket"


@dataclass
class RedisStreamSourceConfig:
    """RedisStreamSourceConfig (ingestion.rs:652-671)."""

    stream_key: str = "needle:vectors"
    consumer_group: str = "needle-ingest"
    consumer_name: str = "worker-0"
    buffer_capacity: int = 4096

    def source_name(self) -> str:
        return f"redis:{self.stream_key}"

    def options(self) -> dict[str, str]:
        """Options for the public spark-redis connector
        (`readStream.format("redis")`)."""
        return {
            "stream.keys": self.stream_key,
            "stream.group.name": self.consumer_group,
            "stream.consumer.prefix": self.consumer_name,
            "stream.read.batch.size": str(self.buffer_capacity),
        }


@dataclass
class SseSourceConfig:
    """SseSourceConfig (ingestion.rs:730-744): server-sent events with
    an optional event-type filter applied at the push boundary."""

    buffer_capacity: int = 4096
    event_type_filter: str | None = None

    def source_name(self) -> str:
        return "sse"


class PushSource:
    """Spark twin of PushHandleSource/PushHandle (ingestion.rs:536-623).

    The consumer thread (a WebSocket client, Redis XREADGROUP loop, or
    SSE subscriber) calls `push(record)`; `flush()` turns the buffered
    records into one spool file = one micro-batch for `stream()`.
    `push` enforces the reference's backpressure contract: buffer at
    capacity -> error (ingestion.rs:55-56), push after close ->
    "<label> source closed" (:607-609).  `acknowledge`/
    `drain_acknowledged` mirror the external-commit handshake (:617-622)
    — the caller acknowledges spooled batches once the downstream query
    has committed their checkpoint."""

    def __init__(self, config, spool_dir: str):
        import os

        self.config = config
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._buffer: list[dict] = []
        self._closed = False
        self._next_offset = 0
        self._spooled: list[int] = []
        self._acknowledged: list[int] = []
        self._label = type(config).__name__.replace("SourceConfig", "")

    def push(self, record: dict, event_type: str | None = None) -> int:
        import json

        if self._closed:
            raise SourceClosed(f"{self._label} source closed")
        if len(self._buffer) >= self.config.buffer_capacity:
            raise RuntimeError(
                f"{self._label} buffer at capacity "
                f"({self.config.buffer_capacity}) — backpressure")
        filt = getattr(self.config, "event_type_filter", None)
        if filt is not None and event_type != filt:
            return -1  # filtered out at the push boundary (SSE semantics)
        payload = json.dumps(record)
        max_bytes = getattr(self.config, "max_message_bytes", None)
        if max_bytes is not None and len(payload) > max_bytes:
            raise ValueError(
                f"message of {len(payload)} bytes exceeds "
                f"max_message_bytes={max_bytes}")
        self._buffer.append(record)
        off = self._next_offset
        self._next_offset += 1
        return off

    def flush(self) -> list[int]:
        """Spool the buffer as one micro-batch file; returns the offsets
        it covered (for acknowledge once the batch commits)."""
        import json
        import os
        import uuid

        if not self._buffer:
            return []
        n = len(self._buffer)
        offsets = list(range(self._next_offset - n, self._next_offset))
        path = os.path.join(self.spool_dir, f"batch-{uuid.uuid4().hex}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for r in self._buffer:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, path)  # atomic: the file source never sees partials
        self._buffer.clear()
        self._spooled.extend(offsets)
        return offsets

    def stream(self, spark: SparkSession, schema: str,
               max_files_per_trigger: int | None = None) -> DataFrame:
        return file_source(spark, self.spool_dir, schema,
                           max_files_per_trigger=max_files_per_trigger)

    def acknowledge(self, offsets: list[int]) -> None:
        self._acknowledged.extend(offsets)

    def drain_acknowledged(self) -> list[int]:
        out, self._acknowledged = self._acknowledged, []
        return out

    def close(self) -> None:
        self._closed = True


def websocket_source(spark: SparkSession, config: WebSocketSourceConfig,
                     load: bool = True):
    """Socket-source stand-in for a WebSocket endpoint (the reference's
    full WS implementation is likewise feature-gated behind its server,
    ingestion.rs:430-452).  load=False returns the configured reader."""
    reader = (spark.readStream.format("socket")
              .option("host", config.host).option("port", str(config.port)))
    if not load:
        return reader
    return reader.load()


def redis_stream_source(spark: SparkSession, config: RedisStreamSourceConfig,
                        load: bool = True):
    """Config-driven reader for the public spark-redis connector.
    load=False returns the configured reader (testable without the
    connector jar or a Redis server)."""
    reader = spark.readStream.format("redis")
    for k, v in config.options().items():
        reader = reader.option(k, v)
    if not load:
        return reader
    return reader.load()


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic source for throughput tests (rate source)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def change_stream(spark: SparkSession, collection, from_seq: int | None = None) -> DataFrame:
    """Streaming read of a collection's CDC log (change streams with
    resume — stream_manager.rs:20).  Offsets/checkpoints supersede the
    reference's resume tokens; `from_seq` additionally filters replayed
    history the way `cdc_events_since` does."""
    import os

    cdc_path = os.path.join(collection.path, "_cdc")
    os.makedirs(cdc_path, exist_ok=True)
    out = spark.readStream.schema(CDC_SCHEMA).parquet(cdc_path)
    if from_seq is not None:
        out = out.filter(F.col("sequence") >= from_seq)
    return out


def windowed_event_counts(
    stream_df: DataFrame,
    time_col: str = "event_time",
    key_col: str | None = "event_type",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event-time stream
    (extension beyond the reference — it has no event-time windows,
    SURVEY §2.9; flagged as such).  Late data beyond `watermark` is
    dropped and state is bounded."""
    keys = [F.window(F.col(time_col), window_duration)]
    if key_col:
        keys.append(F.col(key_col))
    return (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            *( [F.col(key_col)] if key_col else [] ),
            F.col("cnt"),
        )
    )


def streaming_dedup(
    stream_df: DataFrame,
    id_col: str = "id",
    time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup-by-id (ingestion.rs:62-63) — with a time column
    the dedup state is watermark-bounded (dropDuplicatesWithinWatermark)
    instead of growing forever."""
    if time_col:
        return stream_df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            [id_col]
        )
    return stream_df.dropDuplicates([id_col])


def replay_state(collection, upto_seq: int | None = None) -> DataFrame:
    """Reconstruct the id -> latest-payload state purely from the CDC
    log (event_log.rs replay): last event per id wins; deletes drop the
    id; a `clear` resets everything before it.

    Correctness contract (tested): replay_state(coll) ids ==
    coll.df() ids."""
    from pyspark.sql import Window

    ev = collection.cdc_events()
    if upto_seq is not None:
        ev = ev.filter(F.col("sequence") <= upto_seq)
    # apply the latest clear barrier
    clear_seq = ev.filter(F.col("event_type") == "clear").agg(F.max("sequence")).first()[0]
    if clear_seq is not None:
        ev = ev.filter(F.col("sequence") > clear_seq)
    w = Window.partitionBy("vector_id").orderBy(F.col("sequence").desc())
    last = (
        ev.filter(F.col("event_type").isin("insert", "upsert", "update", "delete"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return (
        last.filter(F.col("event_type") != "delete")
        .select(F.col("vector_id"), F.col("metadata"), F.col("sequence"))
    )
