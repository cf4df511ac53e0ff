"""Ingestion reliability: retry with exponential backoff, bounded-
buffer backpressure, dead-letter routing, and ingestion metrics.

Reference semantics (/root/reference/src/streaming/ingestion.rs):
`max_retries` / `retry_base_delay_ms` exponential backoff (:58-61),
`max_buffer_capacity` backpressure threshold with rejected-send
accounting (:54-55, :199-209, backpressure_events_total :395-396), and
the metrics block (:380-410).

Spark mapping: Structured Streaming owns task-level retry and source
offsets, so these wrappers operate at the foreachBatch boundary — the
one place user code runs and the reference's buffer lived:

- with_retry: re-runs the batch sink with exponential backoff;
  exhausted batches go to a dead-letter sink instead of killing the
  query (or re-raise, reference's error path).
- bounded_batch_sink: the backpressure analog — a micro-batch larger
  than `max_buffer_rows` is split into hash-bucketed chunks applied
  sequentially, so peak in-flight rows stay bounded no matter how far
  the source got ahead.  Chunk selection is a map-only hash filter
  (no global sort, no skew), and each oversize batch increments
  `backpressure_events_total` exactly like a rejected send.
- IngestionMetrics.suggest_rows_per_trigger: advisory for the Spark-
  native knob (maxOffsetsPerTrigger / maxFilesPerTrigger) — Spark
  sources, not sinks, are where sustained backpressure belongs.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RetryPolicy:
    """Exponential backoff (ingestion.rs:58-61 defaults)."""

    max_retries: int = 3
    base_delay_ms: int = 100
    multiplier: float = 2.0
    max_delay_ms: int = 10_000

    def delay_ms(self, attempt: int) -> float:
        return min(self.base_delay_ms * self.multiplier ** attempt,
                   self.max_delay_ms)


@dataclass
class IngestionMetrics:
    """Counters mirroring ingestion.rs:380-410 (single foreachBatch
    thread per query — plain ints are safe)."""

    records_total: int = 0
    batches_total: int = 0
    retries_total: int = 0
    backpressure_events_total: int = 0
    dead_letter_batches: int = 0
    last_batch_rows: int = 0
    last_batch_seconds: float = 0.0
    _recent_rows: list = field(default_factory=list)

    def observe_batch(self, rows: int, seconds: float) -> None:
        self.records_total += rows
        self.batches_total += 1
        self.last_batch_rows = rows
        self.last_batch_seconds = seconds
        self._recent_rows.append(rows)
        del self._recent_rows[:-16]

    def suggest_rows_per_trigger(self, max_buffer_rows: int) -> int | None:
        """Advisory source cap: when recent batches exceed the buffer
        bound, suggest throttling the source to the bound itself (set
        maxOffsetsPerTrigger / rowsPerSecond to this)."""
        if not self._recent_rows:
            return None
        if max(self._recent_rows) > max_buffer_rows:
            return max_buffer_rows
        return None


def dead_letter_sink(path: str):
    """Failed batches land as parquet under `path`/batch_id=N with the
    error message attached — replayable, and the stream keeps going."""

    def _dlq(batch_df: DataFrame, batch_id: int, err: Exception) -> None:
        (
            batch_df.withColumn("__error", F.lit(str(err)[:4096]))
            .withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("append").parquet(f"{path}/batch_id={batch_id}")
        )

    return _dlq


def with_retry(
    sink,
    policy: RetryPolicy | None = None,
    on_exhausted=None,
    metrics: IngestionMetrics | None = None,
    _sleep=time.sleep,
):
    """Wrap a foreachBatch sink with exponential-backoff retry.

    After `policy.max_retries` failures the batch goes to
    `on_exhausted(batch_df, batch_id, err)` (e.g. dead_letter_sink) if
    given, else the last error re-raises and Structured Streaming fails
    the query (the reference's error path)."""
    policy = policy or RetryPolicy()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        attempt = 0
        while True:
            try:
                sink(batch_df, batch_id)
                return
            except Exception as err:  # noqa: BLE001 — sink errors are data errors
                if attempt >= policy.max_retries:
                    if on_exhausted is not None:
                        if metrics is not None:
                            metrics.dead_letter_batches += 1
                        on_exhausted(batch_df, batch_id, err)
                        return
                    raise
                if metrics is not None:
                    metrics.retries_total += 1
                _sleep(policy.delay_ms(attempt) / 1000.0)
                attempt += 1

    return _sink


def bounded_batch_sink(
    sink,
    max_buffer_rows: int,
    id_col: str = "id",
    metrics: IngestionMetrics | None = None,
):
    """Backpressure at the sink: cap peak in-flight rows per apply.

    Every batch is cached and counted once (one sizing job, whose
    materialized cache the sink calls then reuse — the count is not
    thrown-away work).  A batch within the bound is applied as-is; an
    oversize batch is applied as ceil(n / max_buffer_rows)
    hash-bucketed chunks — deterministic, map-only selection
    (xxhash64(id) % n_chunks), each chunk a separate `sink` call so
    downstream memory (upsert shuffles, CDC event sequencing) is
    bounded by the buffer size, not by how far the source got ahead
    after an outage.

    The per-chunk bound is APPROXIMATE: hash bucketing averages
    n / n_chunks rows per chunk, but skewed or duplicated ids land in
    the same bucket and can exceed max_buffer_rows (an exact split
    would need a row_number sort — a full shuffle per batch, not worth
    it for a memory guard-rail)."""
    if max_buffer_rows <= 0:
        raise ValueError("max_buffer_rows must be positive")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        cached = batch_df.persist()
        try:
            n = cached.count()
            if n <= max_buffer_rows:
                sink(cached, batch_id)
                if metrics is not None:
                    metrics.observe_batch(n, time.perf_counter() - t0)
                return
            if metrics is not None:
                metrics.backpressure_events_total += 1
            n_chunks = math.ceil(n / max_buffer_rows)
            bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                            F.lit(n_chunks))
            for i in range(n_chunks):
                sink(cached.filter(bucket == i), batch_id)
        finally:
            cached.unpersist()
        if metrics is not None:
            metrics.observe_batch(n, time.perf_counter() - t0)

    return _sink


def reliable_ingest_sink(
    collection,
    max_buffer_rows: int = 100_000,
    policy: RetryPolicy | None = None,
    dead_letter_path: str | None = None,
    metrics: IngestionMetrics | None = None,
    id_col: str | None = None,
    order_col: str | None = None,
    _sleep=time.sleep,
):
    """The full reliability stack in reference default order: bounded
    backpressure around retry around the idempotent upsert sink.

    Retry wraps each CHUNK (inner), so one flaky chunk doesn't replay
    the whole oversize batch; chunk replays are idempotent through
    micro_batch_upsert's last-write-wins merge."""
    from needle_spark.streaming.ingestion import micro_batch_upsert

    base = micro_batch_upsert(collection, id_col=id_col, order_col=order_col)
    on_exhausted = dead_letter_sink(dead_letter_path) if dead_letter_path else None
    retried = with_retry(base, policy=policy, on_exhausted=on_exhausted,
                         metrics=metrics, _sleep=_sleep)
    return bounded_batch_sink(
        retried, max_buffer_rows,
        id_col=id_col or collection.id_col, metrics=metrics,
    )
