"""Retry/backoff, bounded-buffer backpressure, dead-letter routing
(reference: src/streaming/ingestion.rs:54-61 config, :199-209 rejected
sends, :380-410 metrics)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.streaming.reliability import (
    IngestionMetrics,
    RetryPolicy,
    bounded_batch_sink,
    dead_letter_sink,
    reliable_ingest_sink,
    with_retry,
)


def test_retry_policy_backoff():
    p = RetryPolicy(max_retries=5, base_delay_ms=100, multiplier=2.0,
                    max_delay_ms=500)
    assert [p.delay_ms(i) for i in range(5)] == [100, 200, 400, 500, 500]


def test_with_retry_recovers(spark):
    calls, sleeps = [], []
    met = IngestionMetrics()

    def flaky(df, bid):
        calls.append(bid)
        if len(calls) < 3:
            raise RuntimeError("transient")

    sink = with_retry(flaky, RetryPolicy(max_retries=3, base_delay_ms=10),
                      metrics=met, _sleep=sleeps.append)
    sink(spark.range(1), 7)
    assert calls == [7, 7, 7]          # two failures, third attempt lands
    assert met.retries_total == 2
    assert sleeps == [0.01, 0.02]      # exponential backoff honored


def test_with_retry_exhausted_raises_without_dlq(spark):
    def broken(df, bid):
        raise RuntimeError("permanent")

    sink = with_retry(broken, RetryPolicy(max_retries=1, base_delay_ms=1),
                      _sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="permanent"):
        sink(spark.range(1), 0)


def test_with_retry_dead_letters_and_continues(spark, tmp_path):
    met = IngestionMetrics()
    dlq = str(tmp_path / "dlq")

    def broken(df, bid):
        raise RuntimeError("poison batch")

    sink = with_retry(broken, RetryPolicy(max_retries=1, base_delay_ms=1),
                      on_exhausted=dead_letter_sink(dlq), metrics=met,
                      _sleep=lambda s: None)
    sink(spark.createDataFrame([(1, "a")], "id long, v string"), 42)  # no raise
    assert met.dead_letter_batches == 1
    dead = spark.read.parquet(f"{dlq}/batch_id=42")
    rows = dead.collect()
    assert len(rows) == 1
    assert "poison batch" in rows[0]["__error"]
    assert rows[0]["__batch_id"] == 42


def test_bounded_batch_sink_chunks_oversize(spark):
    met = IngestionMetrics()
    seen = []

    def record(df, bid):
        seen.append([r["id"] for r in df.collect()])

    sink = bounded_batch_sink(record, max_buffer_rows=100, id_col="id",
                              metrics=met)
    batch = spark.range(350).select(F.col("id").cast("string").alias("id"))
    sink(batch, 1)
    assert len(seen) == 4                           # ceil(350/100) chunks
    flat = sorted(x for chunk in seen for x in chunk)
    assert flat == sorted(str(i) for i in range(350))  # disjoint + complete
    assert met.backpressure_events_total == 1
    assert met.records_total == 350 and met.batches_total == 1

    seen.clear()
    sink(spark.range(50).select(F.col("id").cast("string").alias("id")), 2)
    assert len(seen) == 1                           # within bound: one call
    assert met.backpressure_events_total == 1       # unchanged


def test_suggest_rows_per_trigger():
    met = IngestionMetrics()
    assert met.suggest_rows_per_trigger(1000) is None
    met.observe_batch(500, 0.1)
    assert met.suggest_rows_per_trigger(1000) is None
    met.observe_batch(5000, 0.9)
    assert met.suggest_rows_per_trigger(1000) == 1000


def test_reliable_ingest_end_to_end(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    coll = db.create_collection(
        "stream_target", dims=2,
        schema="id string, vector array<float>, sequence long",
    )
    src = tmp_path / "src"
    os.makedirs(src)
    rows = [{"id": f"r{i % 40}", "vector": [float(i), 1.0], "sequence": i}
            for i in range(120)]  # 3 versions per id; last write wins
    with open(src / "a.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    met = IngestionMetrics()
    sink = reliable_ingest_sink(
        coll, max_buffer_rows=25, metrics=met,
        dead_letter_path=str(tmp_path / "dlq"), _sleep=lambda s: None,
    )
    stream = (
        spark.readStream.schema("id string, vector array<float>, sequence long")
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)

    got = {r["id"]: r["sequence"] for r in coll.df().collect()}
    assert len(got) == 40
    # last-write-wins by the sequence order column across chunk replays
    assert all(got[f"r{i}"] == 80 + i for i in range(40))
    assert met.backpressure_events_total >= 1      # 120 rows > 25 bound
    assert met.dead_letter_batches == 0
    assert met.records_total == 120
