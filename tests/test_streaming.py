"""Streaming ingestion: file-source micro-batches, in-batch dedup,
exactly-once restart, change streams, CDC replay.

Mirrors the reference's ingestion/CDC contracts (ingestion.rs:49-86,
62-63 dedup, 57-66 exactly-once; event_log.rs replay; FIXTURES.md §6:
'replay from sequence s reproduces collection state', 'micro-batch
flush boundaries don't change final state')."""

import json
import os

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.streaming.ingestion import (
    IngestionConfig,
    change_stream,
    file_source,
    ingest_stream,
    replay_state,
)

SCHEMA = "id string, vector array<float>, category string"


@pytest.fixture()
def coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    return db.create_collection("stream_docs", dims=2, schema=SCHEMA)


def drop_file(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_file_ingestion_with_dedup_and_restart(spark, tmp_path, coll):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: includes an in-batch duplicate (id=a twice; last wins)
    drop_file(src, "b1.json", [
        {"id": "a", "vector": [1.0, 0.0], "category": "first"},
        {"id": "b", "vector": [0.0, 1.0], "category": "x"},
        {"id": "a", "vector": [0.5, 0.5], "category": "second"},
    ])
    q = ingest_stream(
        file_source(spark, src, SCHEMA),
        coll,
        IngestionConfig(checkpoint_dir=ckpt),
        available_now=True,
    )
    q.awaitTermination(120)
    assert coll.count() == 2
    assert coll.get("a")["category"] == "second"  # last write won

    # restart with the SAME checkpoint and no new files: exactly-once —
    # nothing is re-applied, version does not advance
    v = coll.version
    q2 = ingest_stream(
        file_source(spark, src, SCHEMA), coll,
        IngestionConfig(checkpoint_dir=ckpt), available_now=True,
    )
    q2.awaitTermination(120)
    assert coll.version == v

    # new file arrives -> only it is processed (upsert semantics)
    drop_file(src, "b2.json", [
        {"id": "a", "vector": [9.0, 9.0], "category": "third"},
        {"id": "c", "vector": [1.0, 1.0], "category": "x"},
    ])
    q3 = ingest_stream(
        file_source(spark, src, SCHEMA), coll,
        IngestionConfig(checkpoint_dir=ckpt), available_now=True,
    )
    q3.awaitTermination(120)
    assert coll.count() == 3
    assert coll.get("a")["category"] == "third"


def test_upsert_last_write_wins_by_sequence(spark, coll):
    """Multi-partition batches honor an explicit sequence column for
    last-write-wins (ADVICE r1: monotonically_increasing_id orders by
    partition index, not arrival order)."""
    from needle_spark.streaming.ingestion import micro_batch_upsert

    # arrange partitions so partition order CONTRADICTS sequence order:
    # the seq=1 row sits in a later partition than the seq=2 row
    batch = spark.createDataFrame(
        [("a", [9.0, 9.0], "newest", 2)], SCHEMA + ", sequence long"
    ).repartition(1).unionAll(
        spark.createDataFrame(
            [("a", [1.0, 1.0], "stale", 1)], SCHEMA + ", sequence long"
        ).repartition(1)
    )
    micro_batch_upsert(coll)(batch, 0)  # auto-detects the sequence column
    assert coll.get("a")["category"] == "newest"


def test_change_stream_tails_cdc(spark, tmp_path, coll):
    rows = spark.createDataFrame(
        [("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y")], SCHEMA
    )
    coll.insert(rows, now_ms=1000)
    out = str(tmp_path / "events_out")
    q = (
        change_stream(spark, coll)
        .writeStream.format("memory").queryName("cdc_mem")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cdc_mem ORDER BY sequence").collect()
    assert [r["event_type"] for r in got] == ["insert", "insert"]
    payload = json.loads(got[0]["metadata"])
    assert payload == {"category": "x"}
    # resume filter
    q2 = (
        change_stream(spark, coll, from_seq=1)
        .writeStream.format("memory").queryName("cdc_mem2")
        .option("checkpointLocation", str(tmp_path / "o2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM cdc_mem2").first()["c"] == 1


def test_replay_reproduces_state(spark, coll):
    mk = lambda items: spark.createDataFrame(items, SCHEMA)
    coll.insert(mk([("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y")]), now_ms=1)
    coll.upsert(mk([("a", [0.9, 0.1], "x2"), ("c", [1.0, 1.0], "z")]), now_ms=2)
    coll.delete(ids=["b"], now_ms=3)
    state = {r["vector_id"]: json.loads(r["metadata"]) for r in replay_state(coll).collect()}
    assert set(state) == {"a", "c"}
    assert state["a"] == {"category": "x2"}
    # replay as-of an earlier sequence: before the delete (seqs 0..3)
    partial = {r["vector_id"] for r in replay_state(coll, upto_seq=3).collect()}
    assert partial == {"a", "b", "c"}
    # state ids always match the materialized collection
    assert set(state) == {r["id"] for r in coll.df().select("id").collect()}


def test_replay_respects_clear(spark, coll):
    mk = lambda items: spark.createDataFrame(items, SCHEMA)
    coll.insert(mk([("a", [1.0, 0.0], "x")]), now_ms=1)
    coll.clear(now_ms=2)
    coll.insert(mk([("z", [0.0, 1.0], "y")]), now_ms=3)
    state = {r["vector_id"] for r in replay_state(coll).collect()}
    assert state == {"z"}


# ------------------------------------------------ push-handle sources ---

def test_push_sources_end_to_end(spark, tmp_path, coll):
    """WebSocket/Redis/SSE push-handle sources (ingestion.rs:433,652,730)
    wired through ingest_stream: push -> flush (spool micro-batch) ->
    stream -> collection state converges; ack handshake round-trips."""
    from needle_spark.streaming.ingestion import (
        PushSource,
        RedisStreamSourceConfig,
        SourceClosed,
        SseSourceConfig,
        WebSocketSourceConfig,
    )

    src = PushSource(WebSocketSourceConfig(buffer_capacity=8),
                     str(tmp_path / "ws_spool"))
    src.push({"id": "w1", "vector": [1.0, 0.0], "category": "ws"})
    src.push({"id": "w2", "vector": [0.0, 1.0], "category": "ws"})
    src.push({"id": "w1", "vector": [1.0, 0.0], "category": "ws2"})  # dedup: last wins
    offsets = src.flush()
    assert offsets == [0, 1, 2]
    q = ingest_stream(
        src.stream(spark, SCHEMA), coll,
        IngestionConfig(checkpoint_dir=str(tmp_path / "ws_ckpt")),
        available_now=True,
    )
    q.awaitTermination(120)
    state = {r["id"]: r["category"] for r in coll.df().collect()}
    assert state == {"w1": "ws2", "w2": "ws"}
    src.acknowledge(offsets)
    assert src.drain_acknowledged() == [0, 1, 2]
    assert src.drain_acknowledged() == []  # drained

    src.close()
    with pytest.raises(SourceClosed, match="WebSocket source closed"):
        src.push({"id": "late"})


def test_push_source_backpressure_and_limits(tmp_path):
    from needle_spark.streaming.ingestion import (
        PushSource,
        SseSourceConfig,
        WebSocketSourceConfig,
    )

    ws = PushSource(WebSocketSourceConfig(buffer_capacity=2, max_message_bytes=64),
                    str(tmp_path / "bp_spool"))
    ws.push({"id": "a"})
    with pytest.raises(ValueError, match="max_message_bytes"):
        ws.push({"id": "b", "blob": "x" * 200})
    ws.push({"id": "b"})
    with pytest.raises(RuntimeError, match="backpressure"):
        ws.push({"id": "c"})
    assert ws.flush() and ws.push({"id": "c"}) >= 0  # capacity freed by flush

    sse = PushSource(SseSourceConfig(event_type_filter="vector.insert"),
                     str(tmp_path / "sse_spool"))
    assert sse.push({"id": "s1"}, event_type="vector.insert") == 0
    assert sse.push({"id": "s2"}, event_type="heartbeat") == -1  # filtered
    assert sse.flush() == [0]


def test_source_config_readers(spark):
    """Config -> reader builders are constructible without servers or
    connector jars (load=False), and option mappings are faithful."""
    from needle_spark.streaming.ingestion import (
        RedisStreamSourceConfig,
        WebSocketSourceConfig,
        redis_stream_source,
        websocket_source,
    )

    assert websocket_source(
        spark, WebSocketSourceConfig(host="h1", port=7777), load=False) is not None
    cfg = RedisStreamSourceConfig(stream_key="k:1", consumer_group="g",
                                  consumer_name="c0", buffer_capacity=512)
    opts = cfg.options()
    assert opts == {
        "stream.keys": "k:1",
        "stream.group.name": "g",
        "stream.consumer.prefix": "c0",
        "stream.read.batch.size": "512",
    }
    assert cfg.source_name() == "redis:k:1"
    assert redis_stream_source(spark, cfg, load=False) is not None


def test_sse_redis_push_through_pipeline(spark, tmp_path, coll):
    """Redis/SSE configs drive the same PushSource spool path through
    ingest_stream (5 source families total with file/rate/kafka)."""
    from needle_spark.streaming.ingestion import (
        PushSource,
        RedisStreamSourceConfig,
        SseSourceConfig,
    )

    redis = PushSource(RedisStreamSourceConfig(), str(tmp_path / "r_spool"))
    redis.push({"id": "r1", "vector": [0.3, 0.7], "category": "redis"})
    redis.flush()
    q = ingest_stream(redis.stream(spark, SCHEMA), coll,
                      IngestionConfig(checkpoint_dir=str(tmp_path / "r_ckpt")),
                      available_now=True)
    q.awaitTermination(120)

    sse = PushSource(SseSourceConfig(event_type_filter="doc"),
                     str(tmp_path / "s_spool"))
    sse.push({"id": "s1", "vector": [0.9, 0.1], "category": "sse"}, event_type="doc")
    sse.push({"id": "sX", "vector": [0.0, 0.0], "category": "nope"}, event_type="other")
    sse.flush()
    q = ingest_stream(sse.stream(spark, SCHEMA), coll,
                      IngestionConfig(checkpoint_dir=str(tmp_path / "s_ckpt")),
                      available_now=True)
    q.awaitTermination(120)

    state = {r["id"]: r["category"] for r in coll.df().collect()}
    assert state["r1"] == "redis" and state["s1"] == "sse"
    assert "sX" not in state
