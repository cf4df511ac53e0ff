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
