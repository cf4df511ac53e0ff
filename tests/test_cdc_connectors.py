"""External CDC connectors: Debezium/Mongo envelope parsing (pure
expression transforms), the set-wise apply bridge, Kafka option wiring,
and CdcPosition resume-token parity.

The envelope fixtures replay through the EXACT production path
(parse -> apply_change_events via foreachBatch) with only the source
swapped for the file source — mirrors cdc/debezium.rs parse_value,
kafka.rs KafkaConnectorConfig, mongodb.rs envelope, mod.rs:59-140
CdcPosition, :384 change_event_to_ingest."""

import json
import os

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.streaming.cdc import (
    CdcError,
    CdcPosition,
    KafkaSourceConfig,
    PostgresCdcConfig,
    PulsarSourceConfig,
    cdc_pipeline,
    kafka_source,
    parse_debezium,
    parse_mongo_change,
    parse_pgoutput,
    pulsar_source,
)
from needle_spark.streaming.ingestion import file_source

DOC_SCHEMA = "id string, vector array<double>, category string"


def dbz(op, after=None, before=None, table="docs", ts=0, wrap=True, key=None):
    payload = {"op": op, "ts_ms": ts, "source": {"table": table}}
    if after is not None:
        payload["after"] = after
    if before is not None:
        payload["before"] = before
    if key is not None:
        payload["key"] = key
    return {"payload": payload} if wrap else payload


def drop_lines(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"value": json.dumps(r)}) + "\n")


@pytest.fixture()
def coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    return db.create_collection("docs", dims=2, schema=DOC_SCHEMA)


def test_parse_debezium_envelope(spark):
    rows = [
        dbz("c", after={"id": "a", "category": "x"}, ts=1),
        dbz("u", after={"id": "a", "category": "y"},
            before={"id": "a", "category": "x"}, ts=2, wrap=False),
        dbz("d", before={"id": "a", "category": "y"}, ts=3),
        dbz("r", after={"_id": "snap1"}, ts=4),     # snapshot read -> insert
        dbz("t", ts=5),                              # truncate
        {"payload": {"op": "zz", "ts_ms": 6}},       # unknown op -> NULL
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")
    got = parse_debezium(df, collection_mapping={"docs": "documents"}).collect()
    assert [r["operation"] for r in got] == [
        "insert", "update", "delete", "insert", "truncate", None]
    assert got[0]["collection"] == "documents"  # table mapping applied
    assert got[0]["document_key"] == "a"
    assert got[2]["document_key"] == "a"        # delete key from before-doc
    assert got[3]["document_key"] == "snap1"    # _id fallback
    assert json.loads(got[1]["after"]) == {"id": "a", "category": "y"}
    assert [r["ts_ms"] for r in got[:5]] == [1, 2, 3, 4, 5]


def test_parse_mongo_envelope(spark):
    rows = [
        {"operationType": "insert", "ns": {"coll": "docs"},
         "documentKey": {"_id": "m1"}, "clusterTime": 10,
         "fullDocument": {"_id": "m1", "v": 1}},
        {"operationType": "replace", "ns": {"coll": "docs"},
         "documentKey": {"_id": "m1"}, "wallTime": 20,
         "fullDocument": {"_id": "m1", "v": 2}},
        {"operationType": "delete", "ns": {"coll": "docs"},
         "documentKey": {"_id": "m1"}, "clusterTime": 30},
        {"operationType": "drop", "ns": {"coll": "docs"}, "clusterTime": 40},
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")
    got = parse_mongo_change(df).collect()
    assert [r["operation"] for r in got] == ["insert", "update", "delete", "truncate"]
    assert got[0]["document_key"] == "m1"
    assert got[1]["ts_ms"] == 20
    assert json.loads(got[1]["after"]) == {"_id": "m1", "v": 2}


def test_debezium_file_replay_converges(spark, tmp_path, coll):
    """File-simulated Debezium envelopes through the production
    pipeline converge to the oracle state (insert, update, delete,
    out-of-order same-key events compacted last-write-wins)."""
    src = str(tmp_path / "envelopes")
    drop_lines(src, "b1.json", [
        dbz("c", after={"id": "a", "vector": [1.0, 0.0], "category": "first"}, ts=1),
        dbz("c", after={"id": "b", "vector": [0.0, 1.0], "category": "keep"}, ts=2),
        dbz("u", after={"id": "a", "vector": [1.0, 0.0], "category": "second"}, ts=3),
        dbz("c", after={"id": "c", "vector": [1.0, 1.0], "category": "doomed"}, ts=4),
        dbz("d", before={"id": "c"}, ts=5),
    ])
    q = cdc_pipeline(
        file_source(spark, src, "value string"),
        coll, DOC_SCHEMA, parser="debezium",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    state = {r["id"]: r["category"] for r in coll.df().collect()}
    assert state == {"a": "second", "b": "keep"}

    # second batch: truncate barrier then fresh insert
    drop_lines(src, "b2.json", [
        dbz("t", ts=10),
        dbz("c", after={"id": "z", "vector": [0.5, 0.5], "category": "fresh"}, ts=11),
    ])
    q = cdc_pipeline(
        file_source(spark, src, "value string"),
        coll, DOC_SCHEMA, parser="debezium",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    assert {r["id"] for r in coll.df().collect()} == {"z"}


def test_kafka_source_config(spark):
    cfg = KafkaSourceConfig(
        brokers=["k1:9092", "k2:9092"], topic="dbserver.public.docs",
        group_id="g1", security_protocol="SASL_SSL",
        sasl_mechanism="PLAIN", sasl_username="u", sasl_password="p",
        offset_reset="latest",
    )
    opts = cfg.options()
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert opts["subscribe"] == "dbserver.public.docs"
    assert opts["startingOffsets"] == "latest"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert "PlainLoginModule" in opts["kafka.sasl.jaas.config"]
    assert opts["maxOffsetsPerTrigger"] == "100"  # CdcConfig.batch_size
    # reader wiring is constructible without a broker
    reader = kafka_source(spark, cfg, load=False)
    assert reader is not None
    with pytest.raises(CdcError, match="topic"):
        KafkaSourceConfig(topic="").options()


def pg(op, row):
    """Postgres logical-replication wire frame: `<op-char><json>`
    (postgres.rs:77-156)."""
    return op + json.dumps(row)


def test_parse_pgoutput_envelope(spark):
    rows = [
        pg("I", {"table": "docs", "id": "p1", "category": "x"}),
        pg("U", {"table": "docs", "id": "p1", "category": "y"}),
        pg("D", {"table": "docs", "id": "p1"}),
        "B{}",   # begin frame -> skipped (operation NULL)
        pg("I", {"table": "other", "id": "q"}),
    ]
    df = spark.createDataFrame([(r,) for r in rows], "value string")
    got = parse_pgoutput(df, collection_mapping={"docs": "documents"}).collect()
    assert [r["operation"] for r in got] == [
        "insert", "update", "delete", None, "insert"]
    assert got[0]["collection"] == "documents"
    assert got[4]["collection"] == "other"      # unmapped table passes through
    assert got[0]["document_key"] == "p1"
    assert got[2]["document_key"] == "p1"       # delete key from the row json
    assert json.loads(got[1]["after"]) == {"table": "docs", "id": "p1", "category": "y"}
    assert got[2]["after"] is None              # deletes carry no after-image


def test_pgoutput_file_replay_converges(spark, tmp_path, coll):
    """5/5 protocols: native Postgres envelopes through the production
    pipeline (parse_pgoutput -> apply_change_events) converge to the
    oracle state."""
    src = str(tmp_path / "pg_envelopes")
    os.makedirs(src, exist_ok=True)
    # pg frames are raw `<op><json>` strings, not json objects
    with open(os.path.join(src, "b1.json"), "w") as f:
        for frame in [
            pg("I", {"table": "docs", "id": "a", "vector": [1.0, 0.0], "category": "first"}),
            pg("I", {"table": "docs", "id": "b", "vector": [0.0, 1.0], "category": "keep"}),
            pg("U", {"table": "docs", "id": "a", "vector": [1.0, 0.0], "category": "second"}),
            pg("I", {"table": "docs", "id": "c", "vector": [1.0, 1.0], "category": "doomed"}),
            pg("D", {"table": "docs", "id": "c"}),
            "B{}",  # transaction-control frame skipped by the parser
        ]:
            f.write(json.dumps({"value": frame}) + "\n")
    q = cdc_pipeline(
        file_source(spark, src, "value string"),
        coll, DOC_SCHEMA, parser="postgres",
        checkpoint_dir=str(tmp_path / "pg_ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    state = {r["id"]: r["category"] for r in coll.df().collect()}
    assert state == {"a": "second", "b": "keep"}


def test_postgres_cdc_config():
    cfg = PostgresCdcConfig(slot_name="s1", publication_name="pub1")
    assert "pg_create_logical_replication_slot('s1', 'pgoutput')" in cfg.create_slot_sql()
    sql = cfg.slot_changes_sql()
    assert "pg_logical_slot_get_changes('s1'" in sql
    assert "'publication_names', 'pub1'" in sql
    assert ", 100," in sql  # CdcConfig.batch_size rides into the poll


def test_pulsar_source_config(spark):
    cfg = PulsarSourceConfig(
        service_url="pulsar://p1:6650", topic="persistent://t/ns/cdc",
        subscription="sub1", batch_size=250, initial_position="earliest",
        enable_dead_letter=True, dead_letter_topic="dlq", max_redelivery_count=5,
    )
    opts = cfg.options()
    assert opts["service.url"] == "pulsar://p1:6650"
    assert opts["topics"] == "persistent://t/ns/cdc"
    assert opts["predefinedSubscription"] == "sub1"
    assert opts["startingOffsets"] == "earliest"
    assert opts["pulsar.reader.receiverQueueSize"] == "250"
    assert opts["pulsar.consumer.deadLetterPolicy.deadLetterTopic"] == "dlq"
    assert opts["pulsar.consumer.deadLetterPolicy.maxRedeliverCount"] == "5"
    reader = pulsar_source(spark, cfg, load=False)
    assert reader is not None
    with pytest.raises(CdcError, match="topic"):
        PulsarSourceConfig(topic="").options()
    with pytest.raises(CdcError, match="initial_position"):
        PulsarSourceConfig(initial_position="middle").options()
    with pytest.raises(CdcError, match="dead_letter_topic"):
        PulsarSourceConfig(enable_dead_letter=True).options()


def test_pulsar_payload_replay_converges(spark, tmp_path, coll):
    """Pulsar payloads are Debezium envelopes (pulsar.rs couples the
    connector to DebeziumParser); parser='pulsar' routes accordingly."""
    src = str(tmp_path / "pulsar_envelopes")
    drop_lines(src, "b1.json", [
        dbz("c", after={"id": "x", "vector": [0.1, 0.2], "category": "viaPulsar"}, ts=1),
        dbz("u", after={"id": "x", "vector": [0.1, 0.2], "category": "updated"}, ts=2),
    ])
    q = cdc_pipeline(
        file_source(spark, src, "value string"),
        coll, DOC_SCHEMA, parser="pulsar",
        checkpoint_dir=str(tmp_path / "pulsar_ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    state = {r["id"]: r["category"] for r in coll.df().collect()}
    assert state == {"x": "updated"}


def test_cdc_position_roundtrip():
    p = CdcPosition(position="1234", source="topicA", timestamp=99, partition=3)
    assert p.serialize() == "topicA:3:1234:99"
    q = CdcPosition.parse("topicA:3:1234:99")
    assert (q.source, q.partition, q.position, q.timestamp) == ("topicA", 3, "1234", 99)
    r = CdcPosition.parse("t::pos:7")  # no partition
    assert r.partition is None and r.position == "pos"
    with pytest.raises(CdcError):
        CdcPosition.parse("garbage")
