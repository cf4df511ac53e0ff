"""External CDC source connectors: Kafka wiring + Debezium / MongoDB
change-envelope parsing onto Structured Streaming.

Reference surface (/root/reference/src/streaming/cdc/):
- debezium.rs:61-170  DebeziumParser.parse_value — payload unwrap, op
  mapping (c/r→insert, u→update, d→delete, t→truncate), table→
  collection mapping, key from payload.key or after.id/_id, ts_ms,
  after/before documents.
- kafka.rs:10-56      KafkaConnectorConfig (brokers, topic, group_id,
  security protocol, SASL, offset reset).
- mongodb.rs:69-116   Mongo change-stream envelope (operationType,
  documentKey._id, fullDocument, clusterTime).
- mod.rs:59-140       CdcPosition resume tokens ("source:partition:
  position:timestamp"); :168 CdcConfig batching/retry knobs; :384
  change_event_to_ingest bridge.

Spark mapping: a connector is `readStream.format("kafka")` + an
ENVELOPE PARSER that is a pure DataFrame transform (get_json_object /
from_json expressions — no per-row Python), feeding the same
`micro_batch_upsert`-style foreachBatch bridge as native ingestion.
Offsets/checkpoints subsume CdcPosition (kept for API parity and
interop); batch_size/retry knobs map to maxOffsetsPerTrigger and task
retry.  Parsers work identically on any JSON-string column, so tests
replay file-simulated envelopes through the exact production path —
only the source swaps.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CdcError(ValueError):
    pass


# --------------------------------------------------------- positions ---

@dataclass
class CdcPosition:
    """Resume token (cdc/mod.rs:59-140) — serialized as
    `source:partition:position:timestamp` (partition empty when None).
    Structured Streaming checkpoints make these redundant internally;
    they exist for interop with reference-format tokens."""

    position: str
    source: str
    timestamp: int = 0
    partition: int | None = None

    def __post_init__(self):
        if not self.timestamp:
            self.timestamp = int(time.time() * 1000)

    def serialize(self) -> str:
        p = "" if self.partition is None else str(self.partition)
        return f"{self.source}:{p}:{self.position}:{self.timestamp}"

    @classmethod
    def parse(cls, s: str) -> "CdcPosition":
        # source and partition never contain ':'; the POSITION may
        # (e.g. 'shard-0:500'), so split twice from the left and take
        # the timestamp from the right — a plain split(':') would
        # silently corrupt serialize() round-trips
        try:
            source, part, rest = s.split(":", 2)
            position, ts = rest.rsplit(":", 1)
            partition = None if part == "" else int(part)
            timestamp = int(ts)
        except ValueError as e:
            raise CdcError(f"invalid CDC position format: {s}") from e
        return cls(position=position, source=source,
                   timestamp=timestamp, partition=partition)


# ----------------------------------------------------------- configs ---

@dataclass
class CdcConfig:
    """Batching/retry knobs (cdc/mod.rs:168-203) in Spark terms."""

    batch_size: int = 100             # -> maxOffsetsPerTrigger
    fetch_timeout_ms: int = 5000      # -> kafkaConsumer.pollTimeoutMs
    auto_commit_interval_ms: int = 5000  # superseded by checkpoints
    max_retries: int = 3              # -> spark.task.maxFailures domain
    retry_backoff_ms: int = 1000
    exactly_once: bool = False        # checkpoint + idempotent sink
    dlq_destination: str | None = None


@dataclass
class KafkaSourceConfig:
    """KafkaConnectorConfig (kafka.rs:10-56) -> readStream options."""

    brokers: list[str] = field(default_factory=lambda: ["localhost:9092"])
    topic: str = ""
    group_id: str = "needle-cdc"
    cdc: CdcConfig = field(default_factory=CdcConfig)
    security_protocol: str = "PLAINTEXT"
    sasl_mechanism: str | None = None
    sasl_username: str | None = None
    sasl_password: str | None = None
    ssl_ca_path: str | None = None
    offset_reset: str = "earliest"

    def options(self) -> dict[str, str]:
        if not self.topic:
            raise CdcError("kafka source requires a topic")
        opts = {
            "kafka.bootstrap.servers": ",".join(self.brokers),
            "subscribe": self.topic,
            "kafka.group.id": self.group_id,
            "startingOffsets": self.offset_reset,
            "maxOffsetsPerTrigger": str(self.cdc.batch_size),
            "kafkaConsumer.pollTimeoutMs": str(self.cdc.fetch_timeout_ms),
            "kafka.security.protocol": self.security_protocol,
        }
        if self.sasl_mechanism:
            opts["kafka.sasl.mechanism"] = self.sasl_mechanism
        if self.sasl_username is not None:
            mech = (self.sasl_mechanism or "PLAIN").upper()
            module = (
                "org.apache.kafka.common.security.scram.ScramLoginModule"
                if mech.startswith("SCRAM")
                else "org.apache.kafka.common.security.plain.PlainLoginModule")

            def esc(x: str) -> str:  # JAAS string literal escaping
                return x.replace("\\", "\\\\").replace('"', '\\"')

            opts["kafka.sasl.jaas.config"] = (
                f"{module} required "
                f'username="{esc(self.sasl_username)}" '
                f'password="{esc(self.sasl_password or "")}";'
            )
        if self.ssl_ca_path:
            opts["kafka.ssl.truststore.location"] = self.ssl_ca_path
        return opts


def kafka_source(spark: SparkSession, config: KafkaSourceConfig,
                 load: bool = True):
    """Config-driven Kafka reader (kafka.rs KafkaConnector).  With
    load=False returns the configured DataStreamReader (inspectable /
    testable without a broker or the kafka connector jar); load=True
    returns the streaming DataFrame with `value` cast to string, ready
    for an envelope parser."""
    reader = spark.readStream.format("kafka")
    for k, v in config.options().items():
        reader = reader.option(k, v)
    if not load:
        return reader
    return kafka_value_json(reader.load())


@dataclass
class PostgresCdcConfig:
    """PostgresCdcConfig (postgres.rs:9-32): logical-replication slot
    parameters.  Spark has no native pgoutput streaming source; the
    production route is Debezium->Kafka (parse_debezium), but this
    config also builds the slot-polling SQL (postgres.rs:218-223) for a
    JDBC micro-batch poller, and `parse_pgoutput` understands the native
    envelope wherever the bytes arrive from."""

    connection_string: str = "postgres://localhost/needle"
    slot_name: str = "needle_slot"
    publication_name: str = "needle_publication"
    tables: list[str] = field(default_factory=list)
    cdc: CdcConfig = field(default_factory=CdcConfig)

    def create_slot_sql(self) -> str:
        """Idempotent slot creation (postgres.rs:193-198)."""
        return (
            f"SELECT pg_create_logical_replication_slot('{self.slot_name}', 'pgoutput') "
            f"WHERE NOT EXISTS (SELECT 1 FROM pg_replication_slots "
            f"WHERE slot_name = '{self.slot_name}')"
        )

    def slot_changes_sql(self) -> str:
        """Batch poll of pending changes (postgres.rs:218-223); the
        `data` column feeds parse_pgoutput."""
        return (
            f"SELECT lsn, xid, data FROM pg_logical_slot_get_changes("
            f"'{self.slot_name}', NULL, {self.cdc.batch_size}, "
            f"'proto_version', '1', 'publication_names', '{self.publication_name}')"
        )


@dataclass
class PulsarSourceConfig:
    """PulsarConnectorConfig (pulsar.rs:10-103) -> options for the
    public pulsar-spark connector (`readStream.format("pulsar")`).
    Payloads carry Debezium envelopes (pulsar.rs couples the connector
    to DebeziumParser), so the parsed stream feeds parse_debezium."""

    service_url: str = "pulsar://localhost:6650"
    topic: str = "persistent://public/default/needle-cdc"
    subscription: str = "needle-cdc-subscription"
    consumer_name: str = "needle-cdc-consumer"
    batch_size: int = 100
    receive_timeout_ms: int = 5000
    cdc: CdcConfig = field(default_factory=CdcConfig)
    initial_position: str = "latest"          # latest | earliest
    enable_dead_letter: bool = False
    dead_letter_topic: str | None = None
    max_redelivery_count: int = 3

    def options(self) -> dict[str, str]:
        if not self.topic:
            raise CdcError("pulsar source requires a topic")
        if self.initial_position not in ("latest", "earliest"):
            raise CdcError(f"bad initial_position: {self.initial_position!r}")
        opts = {
            "service.url": self.service_url,
            "topics": self.topic,
            "predefinedSubscription": self.subscription,
            "pulsar.reader.receiverQueueSize": str(self.batch_size),
            "startingOffsets": self.initial_position,
        }
        if self.enable_dead_letter:
            if not self.dead_letter_topic:
                raise CdcError("dead-letter enabled but no dead_letter_topic")
            opts["pulsar.consumer.deadLetterPolicy.deadLetterTopic"] = self.dead_letter_topic
            opts["pulsar.consumer.deadLetterPolicy.maxRedeliverCount"] = str(
                self.max_redelivery_count)
        return opts


def pulsar_source(spark: SparkSession, config: PulsarSourceConfig,
                  load: bool = True):
    """Config-driven Pulsar reader (pulsar.rs PulsarConnector).  With
    load=False returns the configured DataStreamReader (inspectable /
    testable without a broker or the pulsar connector jar)."""
    reader = spark.readStream.format("pulsar")
    for k, v in config.options().items():
        reader = reader.option(k, v)
    if not load:
        return reader
    raw = reader.load()
    return raw.select(F.col("value").cast("string").alias("value"),
                      *[c for c in ("__topic", "__messageId", "__publishTime")
                        if c in raw.columns])


def kafka_value_json(raw: DataFrame) -> DataFrame:
    """Kafka record -> (value json string, key, topic, partition,
    offset, timestamp) — the shape envelope parsers consume."""
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("key").cast("string").alias("key"),
        "topic", "partition", "offset", "timestamp",
    )


# -------------------------------------------------- envelope parsers ---

# normalized change-event columns every parser emits
CHANGE_EVENT_COLS = ("operation", "collection", "document_key", "ts_ms",
                     "after", "before")

_DEBEZIUM_OPS = {"c": "insert", "r": "insert", "u": "update",
                 "d": "delete", "t": "truncate"}


def parse_debezium(
    events: DataFrame,
    value_col: str = "value",
    collection_mapping: dict[str, str] | None = None,
    include_before: bool = True,
) -> DataFrame:
    """Debezium envelope -> normalized change events — a pure expression
    transform twin of DebeziumParser.parse_value (debezium.rs:61-170).

    Handles both the Kafka-Connect `{"payload": {...}}` wrapper and the
    bare form; op codes c/r/u/d/t map to insert/update/delete/truncate;
    the document key comes from `key`, else after.id/_id, else
    before.id/_id; unknown ops yield operation NULL (route to a DLQ by
    filtering, rather than killing the stream)."""
    v = F.col(value_col)

    def pfield(path: str):
        # payload-wrapped wins, bare fallback (debezium.rs:72)
        return F.coalesce(
            F.get_json_object(v, f"$.payload.{path}"),
            F.get_json_object(v, f"$.{path}"),
        )

    op_raw = pfield("op")
    op_map = F.create_map(*[F.lit(x) for kv in _DEBEZIUM_OPS.items() for x in kv])
    table = F.coalesce(pfield("source.table"), F.lit("unknown"))
    if collection_mapping:
        cmap = F.create_map(*[
            F.lit(x) for kv in sorted(collection_mapping.items()) for x in kv
        ])
        collection = F.coalesce(F.element_at(cmap, table), table)
    else:
        collection = table
    after = pfield("after")
    before = pfield("before")
    key = F.coalesce(
        pfield("key"),
        F.get_json_object(after, "$.id"), F.get_json_object(after, "$._id"),
        F.get_json_object(before, "$.id"), F.get_json_object(before, "$._id"),
    )
    out = events.withColumns({
        "operation": F.element_at(op_map, op_raw),
        "collection": collection,
        "document_key": key,
        "ts_ms": pfield("ts_ms").cast("long"),
        "after": after,
        "before": before if include_before else F.lit(None).cast("string"),
    })
    return out


_MONGO_OPS = {"insert": "insert", "update": "update", "replace": "update",
              "delete": "delete", "drop": "truncate", "invalidate": "truncate"}


def parse_mongo_change(
    events: DataFrame,
    value_col: str = "value",
    collection_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """MongoDB change-stream envelope -> normalized change events
    (mongodb.rs:69-116): operationType, documentKey._id, fullDocument,
    fullDocumentBeforeChange, ns.coll, clusterTime/wallTime."""
    v = F.col(value_col)
    op_map = F.create_map(*[F.lit(x) for kv in sorted(_MONGO_OPS.items()) for x in kv])
    coll_name = F.coalesce(F.get_json_object(v, "$.ns.coll"), F.lit("unknown"))
    if collection_mapping:
        cmap = F.create_map(*[
            F.lit(x) for kv in sorted(collection_mapping.items()) for x in kv
        ])
        coll_name = F.coalesce(F.element_at(cmap, coll_name), coll_name)
    return events.withColumns({
        "operation": F.element_at(op_map, F.get_json_object(v, "$.operationType")),
        "collection": coll_name,
        "document_key": F.coalesce(
            F.get_json_object(v, "$.documentKey._id"),
            F.get_json_object(v, "$.fullDocument._id"),
        ),
        # clusterTime/wallTime arrive as extended JSON in standard
        # envelopes ({"$timestamp":{"t":s,"i":n}} / {"$date": ms}); a
        # bare cast of the object string is NULL, which would zero
        # every event's timestamp
        "ts_ms": F.coalesce(
            F.get_json_object(v, "$.clusterTime").cast("long"),
            F.get_json_object(v, "$.clusterTime['$timestamp'].t")
            .cast("long") * 1000,
            F.get_json_object(v, "$.wallTime").cast("long"),
            F.get_json_object(v, "$.wallTime['$date']").cast("long"),
            F.get_json_object(v, "$.wallTime['$date']['$numberLong']")
            .cast("long"),
        ),
        "after": F.get_json_object(v, "$.fullDocument"),
        "before": F.get_json_object(v, "$.fullDocumentBeforeChange"),
    })


_PG_OPS = {"I": "insert", "U": "update", "D": "delete"}


def parse_pgoutput(
    events: DataFrame,
    value_col: str = "value",
    collection_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Postgres logical-replication envelope -> normalized change events
    — expression twin of PostgresCdcConnector.parse_message
    (postgres.rs:71-159).

    The wire format is `<op-char><json>`: op 'I'/'U'/'D' followed by the
    row as JSON carrying `table` and `id` fields.  Unknown message types
    (pgoutput Begin/Commit/Relation frames and anything else) yield
    operation NULL, matching the reference's skip — filter them to a
    DLQ rather than killing the stream.  Deletes carry no after-image
    (ChangeEvent::delete has full_document None); ts_ms is NULL because
    the reference stamps arrival time, which the bridge supplies."""
    v = F.col(value_col)
    op_char = F.substring(v, 1, 1)
    payload = v.substr(F.lit(2), F.length(v))
    op_map = F.create_map(*[F.lit(x) for kv in sorted(_PG_OPS.items()) for x in kv])
    operation = F.element_at(op_map, op_char)
    table = F.coalesce(F.get_json_object(payload, "$.table"), F.lit("unknown"))
    if collection_mapping:
        cmap = F.create_map(*[
            F.lit(x) for kv in sorted(collection_mapping.items()) for x in kv
        ])
        collection = F.coalesce(F.element_at(cmap, table), table)
    else:
        collection = table
    return events.withColumns({
        "operation": operation,
        "collection": collection,
        "document_key": F.get_json_object(payload, "$.id"),
        "ts_ms": F.lit(None).cast("long"),
        "after": F.when(operation.isin("insert", "update"), payload),
        "before": F.lit(None).cast("string"),
    })


# ------------------------------------------------------------ bridge ---

def apply_change_events(collection, doc_schema: str,
                        collection_name: str | None = None):
    """foreachBatch bridge from normalized change events into a
    collection (change_event_to_ingest, cdc/mod.rs:384; CdcIngestion
    Pipeline :204).

    Fully set-wise — no event rows ever reach the driver: the batch is
    COMPACTED to the last event per document key (ops on distinct keys
    commute, so last-per-key replay converges to the same state as
    ordered replay), then surviving deletes apply as one distributed
    anti-set and surviving upserts as one idempotent MERGE with the
    after-document parsed by `from_json(doc_schema)`.  A truncate acts
    as a barrier: state clears, and only events strictly after it
    apply.  Replaying a batch converges -> exactly-once end to end.
    `doc_schema` must cover the collection's id column (and vector
    column if vectors ride the stream)."""
    ic = collection.id_col

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        ev = batch_df
        if collection_name is not None and "collection" in ev.columns:
            ev = ev.filter(F.col("collection") == collection_name)
        ev = ev.filter(F.col("operation").isNotNull()).withColumn(
            "__ts", F.coalesce(F.col("ts_ms"), F.lit(0))
        ).withColumn("__ord", F.monotonically_increasing_id()).persist()
        stats = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("operation") == "truncate",
                         F.col("__ord"))).alias("trunc_ord"),
            F.max(F.when(F.col("operation") == "truncate",
                         F.col("__ts"))).alias("trunc_ts"),
            F.max("__ts").alias("max_ts"),
        ).first()
        if stats["n"] == 0:
            ev.unpersist()
            return
        now_ms = int(stats["max_ts"]) or None
        if stats["trunc_ord"] is not None:
            collection.clear(now_ms=int(stats["trunc_ts"]) or now_ms)
            # the barrier is ARRIVAL order, not timestamp: events with
            # NULL/tied ts that arrived AFTER the truncate must apply
            # (a ts filter would silently drop them)
            ev = ev.filter(F.col("__ord") > stats["trunc_ord"])
        # compaction: the LAST event per key wins (arrival order breaks
        # ts ties within the batch)
        w = Window.partitionBy("document_key").orderBy(
            F.col("__ts").desc(), F.col("__ord").desc())
        last = (
            ev.filter(F.col("document_key").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        ).persist()
        dels = last.filter(F.col("operation") == "delete").select("document_key")
        ups = last.filter(
            F.col("operation").isin("insert", "update") & F.col("after").isNotNull()
        ).select(F.from_json("after", doc_schema).alias("d")).select("d.*")
        if collection.vector_col in ups.columns:
            ups = ups.withColumn(
                collection.vector_col,
                F.col(collection.vector_col).cast("array<float>"),
            )
        counts = last.agg(
            F.sum((F.col("operation") == "delete").cast("int")).alias("nd"),
            F.sum(F.col("operation").isin("insert", "update").cast("int")).alias("nu"),
        ).first()
        if counts["nd"]:
            collection.delete(ids=dels, now_ms=now_ms)
        if counts["nu"]:
            collection.upsert(ups, now_ms=now_ms)
        last.unpersist()
        ev.unpersist()

    return _sink


def cdc_pipeline(
    source_df: DataFrame,
    collection,
    doc_schema: str,
    parser: str = "debezium",
    collection_mapping: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    collection_name: str | None = None,
):
    """End-to-end CDC ingestion (CdcIngestionPipeline, cdc/mod.rs:204):
    source stream of JSON envelopes -> parse -> apply to collection.
    Returns the StreamingQuery."""
    if parser in ("debezium", "pulsar"):  # pulsar payloads ARE debezium
        parsed = parse_debezium(source_df, collection_mapping=collection_mapping)
    elif parser == "mongodb":
        parsed = parse_mongo_change(source_df, collection_mapping=collection_mapping)
    elif parser in ("postgres", "pgoutput"):
        parsed = parse_pgoutput(source_df, collection_mapping=collection_mapping)
    else:
        raise CdcError(f"unknown CDC parser: {parser!r}")
    if collection_name is None and collection_mapping:
        # a multi-table topic MUST scope events to this target, or
        # every table's rows land in the one collection
        import os as _os

        collection_name = _os.path.basename(collection.path.rstrip("/"))
    writer = parsed.writeStream.foreachBatch(
        apply_change_events(collection, doc_schema,
                            collection_name=collection_name))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
