"""Live migration: zero-downtime import from external vector databases
(Qdrant / ChromaDB / Milvus / Pinecone / JSON files) into a catalog
collection, with schema discovery, dimension validation, progress
tracking, checkpoint/resume, and rollback.

Reference: /root/reference/src/services/live_migration_service.rs —
MigrationSource (:45-68), SourceSchema (:72-88), MigrationConfig
(:93-132: batch_size, dry_run, resume, max_vectors,
validate_dimensions), MigrationProgress/MigrationStatus (:137-178),
MigrationBatch/MigrationVector (:181-204), MigrationEngine (:206-385):
discover_schema (:236-288), validate_schema (:291-307), apply_batch
(:310-355: counts, pct, throughput, checkpoint id, is_last/max cut),
rollback_ids (:367-369), mark_failed/mark_rolled_back (:372-381).

The reference's source adapters are declared-but-stubbed (dimensions 0,
"would be discovered from API").  Here the DataFrame/JSON paths are
REAL — discovery reads the actual data, transfer is a distributed
upsert — and the HTTP sources ship as response-format parsers for the
public wire formats (Qdrant scroll / Chroma get / Pinecone fetch /
Milvus query) behind a pluggable transport, mock-tested because the
sandbox has no network (same posture as operators/model_clients.py).

Spark shape (100 TB posture): the transfer is ONE idempotent
`Collection.upsert` — "batches" are Spark partitions, so parallelism,
retry, and backpressure come from the scheduler instead of a
driver-side cursor loop.  Resume needs no cursor bookkeeping at all:
the MERGE converges, so re-running after a failure imports only what
is missing.  Rollback's scale path is a zero-copy catalog
`restore()` to the pre-migration version; the live path (concurrent
writers present) derives the imported id set from the CDC range the
migration owns.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QDRANT = "qdrant"
CHROMADB = "chromadb"
MILVUS = "milvus"
PINECONE = "pinecone"
JSON_FILE = "json_file"

#: MigrationSource display names + API versions — live_migration_service.rs:58-68,236-288.
SOURCES = {
    QDRANT: {"display": "Qdrant", "api_version": "1.x"},
    CHROMADB: {"display": "ChromaDB", "api_version": "0.4.x"},
    MILVUS: {"display": "Milvus", "api_version": "2.x"},
    PINECONE: {"display": "Pinecone", "api_version": "v1"},
    JSON_FILE: {"display": "JSON File", "api_version": None},
}

PENDING = "pending"
DISCOVERING = "discovering"
VALIDATING = "validating"
STREAMING = "streaming"
COMPLETED = "completed"
FAILED = "failed"
ROLLED_BACK = "rolled_back"


class MigrationError(ValueError):
    pass


class DimensionMismatch(MigrationError):
    pass


@dataclass
class SourceSchema:
    """live_migration_service.rs:72-88."""

    source: str
    source_collection: str
    dimensions: int
    distance_function: str = "cosine"
    total_vectors: int = 0
    metadata_fields: dict[str, str] = field(default_factory=dict)
    api_version: str | None = None


@dataclass
class MigrationConfig:
    """live_migration_service.rs:93-132."""

    source: str = JSON_FILE
    source_url: str = ""
    source_collection: str | None = None
    target_collection: str = "imported"
    batch_size: int = 1000
    dry_run: bool = False
    resume_from: str | None = None
    auth_token: str | None = None
    max_vectors: int | None = None
    validate_dimensions: bool = True

    def __post_init__(self):
        if self.source not in SOURCES:
            raise MigrationError(
                f"unknown source {self.source!r}; one of {sorted(SOURCES)}")


@dataclass
class MigrationProgress:
    """live_migration_service.rs:137-162."""

    status: str = PENDING
    vectors_imported: int = 0
    vectors_total: int = 0
    batches_completed: int = 0
    errors: list[str] = field(default_factory=list)
    started_at: int = 0
    updated_at: int = 0
    progress_pct: float = 0.0
    throughput_vps: float = 0.0
    checkpoint_id: str | None = None


# -------------------------------------------------------------- sources


def read_json_source(spark: SparkSession, path: str) -> DataFrame:
    """The JsonFile source, for real: JSON-lines of
    {id, vector|embedding, ...metadata} -> (id, vector, meta columns).
    Unknown fields ride along as metadata columns."""
    df = spark.read.json(path)
    cols = set(df.columns)
    if "id" not in cols:
        raise MigrationError("JSON source rows need an 'id' field")
    vec = "vector" if "vector" in cols else (
        "embedding" if "embedding" in cols else None)
    if vec is None:
        raise MigrationError("JSON source rows need a 'vector' or 'embedding'")
    others = [c for c in df.columns if c not in ("id", vec)]
    return df.select(
        F.col("id").cast("string").alias("id"),
        F.col(vec).cast("array<float>").alias("vector"),
        *others,
    )


def _rows_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    if not rows:
        raise MigrationError("source returned no vectors")
    meta_keys: list[str] = []
    for r in rows:
        for k in (r.get("metadata") or {}):
            if k not in meta_keys:
                meta_keys.append(k)
    data = [
        tuple([str(r["id"]), [float(x) for x in r["vector"]]]
              + [None if (m := (r.get("metadata") or {}).get(k)) is None
                 else str(m) for k in meta_keys])
        for r in rows
    ]
    schema = "id string, vector array<float>" + "".join(
        f", {k} string" for k in meta_keys)
    return spark.createDataFrame(data, schema)


def parse_qdrant_scroll(payload: dict) -> tuple[list[dict], Any]:
    """Qdrant `POST /collections/{c}/points/scroll` response (public
    wire format): {result: {points: [{id, vector, payload}],
    next_page_offset}}."""
    res = payload.get("result") or {}
    rows = [
        {"id": p["id"], "vector": p.get("vector") or [],
         "metadata": p.get("payload") or {}}
        for p in res.get("points") or []
    ]
    return rows, res.get("next_page_offset")


def parse_chroma_get(payload: dict) -> tuple[list[dict], Any]:
    """ChromaDB `collection.get(include=[embeddings, metadatas])`
    response: parallel arrays {ids, embeddings, metadatas}."""
    ids = payload.get("ids") or []
    embs = payload.get("embeddings") or []
    metas = payload.get("metadatas") or [None] * len(ids)
    rows = [
        {"id": i, "vector": e, "metadata": m or {}}
        for i, e, m in zip(ids, embs, metas)
    ]
    return rows, None


def parse_pinecone_fetch(payload: dict) -> tuple[list[dict], Any]:
    """Pinecone `GET /vectors/fetch` response:
    {vectors: {id: {id, values, metadata}}}."""
    rows = [
        {"id": v["id"], "vector": v.get("values") or [],
         "metadata": v.get("metadata") or {}}
        for v in (payload.get("vectors") or {}).values()
    ]
    return rows, payload.get("pagination", {}).get("next")


def parse_milvus_query(payload: dict) -> tuple[list[dict], Any]:
    """Milvus RESTful `POST /v2/vectordb/entities/query` response:
    {data: [{id|pk, vector, ...fields}]}."""
    rows = []
    for e in payload.get("data") or []:
        eid = e.get("id", e.get("pk"))
        vec = e.get("vector") or []
        meta = {k: v for k, v in e.items()
                if k not in ("id", "pk", "vector")}
        rows.append({"id": eid, "vector": vec, "metadata": meta})
    return rows, None


_PARSERS = {
    QDRANT: parse_qdrant_scroll,
    CHROMADB: parse_chroma_get,
    PINECONE: parse_pinecone_fetch,
    MILVUS: parse_milvus_query,
}


def fetch_source_df(
    spark: SparkSession,
    config: MigrationConfig,
    transport: Callable[[str, dict], dict],
) -> DataFrame:
    """Pull every page from an HTTP source through `transport(url,
    request) -> response-json` and assemble the source DataFrame.
    transport is injectable: tests use a canned-page mock; production
    wires urllib/requests with config.auth_token."""
    parser = _PARSERS.get(config.source)
    if parser is None:
        raise MigrationError(f"{config.source!r} is not an HTTP source")
    rows: list[dict] = []
    cursor = config.resume_from
    while True:
        payload = transport(config.source_url, {
            "collection": config.source_collection,
            "limit": config.batch_size,
            "offset": cursor,
            "auth": config.auth_token,
        })
        page, cursor = parser(payload)
        rows.extend(page)
        if not cursor or not page:
            break
        if config.max_vectors and len(rows) >= config.max_vectors:
            break
    if config.max_vectors:
        rows = rows[: config.max_vectors]
    return _rows_df(spark, rows)


# --------------------------------------------------------------- engine


class MigrationEngine:
    """live_migration_service.rs:206-385, with a real transfer path."""

    def __init__(self, config: MigrationConfig):
        now = int(time.time())
        self.config = config
        self.progress = MigrationProgress(started_at=now, updated_at=now)
        self.rollback_ids: list[str] = []
        self._pre_version: int | None = None
        self._cdc_seq_start: int | None = None
        self._cdc_seq_end: int | None = None

    # -- discovery / validation --

    def discover_schema(self, source_df: DataFrame) -> SourceSchema:
        """Real discovery (the reference stubs this with dims=0):
        dimensions from the data, count, metadata field types from the
        DataFrame schema — live_migration_service.rs:236-288."""
        self.progress.status = DISCOVERING
        first = source_df.select("vector").first()
        dims = len(first["vector"]) if first and first["vector"] else 0
        meta = {
            f.name: f.dataType.simpleString()
            for f in source_df.schema.fields
            if f.name not in ("id", "vector")
        }
        return SourceSchema(
            source=self.config.source,
            source_collection=(self.config.source_collection
                               or self.config.source_url),
            dimensions=dims,
            total_vectors=source_df.count(),
            metadata_fields=meta,
            api_version=SOURCES[self.config.source]["api_version"],
        )

    def validate_schema(self, source: SourceSchema, target_dims: int) -> None:
        """live_migration_service.rs:291-307."""
        self.progress.status = VALIDATING
        if (self.config.validate_dimensions and source.dimensions > 0
                and source.dimensions != target_dims):
            raise DimensionMismatch(
                f"expected {target_dims} dims, got {source.dimensions}")

    # -- transfer --

    def migrate(self, collection, source_df: DataFrame) -> int:
        """The real apply path: one distributed idempotent upsert
        (apply_batch semantics, live_migration_service.rs:310-355 —
        with Spark partitions as the batches).  Records the CDC
        watermark + version for rollback; dry_run only counts."""
        schema = self.discover_schema(source_df)
        self.validate_schema(schema, collection.dims)
        self.progress.vectors_total = schema.total_vectors
        self.progress.status = STREAMING
        rows = source_df
        if self.config.max_vectors is not None:
            rows = rows.limit(self.config.max_vectors)
        if self.config.dry_run:
            n = rows.count()
            self._finish(n, batches=1)
            return n
        self._pre_version = collection.version
        self._cdc_seq_start = self._max_seq(collection)
        # pin the migration's OWN id set BEFORE the upsert: rollback
        # attribution by CDC range would blame concurrent writers'
        # events landing inside [seq_start, seq_end] on the migration
        # and delete/revert their rows
        self._imported_df = (rows.select(F.col("id").cast("string")
                                         .alias("vector_id"))
                             .distinct().localCheckpoint(eager=True))
        n = collection.upsert(rows.withColumnRenamed("id", collection.id_col)
                              .withColumnRenamed("vector", collection.vector_col)
                              if collection.id_col != "id"
                              or collection.vector_col != "vector" else rows)
        self._cdc_seq_end = self._max_seq(collection)
        # bounded driver mirror of the reference's rollback_ids (the
        # distributed set lives in the CDC range; this is a preview)
        self.rollback_ids = [
            str(r[0]) for r in self._imported_ids(collection).limit(1000).collect()
        ]
        self._finish(n, batches=max(1, rows.rdd.getNumPartitions()))
        return n

    def _finish(self, n: int, batches: int) -> None:
        p = self.progress
        p.vectors_imported += n
        p.batches_completed += batches
        p.updated_at = int(time.time())
        if p.vectors_total:
            p.progress_pct = p.vectors_imported / p.vectors_total * 100.0
        elapsed = max(1, p.updated_at - p.started_at)
        p.throughput_vps = p.vectors_imported / elapsed
        p.checkpoint_id = f"batch_{p.batches_completed}_{p.vectors_imported}"
        p.status = COMPLETED

    @staticmethod
    def _max_seq(collection) -> int:
        # -1 when the log is empty: sequences start at 0
        row = collection.cdc_events().agg(F.max("sequence")).first()
        return int(row[0]) if row and row[0] is not None else -1

    def _imported_ids(self, collection) -> DataFrame:
        if self._cdc_seq_start is None or self._cdc_seq_end is None:
            raise MigrationError("no completed migration to roll back")
        # the id set pinned at import time is exact under concurrent
        # writers; the CDC-range fallback (which attributes EVERY event
        # in the window to the migration) only serves engines restored
        # without the in-memory frame
        if getattr(self, "_imported_df", None) is not None:
            return self._imported_df
        ev = collection.cdc_events()
        return (
            ev.filter((F.col("sequence") > self._cdc_seq_start)
                      & (F.col("sequence") <= self._cdc_seq_end)
                      & (F.col("event_type").isin("insert", "upsert",
                                                  "update")))
            .select("vector_id").distinct()
        )

    # -- rollback --

    def rollback(self, collection, *, strategy: str = "restore") -> None:
        """mark_rolled_back — live_migration_service.rs:379-381.
        `restore`: zero-copy catalog restore to the pre-migration
        version (exact when the migration owned the collection).
        `delete`: live path — undo exactly what the migration's CDC
        range touched (safe under concurrent writers to OTHER ids):
        ids that did NOT exist before the migration are deleted; ids
        the migration merely upserted OVER are restored to their
        pre-migration values from the version snapshot (ADVICE r4 —
        a blanket delete would erase pre-existing rows)."""
        if strategy == "restore":
            if self._pre_version is None:
                raise MigrationError("no completed migration to roll back")
            collection.restore(self._pre_version)
        elif strategy == "delete":
            if self._pre_version is None:
                raise MigrationError("no completed migration to roll back")
            ic = collection.id_col
            imported = self._imported_ids(collection).select(
                F.col("vector_id").cast("string").alias(ic))
            pre = collection.df(version=self._pre_version)
            # pre-existing rows the migration overwrote -> restore
            # their prior values (distributed semi-join + upsert)
            overwritten = pre.join(
                imported.hint("broadcast"),
                pre[ic].cast("string") == imported[ic], "leftsemi")
            n_over = overwritten.count()
            # truly-new ids -> delete (distributed semi-join victim
            # set; collecting 50M ids to a driver list would OOM)
            new_ids_df = imported.join(
                pre.select(F.col(ic).cast("string").alias(ic)),
                on=ic, how="leftanti")
            if new_ids_df.take(1):
                collection.delete(ids=new_ids_df)
            if n_over:
                collection.upsert(overwritten)
        else:
            raise MigrationError("strategy must be restore|delete")
        self.progress.status = ROLLED_BACK
        self.progress.updated_at = int(time.time())

    def mark_failed(self, reason: str) -> None:
        """live_migration_service.rs:372-377."""
        self.progress.status = FAILED
        self.progress.errors.append(reason)
        self.progress.updated_at = int(time.time())
