"""Live migration — live_migration_service.rs parity.

Mirrors the reference's tests (engine lifecycle, schema discovery,
dimension validation, dry run, progress accounting, rollback, failure
marking) with the parts the reference stubs made real: JSON source
ingestion, distributed upsert transfer, CDC-derived rollback, and the
public wire-format parsers for Qdrant/Chroma/Pinecone/Milvus behind a
mock transport.
"""

import json

import pytest

from needle_spark.catalog import Collection
from needle_spark.operators.live_migration import (
    CHROMADB,
    COMPLETED,
    FAILED,
    JSON_FILE,
    MILVUS,
    PINECONE,
    QDRANT,
    ROLLED_BACK,
    DimensionMismatch,
    MigrationConfig,
    MigrationEngine,
    MigrationError,
    fetch_source_df,
    parse_chroma_get,
    parse_milvus_query,
    parse_pinecone_fetch,
    parse_qdrant_scroll,
    read_json_source,
)


@pytest.fixture()
def coll(spark, tmp_path):
    return Collection.create(
        spark, str(tmp_path / "target"), dims=4, id_col="id",
        vector_col="vector",
        schema="id string, vector array<float>, lang string")


@pytest.fixture()
def source_df(spark):
    rows = [(f"v{i}", [float(i), 0.0, 1.0, 2.0], "en" if i % 2 else "fr")
            for i in range(20)]
    return spark.createDataFrame(rows, "id string, vector array<float>, lang string")


def test_json_source_roundtrip(spark, tmp_path):
    p = tmp_path / "src.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({
                "id": i, "embedding": [0.1 * i] * 4, "lang": "en"}) + "\n")
    df = read_json_source(spark, str(p))
    assert set(df.columns) == {"id", "vector", "lang"}
    assert df.count() == 5
    assert df.schema["vector"].dataType.simpleString() == "array<float>"
    with open(tmp_path / "bad.jsonl", "w") as f:
        f.write(json.dumps({"id": 1, "text": "no vector"}) + "\n")
    with pytest.raises(MigrationError):
        read_json_source(spark, str(tmp_path / "bad.jsonl"))


def test_discover_and_validate(spark, coll, source_df):
    eng = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    schema = eng.discover_schema(source_df)
    assert schema.dimensions == 4
    assert schema.total_vectors == 20
    assert schema.metadata_fields == {"lang": "string"}
    eng.validate_schema(schema, 4)  # compatible
    with pytest.raises(DimensionMismatch):
        eng.validate_schema(schema, 8)
    # validation can be disabled — live_migration_service.rs:298-305
    relaxed = MigrationEngine(MigrationConfig(
        source=JSON_FILE, source_url="x", validate_dimensions=False))
    relaxed.validate_schema(schema, 8)


def test_migrate_and_progress(spark, coll, source_df):
    eng = MigrationEngine(MigrationConfig(
        source=JSON_FILE, source_url="x", target_collection="target"))
    n = eng.migrate(coll, source_df)
    assert n == 20 and coll.count() == 20
    p = eng.progress
    assert p.status == COMPLETED
    assert p.vectors_imported == 20 and p.vectors_total == 20
    assert p.progress_pct == pytest.approx(100.0)
    assert p.checkpoint_id and p.checkpoint_id.endswith("_20")
    assert len(eng.rollback_ids) == 20


def test_dry_run_imports_nothing(spark, coll, source_df):
    eng = MigrationEngine(MigrationConfig(
        source=JSON_FILE, source_url="x", dry_run=True))
    n = eng.migrate(coll, source_df)
    assert n == 20 and coll.count() == 0
    assert eng.progress.status == COMPLETED


def test_max_vectors_cut(spark, coll, source_df):
    eng = MigrationEngine(MigrationConfig(
        source=JSON_FILE, source_url="x", max_vectors=7))
    assert eng.migrate(coll, source_df) == 7
    assert coll.count() == 7


def test_resume_converges_idempotently(spark, coll, source_df):
    # the MERGE path means "resume" = rerun; no cursor bookkeeping
    eng = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    eng.migrate(coll, source_df.limit(10))
    eng2 = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    eng2.migrate(coll, source_df)
    assert coll.count() == 20


def test_rollback_restore(spark, coll, source_df):
    seed = source_df.limit(3)
    coll.insert(seed)
    eng = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    eng.migrate(coll, source_df.filter("id NOT IN ('v0', 'v1', 'v2')"))
    assert coll.count() == 20
    eng.rollback(coll, strategy="restore")
    assert eng.progress.status == ROLLED_BACK
    assert coll.count() == 3  # back to pre-migration state


def test_rollback_delete_only_touches_imported(spark, coll, source_df):
    coll.insert(source_df.limit(3))  # pre-existing v0..v2
    eng = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    eng.migrate(coll, source_df.filter("id IN ('v5','v6')"))
    assert coll.count() == 5
    eng.rollback(coll, strategy="delete")
    remaining = sorted(r["id"] for r in coll.df().select("id").collect())
    assert remaining == ["v0", "v1", "v2"]


def test_rollback_without_migration_raises(spark, coll):
    eng = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    with pytest.raises(MigrationError):
        eng.rollback(coll, strategy="restore")


def test_mark_failed():
    eng = MigrationEngine(MigrationConfig(source=QDRANT, source_url="x"))
    eng.mark_failed("connection refused")
    assert eng.progress.status == FAILED
    assert eng.progress.errors == ["connection refused"]


def test_unknown_source_rejected():
    with pytest.raises(MigrationError):
        MigrationConfig(source="weaviate")


# ------------------------------------------------------- wire parsers


def test_qdrant_scroll_pages(spark):
    pages = [
        {"result": {"points": [
            {"id": "a", "vector": [1, 2], "payload": {"lang": "en"}},
            {"id": "b", "vector": [3, 4], "payload": {}}],
            "next_page_offset": "tok1"}},
        {"result": {"points": [
            {"id": "c", "vector": [5, 6], "payload": {"lang": "fr"}}],
            "next_page_offset": None}},
    ]
    calls = []

    def transport(url, req):
        calls.append(req.get("offset"))
        return pages[len(calls) - 1]

    cfg = MigrationConfig(source=QDRANT, source_url="http://q:6333",
                          source_collection="docs", batch_size=2)
    df = fetch_source_df(spark, cfg, transport)
    assert df.count() == 3
    assert calls == [None, "tok1"]  # cursor threaded through
    row = {r["id"]: r for r in df.collect()}
    assert row["a"]["lang"] == "en" and row["b"]["lang"] is None


def test_chroma_pinecone_milvus_parsers():
    rows, _ = parse_chroma_get({
        "ids": ["x"], "embeddings": [[1.0, 2.0]],
        "metadatas": [{"k": "v"}]})
    assert rows == [{"id": "x", "vector": [1.0, 2.0], "metadata": {"k": "v"}}]
    rows, _ = parse_pinecone_fetch({
        "vectors": {"y": {"id": "y", "values": [3.0], "metadata": None}}})
    assert rows[0]["id"] == "y" and rows[0]["metadata"] == {}
    rows, _ = parse_milvus_query({
        "data": [{"pk": "z", "vector": [4.0], "color": "red"}]})
    assert rows[0] == {"id": "z", "vector": [4.0],
                       "metadata": {"color": "red"}}


def test_rollback_delete_restores_overwritten_rows(spark, coll, source_df):
    """ADVICE r4: rollback(delete) must not erase ids that existed
    before the migration — upsert collisions are restored to their
    pre-migration values, only truly-new ids are deleted."""
    pre = spark.createDataFrame(
        [("v5", [9.0, 9.0, 9.0, 9.0], "de"),
         ("v9", [8.0, 8.0, 8.0, 8.0], "it")],
        "id string, vector array<float>, lang string")
    coll.insert(pre)
    eng = MigrationEngine(MigrationConfig(source=JSON_FILE, source_url="x"))
    # migration overwrites v5 and v9, adds v6
    eng.migrate(coll, source_df.filter("id IN ('v5','v6','v9')"))
    assert coll.count() == 3
    assert coll.df().filter("id = 'v5'").first()["lang"] == "en"
    eng.rollback(coll, strategy="delete")
    rows = {r["id"]: (r["vector"], r["lang"])
            for r in coll.df().collect()}
    # v6 (new) gone; v5/v9 back to pre-migration values
    assert sorted(rows) == ["v5", "v9"]
    assert rows["v5"] == ([9.0, 9.0, 9.0, 9.0], "de")
    assert rows["v9"] == ([8.0, 8.0, 8.0, 8.0], "it")
    assert eng.progress.status == ROLLED_BACK
