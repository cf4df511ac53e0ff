"""TTL expiry: lazy filter on EVERY read path (kNN, analytics-style
counts, QL scans) + the eager sweep (reference ttl.rs expire_vectors
:52, lazy is_expired checks; CollectionConfig::with_default_ttl_seconds).
"""

import os

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.filters import ttl_filter
from needle_spark.ql import QueryExecutor


@pytest.fixture()
def ttl_coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    c = db.create_collection(
        "ephemeral", dims=2,
        schema="id string, vector array<float>, category string",
        default_ttl_seconds=100,
    )
    # inserted at t=1000s -> expires at t=1100s
    c.insert(spark.createDataFrame(
        [("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y")],
        "id string, vector array<float>, category string",
    ), now_ms=1_000_000)
    return c


def test_default_ttl_stamps_and_hides(spark, ttl_coll):
    c = ttl_coll
    # wall-clock default (reference parity) hides these 1970-epoch rows;
    # deterministic reads pass an explicit now
    assert c.get("a") is None
    row = c.df(now=1050).filter(F.col("id") == "a").first()
    assert row["expires_at"] == 1100
    # alive before expiry, gone after — on plain reads, not just kNN
    assert c.df(now=1099).count() == 2
    assert c.df(now=1100).count() == 0  # now >= expiration is expired
    # explicit expires_at wins over the default stamp
    c.upsert(spark.createDataFrame(
        [("c", [1.0, 1.0], "z", 2000)],
        "id string, vector array<float>, category string, expires_at long",
    ), now_ms=1_000_000)
    assert c.df(now=1500).count() == 1
    assert {r["id"] for r in c.df(now=1500).collect()} == {"c"}


def test_ttl_applies_to_knn_and_ql(spark, ttl_coll):
    from needle_spark.operators.knn import knn

    raw = ttl_coll.df(include_expired=True)
    hits = knn(raw, [1.0, 0.0], k=5, now=1200).collect()
    assert hits == []
    ex = QueryExecutor(spark, tables={"ephemeral": raw})
    rows = ex.execute("SELECT id FROM ephemeral LIMIT 10", {"now": 1200}).collect()
    assert rows == []  # QL relational scan honors TTL too
    alive = ex.execute("SELECT id FROM ephemeral LIMIT 10", {"now": 1050}).collect()
    assert len(alive) == 2


def test_sweep_expired_reclaims(spark, ttl_coll):
    c = ttl_coll
    n = c.sweep_expired(now=1099)
    assert n == 0  # nothing expired yet
    n = c.sweep_expired(now=1200)
    assert n == 2
    # gone from the RAW view (tombstoned), not merely filtered
    assert c.df(include_expired=True).count() == 0
    # the sweep is CDC-logged as deletes (replayable change stream)
    ev = c.cdc_events().orderBy("sequence").collect()
    assert [e["event_type"] for e in ev] == ["insert", "insert", "delete", "delete"]
    # physical reclaim at compact: the folded segment holds zero rows
    c.compact(keep_versions=0, target_partitions=1)
    live_segs = [d for d in os.listdir(c.path) if d.startswith("seg-")]
    total = sum(
        spark.read.parquet(os.path.join(c.path, s)).count() for s in live_segs
    )
    assert total == 0


def test_ttl_filter_noop_without_column(spark):
    df = spark.range(5)
    assert ttl_filter(df, 123).count() == 5
    assert ttl_filter(df.withColumn("expires_at", F.lit(None).cast("long")), None).count() == 5


def test_compact_preserves_expired_rows_for_sweep(spark, ttl_coll):
    """compact() folds the RAW view (ADVICE r2): TTL-expired rows are
    not silently dropped without CDC delete events — they survive
    compaction physically, stay hidden from reads, and sweep_expired()
    remains the single place expiry removal is CDC-logged."""
    c = ttl_coll
    c.compact(keep_versions=0, target_partitions=1)
    assert c.df(include_expired=True).count() == 2   # carried through
    assert c.df(now=1200).count() == 0               # still hidden lazily
    assert [e for e in c.cdc_events().collect()
            if e["event_type"] == "delete"] == []    # compact emitted none
    assert c.sweep_expired(now=1200) == 2            # sweep emits the deletes
    ev = c.cdc_events().orderBy("sequence").collect()
    assert [e["event_type"] for e in ev][-2:] == ["delete", "delete"]
    assert c.df(include_expired=True).count() == 0
