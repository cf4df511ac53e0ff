"""Materialized views (staleness+drift refresh), adaptive RRF weights,
connected components."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.operators.graph import connected_components
from needle_spark.operators.hybrid import AdaptiveRrfWeights
from needle_spark.operators.materialized import MaterializedView


def test_materialized_view_staleness_and_drift(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    coll = db.create_collection(
        "mv_docs", dims=2, schema="id string, vector array<float>, category string"
    )
    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0], "x")], "id string, vector array<float>, category string"
    ), now_ms=1)

    mv = MaterializedView(
        "by_cat",
        build=lambda: coll.df().groupBy("category").agg(F.count(F.lit(1)).alias("cnt")),
        staleness_seconds=1000,
        source_collection=coll,
    )
    assert mv.is_stale()  # never built
    assert {r["category"]: r["cnt"] for r in mv.df(now=0).collect()} == {"x": 1}
    assert mv.refresh_count == 1
    # fresh: served from cache, no rebuild
    mv.df(now=10)
    assert mv.refresh_count == 1
    # wall-clock staleness triggers rebuild
    mv.df(now=2000)
    assert mv.refresh_count == 2
    # underlying drift (new collection version) triggers rebuild even when fresh
    coll.insert(spark.createDataFrame(
        [("b", [0.0, 1.0], "y")], "id string, vector array<float>, category string"
    ), now_ms=2)
    got = {r["category"]: r["cnt"] for r in mv.df(now=2001).collect()}
    assert got == {"x": 1, "y": 1} and mv.refresh_count == 3


def test_adaptive_rrf_weights(spark):
    ad = AdaptiveRrfWeights(learning_rate=0.1)
    assert ad.get_weights("machine learning systems") == (0.5, 0.5)
    # clicks on vector-ranked results shift weight toward vectors
    for _ in range(5):
        ad.record_feedback("machine learning systems", vector_rank=1, bm25_rank=9)
    vw, bw = ad.get_weights("machine learning systems")
    assert vw > 0.5 > bw and abs(vw + bw - 1.0) < 1e-12
    # per-query-type isolation: short queries unaffected
    assert ad.get_weights("ml") == (0.5, 0.5)
    for _ in range(3):
        ad.record_feedback("ml", vector_rank=None, bm25_rank=1)
    svw, sbw = ad.get_weights("ml")
    assert sbw > 0.5
    # fusion consumes the learned weights
    vec = spark.createDataFrame([("a", 0.1)], "id string, distance double")
    bm = spark.createDataFrame([("b", 3.0)], "id string, score double")
    rows = {r["id"]: r["score"] for r in
            ad.fuse(vec, bm, "machine learning systems", limit=5).collect()}
    assert rows["a"] == pytest.approx(vw / 61.0)
    assert rows["b"] == pytest.approx(bw / 61.0)


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        "src string, dst string",
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"
    assert comp["f"] == "f"
