"""Hooks (hooks.rs built-ins) and semantic cache (semantic_cache.rs)."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.hooks import (
    HookRegistry,
    add_timestamp,
    dedup_results,
    normalize_l2,
    score_threshold,
    validate_dimensions,
)
from needle_spark.operators.semantic_cache import SemanticCache


def test_insert_hook_chain(spark):
    df = spark.createDataFrame([("a", [3.0, 4.0])], "id string, vector array<float>")
    reg = (HookRegistry()
           .on_insert(validate_dimensions(2))
           .on_insert(normalize_l2())
           .on_insert(add_timestamp(12345)))
    out = reg.apply_insert(df).first()
    assert [round(float(x), 6) for x in out["vector"]] == [0.6, 0.8]
    assert out["inserted_at"] == 12345

    bad = spark.createDataFrame([("b", [1.0, 2.0, 3.0])], "id string, vector array<float>")
    with pytest.raises(ValueError, match="dimension"):
        reg.apply_insert(bad)


def test_search_hooks(spark):
    df = spark.createDataFrame(
        [("a", 0.1), ("a", 0.3), ("b", 0.5), ("c", 0.9)],
        "id string, distance double",
    )
    reg = HookRegistry().on_search(dedup_results()).on_search(score_threshold(0.6))
    rows = {r["id"]: r["distance"] for r in reg.apply_search(df).collect()}
    assert rows == {"a": 0.1, "b": 0.5}  # dup collapsed, c dropped


def test_semantic_cache(spark, embeddings):
    cache = SemanticCache(similarity_threshold=0.99, max_entries=2)
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]

    r1 = cache.cached_knn(embeddings, qv, k=5, vector_col="embedding", id_col="vec_id")
    assert cache.stats() == {"entries": 1, "hits": 0, "misses": 1}
    # near-identical query -> served from cache, no recompute
    qv2 = [x * 1.0000001 for x in qv]
    r2 = cache.cached_knn(embeddings, qv2, k=5, vector_col="embedding", id_col="vec_id")
    assert [r["vec_id"] for r in r2] == [r["vec_id"] for r in r1]
    assert cache.stats()["hits"] == 1
    # dissimilar query -> miss
    far = [-x for x in qv]
    cache.cached_knn(embeddings, far, k=5, vector_col="embedding", id_col="vec_id")
    assert cache.stats()["misses"] == 2
    # FIFO eviction caps entries
    cache.store([0.0] * 64, [])
    assert cache.stats()["entries"] == 2
    with pytest.raises(ValueError):
        cache.store([float("nan")] * 64, [])
