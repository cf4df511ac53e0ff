"""IVF index recall vs exact oracle (recall_benchmark.rs model) and
planner strategy/selectivity semantics (optimizer.rs:111-145, 228-268,
boundary tests at :312-610)."""

import pytest
from pyspark.sql import functions as F

from needle_spark.plans.ivf import IvfIndex, recall_at_k
from needle_spark.plans.planner import (
    BRUTE_FORCE_THRESHOLD,
    CollectionStats,
    choose_strategy,
    estimate_selectivity,
    explain_search,
    explain_text,
)


@pytest.fixture(scope="module")
def ivf(embeddings):
    return IvfIndex.fit(embeddings, nlist=16, vector_col="embedding", id_col="vec_id")


@pytest.fixture(scope="module")
def indexed(embeddings, ivf):
    return ivf.assign(embeddings).cache()


def test_assignment_covers_all_rows(embeddings, indexed, ivf):
    assert indexed.count() == embeddings.count()
    cids = [r["centroid_id"] for r in indexed.select("centroid_id").distinct().collect()]
    assert all(0 <= c < ivf.nlist for c in cids)


def test_full_probe_equals_exact(embeddings, ivf, indexed):
    """nprobe == nlist must reproduce the exact result (no pruning)."""
    from needle_spark.operators.knn import knn

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    exact = [r["vec_id"] for r in knn(
        embeddings, qv, k=10, vector_col="embedding", id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in ivf.search(
        indexed, qv, k=10, nprobe=ivf.nlist).collect()]
    assert approx == exact


def test_recall_reasonable_and_monotone(embeddings, ivf, indexed):
    queries = [
        [float(x) for x in r["embedding"]]
        for r in embeddings.orderBy("vec_id").limit(5).collect()
    ]
    r2 = recall_at_k(embeddings, ivf, indexed, queries, k=10, nprobe=2)
    r8 = recall_at_k(embeddings, ivf, indexed, queries, k=10, nprobe=8)
    assert r8 >= r2
    assert r8 >= 0.8  # 8/16 buckets probed
    assert r2 > 0.2


def test_strategy_boundaries():
    small = CollectionStats(num_vectors=999, dims=64)
    big = CollectionStats(num_vectors=100_000, dims=64, has_ivf_index=True)
    assert choose_strategy(small) == "brute_force"
    assert choose_strategy(CollectionStats(BRUTE_FORCE_THRESHOLD, 64)) == "brute_force"
    assert choose_strategy(big) == "ivf_probe"
    # selective filter -> filter-first (sel 0.1*0.1*... < 0.05)
    sel_filter = {"$and": [{"a": 1}, {"b": 2}]}
    assert choose_strategy(big, sel_filter) == "filter_then_scan"
    assert choose_strategy(big, has_text_query=True) == "hybrid"


def test_selectivity_algebra():
    assert estimate_selectivity({"a": 1}) == pytest.approx(0.1)
    assert estimate_selectivity({"a": {"$ne": 1}}) == pytest.approx(0.9)
    assert estimate_selectivity({"a": {"$between": [1, 2]}}) == pytest.approx(0.2)
    assert estimate_selectivity({"a": {"$in": [1, 2, 3]}}) == pytest.approx(0.3)
    assert estimate_selectivity({"a": {"$in": list(range(20))}}) == pytest.approx(0.9)
    # AND = product
    assert estimate_selectivity({"$and": [{"a": 1}, {"b": 1}]}) == pytest.approx(0.01)
    # OR = inclusion-exclusion
    assert estimate_selectivity({"$or": [{"a": 1}, {"b": 1}]}) == pytest.approx(0.19)
    # NOT = complement
    assert estimate_selectivity({"$not": {"a": 1}}) == pytest.approx(0.9)
    assert estimate_selectivity(None) == 1.0


def test_explain_mentions_pushdown(spark, embeddings):
    """The pre-filter must reach the Parquet scan (PushedFilters) —
    SURVEY's 'is the filter pushed down' check, made a test."""
    df = embeddings.filter(F.col("label") == 3).select("vec_id", "label")
    txt = explain_text(df)
    assert "PushedFilters" in txt and "label" in txt
    report = explain_search(
        CollectionStats(500, 64), "brute_force", {"label": 3}, df=df
    )
    assert "strategy: brute_force" in report and "PushedFilters" in report
