"""Matryoshka (MRL) variable-dimension search (reference:
src/ml/matryoshka.rs truncate :243-257, coarse-to-fine :447-519,
adaptive tier policy :520+)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.knn import knn
from needle_spark.operators.matryoshka import (
    MatryoshkaConfig,
    coarse_to_fine_search,
    search_at_dimension,
    truncate_expr,
    truncate_py,
)


@pytest.fixture(scope="module")
def emb(spark, embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")).cache()


@pytest.fixture(scope="module")
def qv(embeddings):
    return [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]


def test_truncate_renormalizes(spark):
    df = spark.createDataFrame([([3.0, 4.0, 100.0, -7.0],)], "v array<float>")
    got = df.select(truncate_expr("v", 2).alias("t")).first()["t"]
    assert got == pytest.approx([0.6, 0.8], abs=1e-6)
    assert truncate_py([3.0, 4.0, 100.0], 2) == pytest.approx([0.6, 0.8])
    # zero prefix passes through unnormalized
    z = spark.createDataFrame([([0.0, 0.0, 5.0],)], "v array<float>")
    assert z.select(truncate_expr("v", 2).alias("t")).first()["t"] == [0.0, 0.0]


def test_full_dim_tier_equals_plain_knn(emb, qv):
    full = knn(emb, [x / np.linalg.norm(qv) for x in qv], k=10,
               metric="cosine").select("id").collect()
    tier = search_at_dimension(emb, qv, k=10, dim=len(qv)).select("id").collect()
    assert [r["id"] for r in full] == [r["id"] for r in tier]


def test_coarse_to_fine_recall_improves_with_multiplier(emb, qv):
    exact = [r["id"] for r in knn(emb, qv, k=10, metric="cosine").collect()]

    def recall(mult):
        got = [r["id"] for r in coarse_to_fine_search(
            emb, qv, k=10, coarse_dim=8, candidate_multiplier=mult).collect()]
        return len(set(got) & set(exact)) / 10

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 >= 0.6  # 8-d coarse with 80 candidates finds most of top-10


def test_coarse_to_fine_is_exact_within_candidates(emb, qv):
    out = coarse_to_fine_search(emb, qv, k=5, coarse_dim=16,
                                candidate_multiplier=4).collect()
    assert len(out) == 5
    ds = [r["distance"] for r in out]
    assert ds == sorted(ds)
    assert all(r["coarse_distance"] is not None for r in out)


def test_config_tier_policy():
    cfg = MatryoshkaConfig(full_dim=384, tiers=(64, 128, 256, 384, 1024))
    assert cfg.valid_tiers() == [64, 128, 256, 384]
    # huge budget -> full dim; tiny budget -> smallest tier
    assert cfg.choose_tier(1e9, corpus_rows=10**6) == 384
    assert cfg.choose_tier(1e-6, corpus_rows=10**9) == 64
    # monotone in budget
    picks = [cfg.choose_tier(b, corpus_rows=10**8)
             for b in (0.1, 1.0, 10.0, 100.0, 1e5)]
    assert picks == sorted(picks)


def test_plan_take_ordered_both_phases(emb, qv):
    plan = coarse_to_fine_search(
        emb, qv, k=10, coarse_dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # pure top-k reductions


def test_choose_tier_small_full_dim_falls_back():
    from needle_spark.operators.matryoshka import MatryoshkaConfig

    cfg = MatryoshkaConfig(full_dim=16, tiers=(64, 128, 256))
    # no configured tier fits under full_dim -> serve at full_dim
    assert cfg.valid_tiers() == []
    assert cfg.choose_tier(10.0, corpus_rows=1000) == 16
