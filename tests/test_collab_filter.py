"""Collaborative filtering (reference:
src/experimental/collaborative_filtering.rs): interaction matrix,
item-item cosine CF, item-kNN recommendation, hybrid blending, and the
implicit-ALS engine on pyspark.ml."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.collab_filter import (
    CfConfig,
    CollaborativeFilter,
    hybrid_scores,
    interaction_matrix,
    item_similarity,
    recommend_itemknn,
)


@pytest.fixture(scope="module")
def events_cf(spark):
    # users 1/2 share items A,B; user 3 likes C,D; purchases weigh 5x
    rows = [
        (1, "A", "click"), (1, "B", "purchase"), (1, "B", "click"),
        (2, "A", "click"), (2, "B", "click"), (2, "C", "view"),
        (3, "C", "purchase"), (3, "D", "click"), (3, "D", "view"),
        (4, "A", "view"), (4, "D", "click"),
        (5, "E", "signup"),  # zero-weight type: dropped
    ]
    return spark.createDataFrame(
        rows, "user_id int, item_id string, event_type string")


def test_interaction_matrix_weights(events_cf):
    m = {(r["user"], r["item"]): r["weight"]
         for r in interaction_matrix(events_cf).collect()}
    assert m[(1, "B")] == 6.0  # purchase 5 + click 1
    assert m[(2, "C")] == 0.5  # view
    assert (5, "E") not in m   # signup has no weight


def test_item_similarity_cosine(events_cf):
    inter = interaction_matrix(events_cf)
    sims = {(r["item_a"], r["item_b"]): r for r in
            item_similarity(inter).collect()}
    ab = sims[("A", "B")]
    assert ab["common_users"] == 2
    # cosine by hand: A = {1:1, 2:1, 4:0.5}, B = {1:6, 2:1}
    import math
    expected = (1 * 6 + 1 * 1) / (
        math.sqrt(1 + 1 + 0.25) * math.sqrt(36 + 1))
    assert ab["similarity"] == pytest.approx(expected)
    # min_common prunes single-user pairs
    pruned = item_similarity(inter, min_common=2).collect()
    assert all(r["common_users"] >= 2 for r in pruned)


def test_item_similarity_topn_symmetric(events_cf):
    inter = interaction_matrix(events_cf)
    top1 = item_similarity(inter, top_n=1).collect()
    per_item = {}
    for r in top1:
        per_item.setdefault(r["item_a"], []).append(r)
    assert all(len(v) == 1 for v in per_item.values())


def test_recommend_itemknn_excludes_seen(events_cf):
    inter = interaction_matrix(events_cf)
    sims = item_similarity(inter)
    recs = recommend_itemknn(inter, sims, 1, limit=5).collect()
    items = [r["item"] for r in recs]
    assert "A" not in items and "B" not in items  # seen by user 1
    assert items  # co-occurrence with user 2 surfaces C
    scores = [r["cf_score"] for r in recs]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_scores_blend(spark, events_cf):
    inter = interaction_matrix(events_cf)
    sims = item_similarity(inter)
    cf = recommend_itemknn(inter, sims, 1, limit=5)
    vec = spark.createDataFrame(
        [("C", 0.2), ("D", 0.9)], "item string, vector_score double")
    blended = {r["item"]: r for r in hybrid_scores(cf, vec,
                                                   cf_weight=0.3).collect()}
    assert set(blended) >= {"C", "D"}
    for r in blended.values():
        assert 0.0 <= r["hybrid_score"] <= 1.0
    # with low cf_weight the vector signal dominates: D > C on vectors
    assert blended["D"]["hybrid_score"] > blended["C"]["hybrid_score"] or \
        blended["D"]["vector_score"] > blended["C"]["vector_score"]


def test_als_train_and_recommend(spark):
    # planted block structure: users 0-4 like items 0-2, users 5-9 like
    # items 3-5 — implicit ALS must recommend within-block
    rows = []
    for u in range(5):
        for i in range(3):
            if (u + i) % 3 != 0:  # leave holes to predict
                rows.append((u, i, 5.0))
    for u in range(5, 10):
        for i in range(3, 6):
            if (u + i) % 3 != 0:
                rows.append((u, i, 5.0))
    inter = spark.createDataFrame(rows, "user int, item int, weight double")
    cf = CollaborativeFilter(CfConfig(num_factors=8, num_iterations=8,
                                      seed=7))
    assert not cf.is_trained()
    cf.train(inter)
    assert cf.is_trained()

    # user 0 saw items 1,2; the only unseen in-block item is 0 and the
    # planted structure must rank it first
    recs = cf.recommend(0, limit=2).collect()
    assert recs and recs[0]["item"] == 0
    seen = {r["item"] for r in inter.filter(F.col("user") == 0).collect()}
    assert all(r["item"] not in seen for r in recs)

    st = cf.stats()
    assert st["num_users"] == 10 and st["num_items"] == 6
    assert 0.0 < st["sparsity"] < 1.0

    # session recommendation via latent factors
    sess = cf.recommend_session([3, 4], limit=2).collect()
    assert sess and all(r["item"] not in (3, 4) for r in sess)

    with pytest.raises(ValueError):
        CollaborativeFilter().recommend(0)
