"""Query prewarming (reference:
src/experimental/query_prewarming.rs): temporal features, pattern
scoring, prediction, adaptive threshold, prewarm execution."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.prewarming import (
    PrewarmConfig,
    QueryPrewarmer,
    score_patterns,
    temporal_features_expr,
    temporal_similarity_expr,
)

DAY = 86_400
HOUR = 3_600


def test_temporal_features(spark):
    # epoch (Thu) + 2 days = Saturday(5 with Mon=0), 13:00
    ts = 2 * DAY + 13 * HOUR
    df = spark.createDataFrame([(ts,)], "ts long")
    h, d = temporal_features_expr("ts")
    row = df.select(h.alias("h"), d.alias("d")).first()
    assert row["h"] == 13 and row["d"] == 5


def test_temporal_similarity_circular(spark):
    df = spark.createDataFrame([(23, 6), (1, 0), (11, 3)],
                               "hour int, day int")
    sim = temporal_similarity_expr(F.col("hour"), F.col("day"), 0, 0)
    rows = df.select("hour", sim.alias("s")).collect()
    by = {r["hour"]: r["s"] for r in rows}
    # 23:00 vs 00:00 is 1 hour apart circularly; day 6 vs 0 is 1 apart
    assert by[23] == pytest.approx(0.7 * (1 - 1 / 12) + 0.3 * (1 - 1 / 3.5))
    # hour=1 same day: one circular hour away, day identical
    assert by[1] == pytest.approx(0.7 * (1 - 1 / 12) + 0.3)
    assert by[11] < by[23]  # 11 hours apart is the worst case


def test_score_patterns_decay(spark):
    now = 100 * DAY
    log = spark.createDataFrame(
        [("c", [1.0], 5, False, now), ("c", [1.0], 5, False, now - 50 * HOUR)],
        "collection string, embedding array<float>, k int, "
        "had_filter boolean, ts long")
    rows = score_patterns(log, now).orderBy(F.col("ts").desc()).collect()
    assert rows[0]["__score"] > rows[1]["__score"]  # recency decays


def test_predict_next_and_threshold(spark):
    pre = QueryPrewarmer(spark, PrewarmConfig(confidence_threshold=0.2))
    now = 1_000 * DAY + 9 * HOUR
    assert pre.predict_next(now=now) == []  # fewer than 3 patterns
    # same-hour history strongly predicts a "docs" query near [1, 0]
    for i in range(6):
        pre.log_query("docs", [1.0, 0.0], k=10, ts=now - i * DAY)
    for i in range(2):
        pre.log_query("imgs", [0.0, 1.0], k=5, ts=now - i * DAY - 12 * HOUR)
    preds = pre.predict_next(limit=5, now=now)
    assert preds and preds[0]["collection"] == "docs"
    assert preds[0]["predicted_embedding"][0] == pytest.approx(1.0)
    assert preds[0]["predicted_k"] == 10
    assert 0.0 < preds[0]["confidence"] <= 1.0

    # stats + adaptive threshold behavior
    st = pre.stats()
    assert st["history_size"] == 8
    assert st["tracked_collections"] == ["docs", "imgs"]
    pre.total_predictions, pre.predictions_hit = 20, 18  # 90% accuracy
    t0 = pre.current_threshold
    pre.adapt_threshold()
    assert pre.current_threshold < t0  # confident -> predict more
    pre.predictions_hit = 2  # 10% accuracy
    pre.adapt_threshold()
    assert pre.current_threshold > t0 * 0.95 * 0.99  # raised again


def test_prewarm_executes_and_caches(spark):
    from needle_spark.operators.semantic_cache import ExactQueryCache

    pre = QueryPrewarmer(spark, PrewarmConfig(confidence_threshold=0.0))
    now = 500 * DAY
    for i in range(4):
        pre.log_query("docs", [0.5, 0.5], k=3, ts=now - i * DAY)
    preds = pre.predict_next(now=now)
    called = []
    cache = ExactQueryCache()
    n = pre.prewarm(preds, lambda coll, emb, k: called.append((coll, k)) or
                    ["r"], cache=cache)
    assert n == len(preds) >= 1
    assert called[0][0] == "docs"
    # the warmed entry is served on the exact repeat
    assert cache.get(preds[0]["predicted_embedding"],
                     preds[0]["predicted_k"]) == ["r"]
