"""Relevance feedback (reference:
src/experimental/relevance_feedback.rs): signal scoring, decayed
adjustments, rollback guardrail, stats, and A/B evaluation."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.relevance_feedback import (
    FeedbackConfig,
    ab_test_results,
    assign_variant_expr,
    compute_adjustments,
    feedback_stats,
    should_rollback,
    signal_score_expr,
)

HOUR_NS = 3_600_000_000_000


def _fb(spark, rows):
    return spark.createDataFrame(rows, "signal string, value double, ts long")


def test_signal_scores(spark):
    df = _fb(spark, [
        ("thumbs_up", 0.0, 0), ("thumbs_down", 0.0, 0), ("click", 0.0, 0),
        ("skip", 0.0, 0), ("rating", 5.0, 0), ("rating", 1.0, 0),
        ("dwell", 8.0, 0), ("dwell", 0.5, 0), ("unknown", 0.0, 0)])
    got = df.select("signal", "value",
                    signal_score_expr("signal", "value").alias("s")).collect()
    by = {(r["signal"], r["value"]): r["s"] for r in got}
    assert by[("thumbs_up", 0.0)] == 1.0
    assert by[("thumbs_down", 0.0)] == -1.0
    assert by[("click", 0.0)] == 0.5
    assert by[("skip", 0.0)] == pytest.approx(-0.3)
    assert by[("rating", 5.0)] == 1.0 and by[("rating", 1.0)] == -1.0
    assert by[("dwell", 8.0)] == 1.0  # (8-3)/5 clamped
    assert by[("dwell", 0.5)] == pytest.approx(-0.5)
    assert by[("unknown", 0.0)] is None


def test_compute_adjustments_decay_and_min_events(spark):
    now = 10 * HOUR_NS
    # ten fresh thumbs_up, ten ancient thumbs_down: decay favors fresh
    rows = [("thumbs_up", 0.0, now)] * 10 + \
           [("thumbs_down", 0.0, 0)] * 10
    adj = compute_adjustments(_fb(spark, rows), now,
                              FeedbackConfig(temporal_decay=0.5)).first()
    assert adj["avg_relevance"] > 0.9  # old negatives decayed to ~0
    assert adj["event_count"] == 20
    assert 0.5 <= adj["ef_search_factor"] <= 2.0
    # ef factor rises when relevance is poor
    bad = compute_adjustments(
        _fb(spark, [("thumbs_down", 0.0, now)] * 20), now,
        FeedbackConfig(temporal_decay=0.5, learning_rate=0.1)).first()
    assert bad["ef_search_factor"] > adj["ef_search_factor"]
    # below min events -> empty (reference returns None)
    few = compute_adjustments(_fb(spark, rows[:5]), now).collect()
    assert few == []


def test_should_rollback(spark):
    now = HOUR_NS
    good = _fb(spark, [("thumbs_up", 0.0, now)] * 15)
    bad = _fb(spark, [("thumbs_down", 0.0, now)] * 15)
    assert should_rollback(good, now) is False
    assert should_rollback(bad, now) is True


def test_feedback_stats(spark):
    df = _fb(spark, [("click", 0.0, 0)] * 4 + [("skip", 0.0, 0)] * 2 +
             [("unknown", 0.0, 0)] * 3)
    st = feedback_stats(df)
    assert st["total_events"] == 6  # unknown signals excluded
    assert st["positive_count"] == 4 and st["negative_count"] == 2
    assert st["click_through_rate"] == pytest.approx(4 / 6)


def test_variant_assignment_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "user_id int")
    a = df.select("user_id", assign_variant_expr(
        "user_id", "t1", ["control", "treatment"]).alias("v"))
    b = df.select("user_id", assign_variant_expr(
        "user_id", "t1", ["control", "treatment"]).alias("v"))
    assert a.collect() == b.collect()  # stable
    counts = {r["v"]: r["count"] for r in a.groupBy("v").count().collect()}
    assert set(counts) == {"control", "treatment"}
    assert min(counts.values()) > 50  # roughly balanced


def test_ab_test_results_winner(spark):
    rows = ([("control", "click", 0.0)] * 20 +
            [("treatment", "thumbs_up", 0.0)] * 20 +
            [("tiny", "thumbs_up", 0.0)] * 3)  # under min_events
    df = spark.createDataFrame(rows, "variant string, signal string, "
                                     "value double")
    res = {r["variant"]: r for r in ab_test_results(df).collect()}
    assert res["treatment"]["is_winner"] is True
    assert res["control"]["is_winner"] is False
    assert res["tiny"]["is_winner"] is False  # insufficient data
    assert res["treatment"]["avg_relevance"] > res["control"]["avg_relevance"]
