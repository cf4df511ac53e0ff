"""Learned ef_search tuning: UCB1 bandit, online models, workload
profile, distributed warm start (reference learned_tuning.rs)."""

import math
import random

import pytest

from needle_spark.plans.learned_tuning import (
    AdaptiveExecutor,
    BanditArm,
    LearnedTuner,
    QueryFeedback,
    TunerConfig,
    reward_for,
)


def _fb(ef, recall=0.95, lat=5.0, **kw):
    return QueryFeedback(ef_search=ef, estimated_recall=recall,
                         latency_ms=lat, **kw)


def test_reward_formula_matches_reference():
    fb = _fb(50, recall=0.9, lat=10.0)
    assert reward_for(fb) == pytest.approx(
        0.9 * 0.6 + (1.0 / (1.0 + 1.0)) * 0.3 + 0.2)
    fb2 = _fb(50, recall=0.9, lat=10.0, satisfied=False)
    assert reward_for(fb2) == pytest.approx(reward_for(fb) - 0.2)


def test_ucb1_arm_update():
    arm = BanditArm(50)
    assert arm.ucb == float("inf")     # unexplored arms try first
    arm.update(0.8, total_pulls=1)
    assert arm.avg_reward == pytest.approx(0.8)
    arm.update(0.6, total_pulls=10)
    assert arm.avg_reward == pytest.approx(0.7)
    assert arm.ucb == pytest.approx(
        0.7 + math.sqrt(2.0 * math.log(10) / 2))


def test_cold_start_returns_default_with_exploration():
    t = LearnedTuner(TunerConfig(min_samples=5), rng=random.Random(1))
    rec = t.recommend_params(10, 0.95)
    assert rec.ef_search == 50 and rec.is_exploration
    assert "Not enough samples" in rec.reasoning


def test_learning_prefers_cheap_arm_meeting_recall():
    cfg = TunerConfig(min_samples=10, exploration_rate=0.0)
    t = LearnedTuner(cfg, rng=random.Random(7))
    # ef=50 reaches target recall cheaply; ef=500 is slow
    for i in range(60):
        t.record_feedback(_fb(50, recall=0.96, lat=2.0, timestamp=i * 1000))
        t.record_feedback(_fb(500, recall=0.99, lat=50.0,
                              timestamp=i * 1000 + 500))
    rec = t.recommend_params(10, target_recall=0.9)
    assert not rec.is_exploration
    assert rec.ef_search < 500
    st = t.stats()
    assert st["total_samples"] == 120
    assert st["best_ef_search"] == 50    # higher avg reward (low latency)
    assert st["avg_latency_ms"] == pytest.approx(26.0)
    assert 0 < st["latency_rmse"]


def test_workload_profile_and_sensitivities():
    t = LearnedTuner(TunerConfig(decay_factor=0.5))
    t.record_feedback(_fb(50, recall=0.5, lat=20.0, satisfied=False,
                          k=20, filter_complexity=4, timestamp=1000))
    w = t.workload
    assert w.avg_k == pytest.approx(10.0)          # 0*0.5 + 20*0.5
    assert w.avg_filter_complexity == pytest.approx(2.0)
    assert w.recall_sensitivity == pytest.approx(0.1)
    assert w.latency_sensitivity == pytest.approx(0.1)


def test_export_import_roundtrip():
    t = LearnedTuner(TunerConfig(min_samples=1), rng=random.Random(3))
    for i in range(20):
        t.record_feedback(_fb(75, recall=0.9, lat=3.0, timestamp=i))
    state = t.export_state()
    t2 = LearnedTuner(TunerConfig(min_samples=1), rng=random.Random(3))
    t2.import_state(state)
    assert t2.total_pulls == t.total_pulls
    assert t2.arms[75].avg_reward == pytest.approx(t.arms[75].avg_reward)
    assert t2.model.latency_weights == pytest.approx(
        t.model.latency_weights)


def test_adaptive_executor_bounds():
    t = LearnedTuner(TunerConfig(min_samples=10**9))   # always default 50
    ex = AdaptiveExecutor(t, min_ef=60, max_ef=400)
    assert ex.get_ef_search(10, 0.95) == 60            # clamped up
    ex.record_execution(60, 10, 4.2, estimated_recall=0.93)
    assert t.total_pulls == 1 and t.arms[60].pull_count == 1


def test_fit_from_log_distributed_warm_start(spark):
    rows = []
    rng = random.Random(11)
    for i in range(3000):
        ef = rng.choice([50, 500])
        lat = 2.0 if ef == 50 else 50.0
        rec = 0.96 if ef == 50 else 0.99
        rows.append((ef, 10, lat, rec, True, 1.0, 0, i * 100))
    log = spark.createDataFrame(
        rows, "ef_search int, k int, latency_ms double, "
              "estimated_recall double, satisfied boolean, "
              "query_norm double, filter_complexity int, timestamp long")
    t = LearnedTuner(TunerConfig(min_samples=10, exploration_rate=0.0),
                     rng=random.Random(5))
    t.fit_from_log(log, model_sample=500)
    # bandit state matches the exact per-arm aggregation
    n50 = sum(1 for r in rows if r[0] == 50)
    assert t.arms[50].pull_count == n50
    assert t.arms[50].avg_reward == pytest.approx(
        reward_for(_fb(50, recall=0.96, lat=2.0)), abs=1e-9)
    assert t.total_pulls == 3000
    assert t.workload.avg_k == pytest.approx(10.0)
    st = t.stats()
    assert st["best_ef_search"] == 50
    # and the tuner recommends without further feedback
    rec = t.recommend_params(10, 0.9)
    assert not rec.is_exploration and rec.ef_search < 500
