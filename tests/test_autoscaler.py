"""Auto-scaling advisor — autoscaling.rs parity: Holt prediction,
seasonality, hot/cold tracking, decision precedence, cooldown,
scheduling."""

import pytest

from needle_spark.plans.autoscaler import (
    DEMOTE_TO_COLD,
    EMERGENCY_SCALE,
    NONE,
    PROMOTE_TO_HOT,
    REBALANCE,
    SCALE_DOWN,
    SCALE_UP,
    AccessTracker,
    AutoScaler,
    LoadPredictor,
    MetricPoint,
    ScalingConfig,
    ScalingDecision,
    ScheduledScaling,
)


def mp(ts, cpu=0.5, mem=0.5, lat=20.0, qps=100.0, shards=4):
    return MetricPoint(timestamp=ts, cpu_utilization=cpu,
                       memory_utilization=mem, query_latency_ms=lat,
                       qps=qps, shard_count=shards)


def test_predictor_warmup_and_trend():
    p = LoadPredictor()
    p.add_point(mp(0, cpu=0.4))
    p.add_point(mp(60, cpu=0.5))
    assert p.predict(300) is None  # <3 points — autoscaling.rs:296-298
    p.add_point(mp(120, cpu=0.6))
    pred = p.predict(300)
    assert pred.timestamp == 420
    assert pred.cpu_utilization > 0.5  # rising trend extrapolated
    assert 0.0 <= pred.cpu_utilization <= 1.0
    # steady series predicts ~steady
    q = LoadPredictor()
    for i in range(10):
        q.add_point(mp(i * 60, cpu=0.5))
    assert q.predict(300).cpu_utilization == pytest.approx(0.5, abs=0.05)


def test_predictor_clamps():
    p = LoadPredictor()
    for i in range(10):
        p.add_point(mp(i * 60, cpu=0.1 * i + 0.2, lat=5.0 * i))
    pred = p.predict(3000)  # far horizon
    assert pred.cpu_utilization <= 1.0 and pred.query_latency_ms >= 0.0


def test_seasonality_detection():
    p = LoadPredictor(max_history=3000)
    # two days of minute samples: qps peaks at hour 12, troughs at 3
    for i in range(2880):
        ts = i * 60
        hour = (ts % 86400) // 3600
        qps = 1000.0 if hour == 12 else (10.0 if hour == 3 else 100.0)
        p.add_point(mp(ts, qps=qps))
    s = p.detect_seasonality()
    assert s.peak_hour == 12 and s.trough_hour == 3
    assert s.peak_load > s.trough_load
    assert LoadPredictor().detect_seasonality() is None


def test_access_tracker_hot_cold():
    t = AccessTracker(hot_window=3600)
    for _ in range(5):
        t.record_access("hot1", now=1000)
    t.record_access("cold1", now=1000)
    now = 1000 + 200 * 3600  # 200 hours later
    t.record_access("hot1", now=now)
    for _ in range(4):
        t.record_access("hot1", now=now)
    assert t.get_hot_vectors(threshold=5, now=now) == ["hot1"]
    assert t.get_cold_vectors(cold_hours=168, now=now) == ["cold1"]


def test_decision_precedence():
    sc = AutoScaler(ScalingConfig(enable_prediction=False))
    # within targets -> none
    sc.record_metrics(mp(0, cpu=0.5, mem=0.5, lat=20.0))
    assert sc.recommend(now=10).action == NONE
    # emergency beats everything
    sc.record_metrics(mp(0, cpu=0.97))
    d = sc.recommend(now=10)
    assert d.action == EMERGENCY_SCALE and d.amount == 2
    assert d.reason == "high_cpu_utilization" and d.confidence == 0.95
    # dominant-pressure reason on ordinary scale-up
    sc.record_metrics(mp(0, cpu=0.5, mem=0.5, lat=200.0))
    d = sc.recommend(now=10)
    assert d.action == SCALE_UP and d.reason == "high_latency"
    sc.record_metrics(mp(0, cpu=0.93, mem=0.5, lat=20.0))
    assert sc.recommend(now=10).reason == "high_cpu_utilization"
    # scale-down only when ALL metrics are low and shards > min
    sc.record_metrics(mp(0, cpu=0.1, mem=0.1, lat=1.0, shards=4))
    assert sc.recommend(now=10).action == SCALE_DOWN
    sc.record_metrics(mp(0, cpu=0.1, mem=0.1, lat=1.0, shards=1))
    assert sc.recommend(now=10).action == NONE  # at min_shards


def test_predicted_scale_up():
    sc = AutoScaler(ScalingConfig())
    for i in range(10):  # steep CPU ramp
        sc.record_metrics(mp(i * 60, cpu=0.1 + 0.08 * i))
    d = sc.recommend(now=601)
    assert d.action in (SCALE_UP, EMERGENCY_SCALE)
    if d.action == SCALE_UP:
        assert d.reason == "predicted_load_increase"
        assert d.predicted is not None and d.confidence == 0.8


def test_cooldown_and_scheduled():
    sc = AutoScaler(ScalingConfig(cooldown_seconds=300,
                                  enable_prediction=False))
    sc.record_metrics(mp(0, cpu=0.97))
    d = sc.recommend(now=0)
    sc.acknowledge_scaling(d, now=0)
    assert sc.recommend(now=100).action == NONE  # cooldown
    assert sc.recommend(now=100).context == "Cooldown period active"
    d2 = sc.recommend(now=400)  # cooldown over
    assert d2.action == EMERGENCY_SCALE
    assert sc.scaling_history == [d]
    # scheduled actions win once due
    sc2 = AutoScaler(ScalingConfig(enable_prediction=False))
    sc2.record_metrics(mp(0))
    sc2.schedule(ScheduledScaling(scheduled_time=500, action=SCALE_UP,
                                  amount=3, description="pre-black-friday"))
    assert sc2.recommend(now=100).action == NONE  # not due yet
    d3 = sc2.recommend(now=600)
    assert d3.action == SCALE_UP and d3.amount == 3
    assert d3.reason == "scheduled_scaling"


def test_rebalance_and_tiering_paths():
    sc = AutoScaler(ScalingConfig(enable_prediction=False,
                                  hot_tier_threshold=3))
    sc.record_metrics(mp(0, cpu=0.6, mem=0.6, lat=30.0))
    sc.update_shard_load("s1", cpu=0.9, vector_count=900_000)
    sc.update_shard_load("s2", cpu=0.1, vector_count=100_000)
    assert sc.recommend(now=10).action == REBALANCE
    # balanced shards + hot data -> promote
    sc.update_shard_load("s2", cpu=0.8, vector_count=800_000)
    for _ in range(3):
        sc.record_access("v-hot", now=5)
    d = sc.recommend(now=10)
    assert d.action == PROMOTE_TO_HOT and d.amount == 1
    # no hot data but stale data -> demote
    sc3 = AutoScaler(ScalingConfig(enable_prediction=False,
                                   cold_tier_hours=1))
    sc3.record_metrics(mp(0, cpu=0.6))
    sc3.record_access("v-old", now=0)
    d = sc3.recommend(now=7200)
    assert d.action == DEMOTE_TO_COLD and d.amount == 1


def test_history_immune_to_setter_mutation():
    # record_* setters mutate self.current; stored history samples must
    # keep their original values (code-review finding)
    sc = AutoScaler(ScalingConfig())
    sc.record_metrics(mp(0, cpu=0.2))
    sc.record_cpu_usage(0.99)
    assert sc.predictor.history[-1].cpu_utilization == 0.2
    assert sc.current.cpu_utilization == 0.99


def test_seasonality_reachable_with_defaults():
    # the default AutoScaler predictor must retain >= 2 days of minute
    # samples so detect_seasonality can ever fire
    sc = AutoScaler(ScalingConfig())
    assert sc.predictor.max_history >= 2880
    for i in range(2880):
        sc.record_metrics(mp(i * 60, qps=500.0 if (i * 60 % 86400) //
                             3600 == 9 else 50.0))
    s = sc.predictor.detect_seasonality()
    assert s is not None and s.peak_hour == 9
