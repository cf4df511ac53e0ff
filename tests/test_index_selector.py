"""Adaptive index selection (adaptive_index_selector.rs): workload
observation, size/memory/latency scoring, migration planning."""

import pytest

from needle_spark.plans.index_selector import (
    AdaptiveSelector,
    WorkloadProfile,
)


def test_size_based_recommendation():
    s = AdaptiveSelector()
    small = s.recommend(10_000, 64)
    assert small.strategy == "brute_force"
    assert small.confidence == 0.5  # 3.0 / 6
    assert "exact scan" in small.rationale[0]

    huge = s.recommend(50_000_000, 384)
    assert huge.strategy in ("ivf", "ivf_quantized")
    assert huge.suggested_params.get("nlist")
    # nlist ~ sqrt(n), nprobe = nlist/10
    nlist = int(huge.suggested_params["nlist"])
    assert abs(nlist - int(50_000_000 ** 0.5)) <= 1
    assert int(huge.suggested_params["nprobe"]) == min(nlist // 10, 256)


def test_workload_and_budget_scoring():
    s = AdaptiveSelector().with_memory_budget(100 << 20)  # 100 MB
    for _ in range(6):
        s.observe_query(WorkloadProfile.filtered_query(128, 10, 0.05))
    for _ in range(4):
        s.observe_query(WorkloadProfile.batch_query(128, 10, 64))
    rec = s.recommend(1_000_000, 384)  # ~1.5 GB > budget
    assert rec.strategy == "ivf_quantized"
    assert rec.suggested_params["quantizer"] == "sq8"
    assert any("memory budget" in r.lower() for r in rec.rationale)
    assert any("filtered" in r for r in rec.rationale)
    assert any("batch" in r for r in rec.rationale)
    # alternatives carry the rest of the ranking
    assert ("ivf" in dict(rec.alternatives))

    with pytest.raises(ValueError, match="query type"):
        s.observe_query(WorkloadProfile("psychic", 128, 10))


def test_latency_target_and_migration():
    s = AdaptiveSelector().with_latency_target(5.0)
    for ms in (8.0, 9.0, 10.0, 2.0):
        s.record_latency(ms)
    p50, p95, p99 = s.latency_stats()
    assert p50 == 9.0 and p99 == 10.0
    rec = s.recommend(5_000_000, 128)
    assert any("p50" in r for r in rec.rationale)

    s.current_strategy = "brute_force"
    mig = s.should_migrate(5_000_000, 128)
    assert mig is not None and mig.strategy != "brute_force"
    plan = s.migration_plan("brute_force", mig.strategy, 5_000_000)
    assert plan.downtime_free and plan.estimated_minutes == 2.5
    assert any("CDC" in step for step in plan.steps)
    assert any("manifest" in step for step in plan.steps)

    s.current_strategy = mig.strategy
    assert s.should_migrate(5_000_000, 128) is None  # already there
