"""Adaptive query optimizer (query_optimizer.rs): cost estimation,
feedback calibration, accuracy reporting."""

from needle_spark.plans.adaptive import AdaptiveOptimizer, OptimizerConfig
from needle_spark.plans.planner import CollectionStats


def test_optimize_strategies_and_explain():
    opt = AdaptiveOptimizer()
    small = CollectionStats(num_vectors=100, dims=64)
    big = CollectionStats(num_vectors=10_000_000, dims=384)

    p = opt.optimize(small, k=10)
    assert p.strategy == "brute_force"
    assert p.plan_id == "qp_1" and "Plan: brute_force" in p.explain
    assert p.calibration_accuracy is None  # no feedback yet
    assert p.calibrated_ms == p.estimated_ms  # factor 1.0 initially

    # two ANDed equalities -> selectivity 0.01 < 0.05 threshold
    sel = opt.optimize(big, k=10, flt={"$and": [{"a": 1}, {"b": 2}]})
    assert sel.strategy == "filter_then_scan"
    assert sel.distance_computations < big.num_vectors  # selectivity applied

    txt = opt.optimize(big, k=10, has_text_query=True)
    assert txt.strategy == "hybrid"
    assert opt.total_queries == 3


def test_calibration_feedback_loop():
    opt = AdaptiveOptimizer(OptimizerConfig(calibration_threshold=5))
    stats = CollectionStats(num_vectors=1000, dims=64)
    # the model under-estimates by 2x on this "cluster": feed that back
    for _ in range(5):
        p = opt.optimize(stats, k=10)
        opt.record_execution(p.plan_id, actual_ms=p.estimated_ms * 2.0,
                             estimated_ms=p.estimated_ms)
    p = opt.optimize(stats, k=10)
    assert abs(p.calibrated_ms - p.estimated_ms * 2.0) < 1e-9
    # accuracy = 1 - |avg(2.0) - 1| = 0
    assert p.calibration_accuracy == 0.0

    # perfect estimates -> accuracy 1.0
    opt2 = AdaptiveOptimizer(OptimizerConfig(calibration_threshold=3))
    for _ in range(3):
        q = opt2.optimize(stats, k=10)
        opt2.record_execution(q.plan_id, actual_ms=q.estimated_ms,
                              estimated_ms=q.estimated_ms)
    assert opt2.calibration_accuracy("brute_force") == 1.0


def test_history_bounds():
    opt = AdaptiveOptimizer(OptimizerConfig(history_size=4, calibration_threshold=2))
    stats = CollectionStats(num_vectors=10, dims=2)
    for i in range(10):
        p = opt.optimize(stats, k=1)
        opt.record_execution(p.plan_id, actual_ms=1.0, estimated_ms=1.0)
    assert opt.history_len() == 4
