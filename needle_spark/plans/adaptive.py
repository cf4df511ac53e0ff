"""Adaptive query optimizer: cost estimation calibrated by observed
execution feedback.

Reference: /root/reference/src/services/search/query_optimizer.rs —
OptimizerConfig (:42-62: bounded history, calibration threshold),
optimize (:143-205: plan + calibrated latency + accuracy + explain
text), record_execution[_with_index] (:207-252), calibration_accuracy
(:253-277: accuracy = 1 - |avg(actual/estimated) - 1|), recalibrate
(:289: per-strategy average ratio becomes the calibration factor).

Spark mapping: the strategy comes from plans.planner.choose_strategy;
the cost model estimates a fused scan's latency from rows x dims
throughput plus the fixed job-scheduling floor (the dominant term in
Spark), and the calibration loop corrects both against measured runs —
which is exactly what makes a static model usable across cluster
sizes."""

from __future__ import annotations

from dataclasses import dataclass, field

from needle_spark.plans.planner import CollectionStats, choose_strategy, estimate_selectivity

# deterministic prior cost model (calibration corrects these):
# ~50M float distance-ops/sec/core and a fixed per-job floor
_OPS_PER_MS = 50_000.0
_JOB_FLOOR_MS = 300.0


@dataclass
class OptimizerConfig:
    """query_optimizer.rs:42-62."""

    history_size: int = 1000
    calibration_threshold: int = 10
    parallelism: int = 32


@dataclass
class CalibrationEntry:
    strategy: str
    estimated_ms: float
    actual_ms: float


@dataclass
class ExplainOutput:
    """query_optimizer.rs:93-117."""

    plan_id: str
    strategy: str
    estimated_ms: float
    calibrated_ms: float
    calibration_accuracy: float | None
    distance_computations: int
    explain: str


class AdaptiveOptimizer:
    """Plan + learn loop (query_optimizer.rs:120-320)."""

    def __init__(self, config: OptimizerConfig | None = None):
        self.config = config or OptimizerConfig()
        self.history: list[CalibrationEntry] = []
        self.calibration_factors: dict[str, float] = {}
        self.total_queries = 0
        self._next_id = 1
        self._plans: dict[str, str] = {}  # plan_id -> strategy

    # ------------------------------------------------------- costing --
    def _estimate(self, stats: CollectionStats, k: int,
                  selectivity: float, strategy: str) -> tuple[float, int]:
        rows = max(stats.num_vectors, 1)
        dims = max(stats.dims, 1)
        if strategy == "filter_then_scan":
            rows = max(1, int(rows * selectivity))
        elif strategy == "ivf_probe":
            nlist = max(getattr(stats, "ivf_nlist", 0) or 64, 1)
            nprobe = max(getattr(stats, "ivf_nprobe", 0) or 8, 1)
            rows = max(1, rows * nprobe // nlist)
        comps = rows
        ms = _JOB_FLOOR_MS + (rows * dims) / (
            _OPS_PER_MS * max(self.config.parallelism, 1))
        return ms, comps

    def optimize(self, stats: CollectionStats, k: int = 10,
                 flt=None, has_text_query: bool = False) -> ExplainOutput:
        """Pick a strategy, estimate cost, apply the learned calibration
        factor, and render the EXPLAIN text (optimize :143-205)."""
        self.total_queries += 1
        strategy = choose_strategy(stats, flt=flt, has_text_query=has_text_query)
        sel = estimate_selectivity(flt)
        est_ms, comps = self._estimate(stats, k, sel, strategy)
        factor = self.calibration_factors.get(strategy, 1.0)
        cal_ms = est_ms * factor
        acc = self.calibration_accuracy(strategy)
        plan_id = f"qp_{self._next_id}"
        self._next_id += 1
        self._plans[plan_id] = strategy
        acc_txt = "N/A (insufficient data)" if acc is None else f"{acc * 100.0:.1f}%"
        explain = (
            f"Plan: {strategy}\n"
            f"Estimated latency: {est_ms:.2f}ms\n"
            f"Calibrated latency: {cal_ms:.2f}ms\n"
            f"Distance computations: {comps}\n"
            f"Filter selectivity: {sel:.3f}\n"
            f"Calibration accuracy: {acc_txt}"
        )
        return ExplainOutput(
            plan_id=plan_id, strategy=strategy, estimated_ms=est_ms,
            calibrated_ms=cal_ms, calibration_accuracy=acc,
            distance_computations=comps, explain=explain,
        )

    # ------------------------------------------------------ feedback --
    def record_execution(self, plan_id: str, actual_ms: float,
                         estimated_ms: float | None = None) -> None:
        """record_execution (:207): feed measured latency back; the
        strategy is recovered from the plan id."""
        strategy = self._plans.get(plan_id, "brute_force")
        est = estimated_ms
        if est is None:
            est = actual_ms  # reference fallback when estimate unknown
        self.record_execution_with_strategy(strategy, est, actual_ms)

    def record_execution_with_strategy(self, strategy: str,
                                       estimated_ms: float,
                                       actual_ms: float) -> None:
        """record_execution_with_index (:231)."""
        self.history.append(CalibrationEntry(strategy, estimated_ms, actual_ms))
        del self.history[:-self.config.history_size]
        self._recalibrate()

    def _recalibrate(self) -> None:
        """recalibrate (:289): per-strategy avg(actual/estimated)
        becomes the multiplicative correction."""
        for strategy in {e.strategy for e in self.history}:
            ratios = [e.actual_ms / e.estimated_ms for e in self.history
                      if e.strategy == strategy and e.estimated_ms > 0]
            if len(ratios) >= self.config.calibration_threshold:
                self.calibration_factors[strategy] = sum(ratios) / len(ratios)

    def calibration_accuracy(self, strategy: str) -> float | None:
        """:253 — 1 - |avg ratio - 1|, None below the sample
        threshold."""
        ratios = [e.actual_ms / e.estimated_ms for e in self.history
                  if e.strategy == strategy and e.estimated_ms > 0]
        if len(ratios) < self.config.calibration_threshold:
            return None
        avg = sum(ratios) / len(ratios)
        return 1.0 - min(abs(avg - 1.0), 1.0)

    def history_len(self) -> int:
        return len(self.history)
