"""Predictive auto-scaling advisor: Holt double-exponential load
prediction, daily seasonality detection, hot/cold access tracking, and
policy-driven scale recommendations with cooldown, scheduling, and
emergency paths.

Reference: /root/reference/src/enterprise/autoscaling.rs —
ScalingConfig (:51-108: 1-32 shards, 70% CPU / 80% mem / 50 ms
targets, 1.3x up / 0.5x down thresholds, 300 s cooldown),
ScalingAction/Reason (:149-181), MetricPoint (:184-226),
ScalingDecision (:250-265), LoadPredictor (:268-397: Holt smoothing
alpha=0.3 beta=0.1, 5-minute horizon in 1-minute steps, clamped;
hourly-average seasonality with peak/trough), AccessTracker
(:413-519: per-id sliding window, hot = >=threshold recent accesses,
cold = no access for N hours), AutoScaler (:521-...): record_*
(:578-605), recommend = cooldown -> scheduled -> analyze ->
predict(300 s) -> decide (:607-640), make_decision precedence:
emergency (>95% CPU/mem, +2 shards, conf .95) > predicted load
(conf .8) > current pressure with dominant-metric reason (conf .85)
> low utilization scale-down (conf .75) (:700-830),
acknowledge_scaling + bounded history (:640-648).

Spark disposition: "shards" here are the serving layout's partition
groups — a ScaleUp recommendation maps to `plans/rebalance.py`'s
add-shard migration plan, tier promotions map to `plans/tiering.py`,
and executor counts belong to the cluster manager's own autoscaler
(Spark dynamic allocation).  This module is the ADVISORY brain at the
reference's altitude: O(metrics) driver-side state, injected clocks,
no Spark jobs."""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field, replace

NONE = "none"
SCALE_UP = "scale_up"
SCALE_DOWN = "scale_down"
REBALANCE = "rebalance"
PROMOTE_TO_HOT = "promote_to_hot"
DEMOTE_TO_COLD = "demote_to_cold"
EMERGENCY_SCALE = "emergency_scale"


@dataclass
class ScalingConfig:
    """autoscaling.rs:51-108."""

    min_shards: int = 1
    max_shards: int = 32
    target_cpu_utilization: float = 0.7
    target_memory_utilization: float = 0.8
    target_latency_ms: float = 50.0
    scale_up_threshold: float = 1.3
    scale_down_threshold: float = 0.5
    cooldown_seconds: int = 300
    prediction_window: int = 60
    enable_prediction: bool = True
    scale_up_increment: int = 1
    scale_down_increment: int = 1
    metrics_retention_seconds: int = 3600
    enable_tiering: bool = True
    hot_tier_threshold: int = 100
    cold_tier_hours: int = 168


@dataclass
class MetricPoint:
    """autoscaling.rs:184-226."""

    timestamp: int = 0
    cpu_utilization: float = 0.0
    memory_utilization: float = 0.0
    query_latency_ms: float = 0.0
    qps: float = 0.0
    connections: int = 0
    vector_count: int = 0
    shard_count: int = 1


@dataclass
class ScalingDecision:
    """autoscaling.rs:250-265."""

    action: str
    amount: int = 0
    reason: str = "manual"
    confidence: float = 1.0
    context: str = ""
    timestamp: int = 0
    predicted: MetricPoint | None = None


@dataclass
class SeasonalityPattern:
    """autoscaling.rs:399-410."""

    period_hours: int
    peak_hour: int
    peak_load: float
    trough_hour: int
    trough_load: float


class LoadPredictor:
    """autoscaling.rs:268-397 — Holt double-exponential smoothing."""

    ALPHA = 0.3
    BETA = 0.1

    def __init__(self, max_history: int = 4320,
                 seasonality_period: int = 86400,
                 prediction_window: int = 60):
        # history holds up to 3 days of minute samples so seasonality
        # (which needs 2 periods) is reachable; Holt smoothing only
        # consumes the last `prediction_window` points
        self.history: deque[MetricPoint] = deque()
        self.max_history = max(max_history, 2 * seasonality_period // 60)
        self.seasonality_period = seasonality_period
        self.prediction_window = prediction_window

    def add_point(self, point: MetricPoint) -> None:
        if len(self.history) >= self.max_history:
            self.history.popleft()
        self.history.append(point)

    def _holt(self, values: list[float]) -> tuple[float, float]:
        smoothed, trend = values[0], 0.0
        for v in values[1:]:
            prev = smoothed
            smoothed = self.ALPHA * v + (1 - self.ALPHA) * (smoothed + trend)
            trend = self.BETA * (smoothed - prev) + (1 - self.BETA) * trend
        return smoothed, trend

    def predict(self, horizon_seconds: int) -> MetricPoint | None:
        """autoscaling.rs:295-354: None until 3 points; 1-minute
        steps; cpu/mem clamped to [0,1], latency/qps floored at 0."""
        if len(self.history) < 3:
            return None
        pts = list(self.history)[-self.prediction_window:]
        steps = max(horizon_seconds // 60, 1)
        s_cpu, t_cpu = self._holt([p.cpu_utilization for p in pts])
        s_mem, t_mem = self._holt([p.memory_utilization for p in pts])
        s_lat, t_lat = self._holt([p.query_latency_ms for p in pts])
        s_qps, t_qps = self._holt([p.qps for p in pts])
        last = pts[-1]
        return MetricPoint(
            timestamp=last.timestamp + horizon_seconds,
            cpu_utilization=min(1.0, max(0.0, s_cpu + steps * t_cpu)),
            memory_utilization=min(1.0, max(0.0, s_mem + steps * t_mem)),
            query_latency_ms=max(0.0, s_lat + steps * t_lat),
            qps=max(0.0, s_qps + steps * t_qps),
            connections=last.connections,
            vector_count=last.vector_count,
            shard_count=last.shard_count,
        )

    def detect_seasonality(self) -> SeasonalityPattern | None:
        """autoscaling.rs:356-397 — hourly QPS averages; needs two
        periods of minute-grained history."""
        if len(self.history) < 2 * self.seasonality_period // 60:
            return None
        hourly: dict[int, list[float]] = {}
        for p in self.history:
            hourly.setdefault((p.timestamp % 86400) // 3600, []).append(p.qps)
        pattern = {h: sum(v) / len(v) for h, v in hourly.items()}
        peak = max(pattern, key=pattern.get)
        trough = min(pattern, key=pattern.get)
        return SeasonalityPattern(24, peak, pattern[peak], trough,
                                  pattern[trough])


class AccessTracker:
    """autoscaling.rs:413-519."""

    def __init__(self, hot_window: int = 3600,
                 retention_period: int = 7 * 86400):
        self.hot_window = hot_window
        self.retention_period = retention_period
        self._accesses: dict[str, deque[int]] = {}
        self._last: dict[str, int] = {}

    def record_access(self, vector_id: str, *, now: int | None = None):
        ts = int(time.time()) if now is None else now
        dq = self._accesses.setdefault(vector_id, deque())
        dq.append(ts)
        self._last[vector_id] = ts
        while dq and ts - dq[0] > self.retention_period:
            dq.popleft()

    def get_hot_vectors(self, threshold: int,
                        *, now: int | None = None) -> list[str]:
        ts = int(time.time()) if now is None else now
        return sorted(
            vid for vid, dq in self._accesses.items()
            if sum(1 for a in dq if ts - a < self.hot_window) >= threshold)

    def get_cold_vectors(self, cold_hours: int,
                         *, now: int | None = None) -> list[str]:
        ts = int(time.time()) if now is None else now
        cutoff = cold_hours * 3600
        return sorted(vid for vid, last in self._last.items()
                      if ts - last >= cutoff)


@dataclass
class ScheduledScaling:
    """autoscaling.rs:544-556."""

    scheduled_time: int
    action: str
    amount: int = 0
    description: str = ""
    enabled: bool = True


class AutoScaler:
    """autoscaling.rs:521-860."""

    def __init__(self, config: ScalingConfig | None = None):
        self.config = config or ScalingConfig()
        self.predictor = LoadPredictor(
            prediction_window=self.config.prediction_window)
        self.access_tracker = AccessTracker(
            retention_period=self.config.metrics_retention_seconds * 24)
        self.current = MetricPoint()
        self.shard_loads: dict[str, float] = {}
        self.scheduled_actions: list[ScheduledScaling] = []
        self.scaling_history: list[ScalingDecision] = []
        self.max_history = 100
        self._last_scaling_at: int | None = None

    # -- recording --

    def record_metrics(self, metrics: MetricPoint) -> None:
        self.current = metrics
        # history keeps its own copy: the record_* setters below mutate
        # self.current in place and must not rewrite stored samples
        self.predictor.add_point(replace(metrics))

    def record_query_latency(self, latency_ms: float) -> None:
        self.current.query_latency_ms = latency_ms

    def record_cpu_usage(self, utilization: float) -> None:
        self.current.cpu_utilization = min(1.0, max(0.0, utilization))

    def record_memory_usage(self, utilization: float) -> None:
        self.current.memory_utilization = min(1.0, max(0.0, utilization))

    def record_qps(self, qps: float) -> None:
        self.current.qps = qps

    def record_access(self, vector_id: str, *, now: int | None = None):
        self.access_tracker.record_access(vector_id, now=now)

    def update_shard_load(self, shard_id: str, cpu: float,
                          vector_count: int) -> None:
        """autoscaling.rs check_shard_balance load formula."""
        self.shard_loads[shard_id] = cpu * 0.5 + vector_count / 1e6 * 0.5

    def schedule(self, action: ScheduledScaling) -> None:
        self.scheduled_actions.append(action)

    def acknowledge_scaling(self, decision: ScalingDecision,
                            *, now: int | None = None) -> None:
        self._last_scaling_at = int(time.time()) if now is None else now
        if len(self.scaling_history) >= self.max_history:
            self.scaling_history.pop(0)
        self.scaling_history.append(decision)

    # -- decisions --

    def recommend(self, *, now: int | None = None) -> ScalingDecision:
        """autoscaling.rs:607-830 precedence."""
        ts = int(time.time()) if now is None else now
        cfg = self.config
        cur = self.current

        if (self._last_scaling_at is not None
                and ts - self._last_scaling_at < cfg.cooldown_seconds):
            return ScalingDecision(NONE, reason="manual", confidence=1.0,
                                   context="Cooldown period active",
                                   timestamp=ts)

        for sched in self.scheduled_actions:
            if sched.enabled and sched.scheduled_time <= ts:
                return ScalingDecision(
                    sched.action, sched.amount, "scheduled_scaling", 1.0,
                    sched.description, ts)

        predicted = (self.predictor.predict(300)
                     if cfg.enable_prediction else None)

        # emergency: critical pressure, +2 shards
        if ((cur.cpu_utilization > 0.95 or cur.memory_utilization > 0.95)
                and cur.shard_count < cfg.max_shards):
            reason = ("high_cpu_utilization" if cur.cpu_utilization > 0.95
                      else "high_memory_utilization")
            return ScalingDecision(
                EMERGENCY_SCALE, 2, reason, 0.95,
                "Emergency scaling due to critical resource pressure", ts,
                predicted)

        # predicted load increase
        if (predicted is not None
                and predicted.cpu_utilization
                > cfg.target_cpu_utilization * cfg.scale_up_threshold
                and cur.shard_count < cfg.max_shards):
            return ScalingDecision(
                SCALE_UP, cfg.scale_up_increment, "predicted_load_increase",
                0.8,
                f"Predicted CPU utilization: "
                f"{predicted.cpu_utilization * 100:.1f}%", ts, predicted)

        cpu_p = cur.cpu_utilization / cfg.target_cpu_utilization
        mem_p = cur.memory_utilization / cfg.target_memory_utilization
        lat_p = cur.query_latency_ms / cfg.target_latency_ms

        if (max(cpu_p, mem_p, lat_p) > cfg.scale_up_threshold
                and cur.shard_count < cfg.max_shards):
            if lat_p >= cpu_p and lat_p >= mem_p:
                reason = "high_latency"
                ctx = (f"Query latency {cur.query_latency_ms:.1f}ms exceeds "
                       f"target {cfg.target_latency_ms:.1f}ms")
            elif cpu_p > mem_p:
                reason = "high_cpu_utilization"
                ctx = (f"CPU utilization {cur.cpu_utilization * 100:.1f}% "
                       f"exceeds target "
                       f"{cfg.target_cpu_utilization * 100:.1f}%")
            else:
                reason = "high_memory_utilization"
                ctx = (f"Memory utilization "
                       f"{cur.memory_utilization * 100:.1f}% exceeds target "
                       f"{cfg.target_memory_utilization * 100:.1f}%")
            return ScalingDecision(SCALE_UP, cfg.scale_up_increment, reason,
                                   0.85, ctx, ts, predicted)

        if (max(cpu_p, mem_p, lat_p) < cfg.scale_down_threshold
                and cur.shard_count > cfg.min_shards):
            return ScalingDecision(
                SCALE_DOWN, cfg.scale_down_increment, "low_utilization",
                0.75, "All metrics well below target", ts, predicted)

        if not self._shards_balanced():
            return ScalingDecision(
                REBALANCE, 0, "unbalanced_shards", 0.7,
                "Shard load imbalance exceeds 2x", ts, predicted)

        if self.config.enable_tiering:
            hot = self.access_tracker.get_hot_vectors(
                cfg.hot_tier_threshold, now=ts)
            if hot:
                return ScalingDecision(
                    PROMOTE_TO_HOT, len(hot), "hot_data_detected", 0.7,
                    f"{len(hot)} hot vectors", ts, predicted)
            cold = self.access_tracker.get_cold_vectors(
                cfg.cold_tier_hours, now=ts)
            if cold:
                return ScalingDecision(
                    DEMOTE_TO_COLD, len(cold), "cold_data_detected", 0.7,
                    f"{len(cold)} cold vectors", ts, predicted)

        return ScalingDecision(NONE, reason="manual", confidence=1.0,
                               context="Within targets", timestamp=ts,
                               predicted=predicted)

    def _shards_balanced(self) -> bool:
        if len(self.shard_loads) < 2:
            return True
        loads = list(self.shard_loads.values())
        lo = min(loads)
        return max(loads) <= 2 * lo if lo > 0 else max(loads) == 0
