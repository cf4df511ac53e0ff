"""Operational metrics: Prometheus-format counters/gauges/histograms
with operation timers, Grafana dashboard + alerting-rule generation,
and a rolling sigma-threshold anomaly detector.

Reference: /root/reference/src/metrics.rs — NeedleMetrics metric
families + bucket sets (:357-470: needle_operations_total,
needle_errors_total, needle_operation_duration_seconds,
needle_search_result_count, collection gauges, memory gauges),
operation timer (:505-517, :600-614: records duration on exit),
error/record_search_results/update_collection/update_memory
(:520-586), Prometheus text export (:588-597),
generate_grafana_dashboard (:921-1030: 7 panels with the exact
PromQL), GrafanaDashboardConfig (:1033-1060),
generate_alerting_rules (:1131-1200: 5 rules), AlertingConfig
(:1204-1222: 5% errors / 100ms p95 / 8 GiB defaults),
AnomalyDetector (:1253-1316: rolling window, z-score vs sigma
threshold, warmup passes), AnomalyResult (:1319-1331).
IngestionMetrics counters (:150-261) are covered by
streaming/reliability.py.

Altitude: metrics are O(metric-series), not O(data) — the registry is
plain driver-side state (a Spark job's executors report through the
SparkListener/accumulator machinery, which plans/profiler.py taps).
The only data-touching helper, `update_from_collection`, derives the
collection gauges from ONE count aggregation."""

from __future__ import annotations

import json
import math
import time
from collections import deque
from dataclasses import dataclass, field

#: Histogram bucket sets — metrics.rs:393-414.
DURATION_BUCKETS = (0.0001, 0.0005, 0.001, 0.005, 0.01, 0.05, 0.1, 0.5, 1.0)
SEARCH_RESULT_BUCKETS = (1.0, 5.0, 10.0, 20.0, 50.0, 100.0, 500.0, 1000.0)


class _Histogram:
    def __init__(self, buckets):
        self.buckets = tuple(buckets)
        self.counts = [0] * (len(self.buckets) + 1)  # +inf tail
        self.total = 0.0
        self.n = 0

    def observe(self, v: float) -> None:
        self.total += v
        self.n += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1


class MetricsRegistry:
    """NeedleMetrics — metrics.rs:357-586, Prometheus text export
    :588-597."""

    def __init__(self):
        self.counters: dict[tuple, float] = {}
        self.gauges: dict[tuple, float] = {}
        self.histograms: dict[tuple, _Histogram] = {}

    # -- recording --

    def inc(self, name: str, labels: dict[str, str], by: float = 1.0) -> None:
        key = (name, tuple(sorted(labels.items())))
        self.counters[key] = self.counters.get(key, 0.0) + by

    def set_gauge(self, name: str, labels: dict[str, str], value: float) -> None:
        self.gauges[(name, tuple(sorted(labels.items())))] = float(value)

    def observe(self, name: str, labels: dict[str, str], value: float,
                buckets=DURATION_BUCKETS) -> None:
        key = (name, tuple(sorted(labels.items())))
        if key not in self.histograms:
            self.histograms[key] = _Histogram(buckets)
        self.histograms[key].observe(value)

    def operation(self, collection: str, operation: str) -> "OperationTimer":
        """metrics.rs:505-517 — counts the op now, times it on exit."""
        self.inc("needle_operations_total",
                 {"collection": collection, "operation": operation})
        return OperationTimer(self, collection, operation)

    def error(self, collection: str, operation: str, error_type: str) -> None:
        """metrics.rs:520-526."""
        self.inc("needle_errors_total",
                 {"collection": collection, "operation": operation,
                  "error_type": error_type})

    def record_search_results(self, collection: str, count: int) -> None:
        """metrics.rs:528-534."""
        self.observe("needle_search_result_count",
                     {"collection": collection}, float(count),
                     buckets=SEARCH_RESULT_BUCKETS)

    def update_collection(self, collection: str, vectors: int, deleted: int,
                          dims: int) -> None:
        """metrics.rs:552-564."""
        lbl = {"collection": collection}
        self.set_gauge("needle_collection_vectors_total", lbl, vectors)
        self.set_gauge("needle_collection_deleted_vectors", lbl, deleted)
        self.set_gauge("needle_collection_dimensions", lbl, dims)

    def update_memory(self, collection: str, vectors: int, metadata: int,
                      index: int) -> None:
        """metrics.rs:574-586."""
        for kind, v in (("vectors", vectors), ("metadata", metadata),
                        ("index", index)):
            self.set_gauge("needle_collection_memory_bytes",
                           {"collection": collection, "kind": kind}, v)

    def update_from_collection(self, collection) -> None:
        """Derive the collection gauges from the real catalog state —
        one count aggregation, no data collected."""
        self.update_collection(
            collection.path.rstrip("/").rsplit("/", 1)[-1],
            vectors=collection.count(), deleted=0, dims=collection.dims)

    # -- export --

    def export(self) -> str:
        """Prometheus text exposition format — metrics.rs:588-597."""
        out: list[str] = []

        def fmt_labels(label_items) -> str:
            if not label_items:
                return ""
            inner = ",".join(f'{k}="{v}"' for k, v in label_items)
            return "{" + inner + "}"

        for (name, labels), v in sorted(self.counters.items()):
            out.append(f"# TYPE {name} counter")
            out.append(f"{name}{fmt_labels(labels)} {v:g}")
        for (name, labels), v in sorted(self.gauges.items()):
            out.append(f"# TYPE {name} gauge")
            out.append(f"{name}{fmt_labels(labels)} {v:g}")
        for (name, labels), h in sorted(self.histograms.items()):
            out.append(f"# TYPE {name} histogram")
            cum = 0
            for b, c in zip(h.buckets, h.counts):
                cum += c
                out.append(
                    f'{name}_bucket{fmt_labels(tuple(labels) + (("le", f"{b:g}"),))} {cum}')
            cum += h.counts[-1]
            out.append(
                f'{name}_bucket{fmt_labels(tuple(labels) + (("le", "+Inf"),))} {cum}')
            out.append(f"{name}_sum{fmt_labels(labels)} {h.total:g}")
            out.append(f"{name}_count{fmt_labels(labels)} {h.n}")
        return "\n".join(out) + "\n"


class OperationTimer:
    """metrics.rs:600-614 — context manager instead of Drop."""

    def __init__(self, registry: MetricsRegistry, collection: str,
                 operation: str):
        self.registry = registry
        self.collection = collection
        self.operation = operation
        self.start = time.monotonic()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.registry.observe(
            "needle_operation_duration_seconds",
            {"collection": self.collection, "operation": self.operation},
            time.monotonic() - self.start)
        return False


# ------------------------------------------------------------- grafana


@dataclass
class GrafanaDashboardConfig:
    """metrics.rs:1033-1060."""

    title: str = "Needle Vector Database"
    uid: str = "needle-dashboard"
    datasource_uid: str = "prometheus"
    refresh_interval: str = "30s"


#: (id, title, expr, panel type, gridPos) — metrics.rs:922-980.
_PANELS = (
    (1, "Operations per Second", "rate(needle_operations_total[5m])",
     "timeseries", (0, 0, 12, 8)),
    (2, "Error Rate", "rate(needle_errors_total[5m])",
     "timeseries", (12, 0, 12, 8)),
    (3, "Operation Latency (p95)",
     "histogram_quantile(0.95, rate(needle_operation_duration_seconds_bucket[5m]))",
     "timeseries", (0, 8, 12, 8)),
    (4, "Total Vectors", "sum(needle_collection_vectors_total)",
     "stat", (12, 8, 6, 8)),
    (5, "Memory Usage", "sum(needle_collection_memory_bytes)",
     "gauge", (18, 8, 6, 8)),
    (6, "Search Results per Query",
     'rate(needle_search_results_total[5m]) / rate(needle_operations_total{operation="search"}[5m])',
     "timeseries", (0, 16, 12, 8)),
    (7, "HTTP Requests per Second", "rate(needle_http_requests_total[5m])",
     "timeseries", (12, 16, 12, 8)),
)


def generate_grafana_dashboard(
    config: GrafanaDashboardConfig | None = None,
) -> str:
    """metrics.rs:921-1030 — same panels, PromQL, and templating."""
    config = config or GrafanaDashboardConfig()
    panels = [
        {
            "id": pid,
            "title": title,
            "type": ptype,
            "gridPos": {"x": x, "y": y, "w": w, "h": h},
            "datasource": {"type": "prometheus",
                           "uid": config.datasource_uid},
            "targets": [{"expr": expr, "refId": "A"}],
        }
        for pid, title, expr, ptype, (x, y, w, h) in _PANELS
    ]
    dashboard = {
        "annotations": {"list": []},
        "editable": True,
        "panels": panels,
        "refresh": config.refresh_interval,
        "schemaVersion": 38,
        "tags": ["needle", "vector-db"],
        "templating": {"list": [{
            "datasource": {"type": "prometheus",
                           "uid": config.datasource_uid},
            "definition": "label_values(needle_operations_total, collection)",
            "includeAll": True,
            "label": "Collection",
            "multi": True,
            "name": "collection",
            "query": {
                "query": "label_values(needle_operations_total, collection)"},
            "type": "query",
        }]},
        "time": {"from": "now-1h", "to": "now"},
        "title": config.title,
        "uid": config.uid,
        "version": 1,
    }
    return json.dumps(dashboard, indent=2)


# ------------------------------------------------------------ alerting


@dataclass
class AlertingConfig:
    """metrics.rs:1204-1222."""

    error_rate_threshold: float = 0.05
    latency_threshold_ms: float = 100.0
    memory_threshold_bytes: int = 8 * 1024 * 1024 * 1024


def generate_alerting_rules(config: AlertingConfig | None = None) -> str:
    """metrics.rs:1131-1200 — the same 5 rules as Prometheus YAML."""
    c = config or AlertingConfig()
    rules = (
        ("NeedleHighErrorRate",
         f"rate(needle_errors_total[5m]) / rate(needle_operations_total[5m])"
         f" > {c.error_rate_threshold}",
         "5m", "warning", "High error rate in Needle operations"),
        ("NeedleHighLatency",
         "histogram_quantile(0.95, "
         "rate(needle_operation_duration_seconds_bucket[5m]))"
         f" > {c.latency_threshold_ms / 1000.0}",
         "5m", "warning", "High latency in Needle operations"),
        ("NeedleHighMemoryUsage",
         f"sum(needle_collection_memory_bytes) > {c.memory_threshold_bytes}",
         "10m", "warning", "High memory usage in Needle"),
        ("NeedleNoOperations",
         "rate(needle_operations_total[10m]) == 0",
         "15m", "info", "No Needle operations detected"),
        ("NeedleIndexUnhealthy",
         "needle_index_health < 1",
         "5m", "critical", "Needle index is unhealthy"),
    )
    body = "\n".join(
        f"""      - alert: {name}
        expr: {expr}
        for: {dur}
        labels:
          severity: {sev}
        annotations:
          summary: "{summary}\""""
        for name, expr, dur, sev, summary in rules
    )
    return f"groups:\n  - name: needle_alerts\n    rules:\n{body}\n"


# ------------------------------------------------------------- anomaly


@dataclass
class AnomalyResult:
    """metrics.rs:1319-1331."""

    is_anomaly: bool
    value: float
    mean: float
    std_dev: float
    z_score: float


class AnomalyDetector:
    """metrics.rs:1253-1316 — rolling-window z-score.  During warmup
    (window not yet full) nothing is anomalous; afterwards the window
    stats EXCLUDE the value under test (matching the reference's
    check-then-slide order)."""

    def __init__(self, window_size: int, threshold_sigmas: float):
        self.window: deque[float] = deque()
        self.window_size = window_size
        self.threshold_sigmas = threshold_sigmas

    def check(self, value: float) -> AnomalyResult:
        if len(self.window) < self.window_size:
            self.window.append(value)
            return AnomalyResult(False, value, value, 0.0, 0.0)
        mean = sum(self.window) / len(self.window)
        var = sum((x - mean) ** 2 for x in self.window) / len(self.window)
        std = math.sqrt(var)
        z = (value - mean) / std if std > 0 else 0.0
        self.window.popleft()
        self.window.append(value)
        return AnomalyResult(abs(z) > self.threshold_sigmas, value, mean,
                             std, z)

    def reset(self) -> None:
        self.window.clear()
