"""Operational metrics — metrics.rs parity: registry + timers +
Prometheus export, Grafana/alerting generation, anomaly detection."""

import json

import pytest

from needle_spark.catalog import Collection
from needle_spark.observe import (
    AlertingConfig,
    AnomalyDetector,
    GrafanaDashboardConfig,
    MetricsRegistry,
    generate_alerting_rules,
    generate_grafana_dashboard,
)


def test_counters_and_errors_export():
    m = MetricsRegistry()
    with m.operation("docs", "insert"):
        pass
    with m.operation("docs", "insert"):
        pass
    m.error("docs", "insert", "dimension_mismatch")
    text = m.export()
    assert 'needle_operations_total{collection="docs",operation="insert"} 2' in text
    assert ('needle_errors_total{collection="docs",'
            'error_type="dimension_mismatch",operation="insert"} 1') in text
    assert "# TYPE needle_operations_total counter" in text


def test_histogram_buckets_cumulative():
    m = MetricsRegistry()
    m.record_search_results("docs", 3)
    m.record_search_results("docs", 7)
    m.record_search_results("docs", 5000)  # beyond the largest bucket
    text = m.export()
    # buckets are cumulative; 3 <= 5, 7 <= 10, 5000 -> +Inf only
    assert 'le="5"} 1' in text
    assert 'le="10"} 2' in text
    assert 'le="+Inf"} 3' in text
    assert 'needle_search_result_count_count{collection="docs"} 3' in text


def test_operation_timer_records_duration():
    m = MetricsRegistry()
    with m.operation("docs", "search"):
        pass
    key = next(k for k in m.histograms
               if k[0] == "needle_operation_duration_seconds")
    h = m.histograms[key]
    assert h.n == 1 and h.total >= 0.0


def test_collection_gauges_from_real_collection(spark, tmp_path):
    coll = Collection.create(spark, str(tmp_path / "c"), dims=3)
    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0]), ("b", [0.0, 1.0, 0.0])],
        "id string, vector array<float>"))
    m = MetricsRegistry()
    m.update_from_collection(coll)
    text = m.export()
    assert 'needle_collection_vectors_total{collection="c"} 2' in text
    assert 'needle_collection_dimensions{collection="c"} 3' in text


def test_grafana_dashboard_shape():
    out = json.loads(generate_grafana_dashboard(
        GrafanaDashboardConfig(title="T", uid="u1", datasource_uid="ds",
                               refresh_interval="5s")))
    assert out["title"] == "T" and out["uid"] == "u1"
    assert out["refresh"] == "5s"
    assert len(out["panels"]) == 7
    exprs = [p["targets"][0]["expr"] for p in out["panels"]]
    assert "rate(needle_operations_total[5m])" in exprs
    assert any("histogram_quantile(0.95" in e for e in exprs)
    tmpl = out["templating"]["list"][0]
    assert tmpl["name"] == "collection"
    assert tmpl["datasource"]["uid"] == "ds"


def test_alerting_rules_yaml():
    yaml = generate_alerting_rules(AlertingConfig(
        error_rate_threshold=0.1, latency_threshold_ms=250.0,
        memory_threshold_bytes=1024))
    assert "NeedleHighErrorRate" in yaml and "> 0.1" in yaml
    assert "NeedleHighLatency" in yaml and "> 0.25" in yaml
    assert "NeedleHighMemoryUsage" in yaml and "> 1024" in yaml
    assert "NeedleNoOperations" in yaml and "NeedleIndexUnhealthy" in yaml
    assert yaml.startswith("groups:")
    # default thresholds — metrics.rs:1215-1221
    dflt = generate_alerting_rules()
    assert "> 0.05" in dflt and "> 0.1\n" in dflt.replace("for: ", "")


def test_anomaly_detector_warmup_and_flag():
    det = AnomalyDetector(window_size=5, threshold_sigmas=3.0)
    # warmup: never anomalous — metrics.rs:1274-1283
    for v in (10.0, 10.5, 9.5, 10.2, 9.8):
        assert det.check(v).is_anomaly is False
    normal = det.check(10.1)
    assert normal.is_anomaly is False and abs(normal.z_score) < 3
    spike = det.check(100.0)
    assert spike.is_anomaly is True and spike.z_score > 3
    assert spike.mean == pytest.approx(10.02, abs=0.2)
    det.reset()
    assert det.check(1000.0).is_anomaly is False  # warmup again


def test_anomaly_zero_variance():
    det = AnomalyDetector(window_size=3, threshold_sigmas=2.0)
    for _ in range(3):
        det.check(5.0)
    r = det.check(5.0)
    assert r.std_dev == 0.0 and r.z_score == 0.0 and not r.is_anomaly
