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


# -------------------------------------------------- observability suite


def test_latency_histogram_percentiles():
    from needle_spark.observe import LatencyHistogram
    h = LatencyHistogram()
    for v in (100, 200, 400, 800, 2000, 4000, 40000, 90000):
        h.observe(v)
    assert h.total_count == 8 and h.min_us == 100 and h.max_us == 90000
    assert h.mean() == pytest.approx(sum((100, 200, 400, 800, 2000, 4000,
                                          40000, 90000)) / 8)
    p50 = h.percentile(0.5)
    assert 400 <= p50 <= 2500  # interpolated inside the mid buckets
    assert h.percentile(0.99) <= 100000
    assert h.percentile(0.0) == 0.0 or h.percentile(0.0) >= 0
    # beyond the last bucket returns max observed
    h2 = LatencyHistogram()
    h2.observe(500000)
    assert h2.percentile(0.99) == 500000
    h.reset()
    assert h.total_count == 0 and h.percentile(0.5) == 0.0


def test_recall_estimator_semantics():
    from needle_spark.observe import RecallEstimator
    r = RecallEstimator(sample_size=4)
    # observability.rs:142-160 edge cases
    assert r.estimate([], [], now=0) == 1.0
    assert r.estimate(["a"], [], now=0) == 0.0
    assert r.estimate([], ["a"], now=0) == 0.0
    got = r.estimate(["a", "b", "c"], ["a", "b", "d"], now=0)
    assert got == pytest.approx(2 / 4)  # Jaccard |∩|/|∪|
    assert r.confidence == pytest.approx(3 / 4)
    assert r.is_stale(10.0, now=20.0) and not r.is_stale(30.0, now=20.0)


def test_suite_alert_rules_cooldown():
    from needle_spark.observe import AlertRule, ObservabilitySuite
    s = ObservabilitySuite()
    s.record_query_latency("docs", 90_000)
    s.record_query_latency("docs", 95_000)
    s.record_error("docs", "timeout")
    s.add_alert_rule(AlertRule("slow-p99", "query_latency_p99",
                               ("gt", 50_000.0), "critical",
                               cooldown_seconds=100))
    s.add_alert_rule(AlertRule("errors", "error_rate", ("gt", 0.5)))
    s.add_alert_rule(AlertRule("recall", "recall_estimate", ("lt", 0.9)))
    s.estimate_recall(["a"], ["a"], now=0)  # recall 1.0 — no fire
    fired = s.check_alerts(now=0)
    names = sorted(a["alert_id"].rsplit("-", 1)[0] for a in fired)
    assert names == ["errors", "slow-p99"]
    assert all(not a["acknowledged"] for a in fired)
    # cooldown suppresses slow-p99; errors (no cooldown) refires
    again = s.check_alerts(now=50)
    assert [a["alert_id"].rsplit("-", 1)[0] for a in again] == ["errors"]
    # after cooldown it fires again
    later = s.check_alerts(now=200)
    assert "slow-p99" in [a["alert_id"].rsplit("-", 1)[0] for a in later]
    s.acknowledge_alert(fired[0]["alert_id"])
    assert any(a["acknowledged"] for a in s.alerts)


def test_suite_range_condition_and_drift():
    from needle_spark.observe import AlertRule, ObservabilitySuite
    s = ObservabilitySuite()
    s.add_alert_rule(AlertRule("drift", "drift_score", ("range", 0.1, 0.9)))
    assert s.check_alerts(now=0) == []  # no drift score yet -> skipped
    s.set_drift_score(0.95)
    fired = s.check_alerts(now=1)
    assert fired[0]["threshold"] == 0.9 and fired[0]["current_value"] == 0.95


def test_health_from_real_collection(spark, tmp_path):
    from needle_spark.observe import ObservabilitySuite
    from needle_spark.catalog import Collection
    coll = Collection.create(spark, str(tmp_path / "hc"), dims=2)
    for i in range(3):  # three mutations -> fragmented deltas
        coll.insert(spark.createDataFrame(
            [(f"v{i}", [1.0, 0.0])], "id string, vector array<float>"))
    s = ObservabilitySuite()
    h = s.health_from_collection(coll)
    assert h.vector_count == 3
    assert h.fragmentation_ratio > 0.0  # multiple delta segments
    assert coll.path in s.index_health


def test_export_single_type_line_and_escaping():
    m = MetricsRegistry()
    m.inc("needle_operations_total", {"collection": "a", "operation": "x"})
    m.inc("needle_operations_total", {"collection": "b", "operation": "x"})
    m.inc("needle_operations_total", {"collection": 'we"ird\\nm'})
    text = m.export()
    assert text.count("# TYPE needle_operations_total counter") == 1
    assert 'we\\"ird' in text  # quotes escaped


def test_fragmentation_counts_tombstones(spark, tmp_path):
    from needle_spark.observe import ObservabilitySuite
    coll = Collection.create(spark, str(tmp_path / "tf"), dims=2)
    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "id string, vector array<float>"))
    coll.compact()
    coll.delete(ids=["a"])  # tombstone-only mutation
    h = ObservabilitySuite().health_from_collection(coll)
    assert h.fragmentation_ratio > 0.0  # delete churn is visible


def test_dashboard_queries_reference_real_series():
    out = generate_grafana_dashboard()
    assert "needle_search_results_total" not in out  # never-emitted series
    assert "needle_search_result_count_sum" in out


# ------------------------------------------------- embedded dashboard


def test_metrics_aggregator_window_and_slow_log():
    from needle_spark.observe import DashboardConfig, MetricsAggregator
    agg = MetricsAggregator(DashboardConfig(
        window_size=3, slow_query_threshold_us=1000, max_slow_queries=2))
    for i, us in enumerate((100, 200, 5000, 9000, 7000)):
        agg.record_query("docs", us, result_count=i, now=float(i))
    assert len(agg._latencies) == 3  # bounded window
    assert agg.query_count == 5
    # slow log bounded to 2, oldest dropped
    assert [q["duration_us"] for q in agg.slow_queries] == [9000, 7000]
    p = agg.latency_percentiles()
    assert p["count"] == 3 and p["min_us"] == 5000 and p["max_us"] == 9000


def test_qps_over_interval():
    from needle_spark.observe import DashboardConfig, MetricsAggregator
    agg = MetricsAggregator(DashboardConfig(aggregation_interval_secs=5))
    for t in (0.0, 1.0, 2.0, 100.0, 101.0):
        agg.record_query("c", 10, now=t)
    agg.record_insert("c")
    q = agg.current_qps(now=102.0)
    assert q["qps"] == pytest.approx(2 / 5)  # only the last two in window
    assert q["insert_rate"] == pytest.approx(1 / 5)


def test_snapshot_and_html():
    from needle_spark.observe import (
        DashboardConfig, MetricsAggregator, generate_dashboard_html)
    agg = MetricsAggregator(DashboardConfig(slow_query_threshold_us=50))
    agg.record_query("docs", 90_000, result_count=7, now=1.0)
    agg.record_explain({"stage": "scan"})
    snap = agg.snapshot(now=2.0)
    assert snap["totals"]["queries"] == 1
    assert snap["explains"] == [{"stage": "scan"}]
    html = generate_dashboard_html(snap)
    assert html.startswith("<!DOCTYPE html>")
    assert "needle-spark" in html and "90000" in html
    assert "http://" not in html and "https://" not in html  # no CDN


def test_rates_are_windowed_not_lifetime():
    from needle_spark.observe import DashboardConfig, MetricsAggregator
    agg = MetricsAggregator(DashboardConfig(aggregation_interval_secs=5))
    for t in range(100):  # long steady history
        agg.record_insert("c", now=float(t))
    q = agg.current_qps(now=100.0)
    assert q["insert_rate"] == pytest.approx(5 / 5)  # ~1/s, not 20/s
    assert agg.insert_count == 100  # lifetime total still tracked


def test_dashboard_html_escapes_names():
    from needle_spark.observe import (
        DashboardConfig, MetricsAggregator, generate_dashboard_html)
    agg = MetricsAggregator(DashboardConfig(slow_query_threshold_us=1))
    agg.record_query("<script>evil()</script>", 999, now=1.0)
    html = generate_dashboard_html(agg.snapshot(now=2.0))
    assert "<script>evil" not in html
    assert "&lt;script&gt;" in html
