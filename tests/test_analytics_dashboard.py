"""Query analytics dashboard (reference:
src/experimental/analytics.rs): insights, slow queries, patterns,
collection rollups, report generation, Parquet flush."""

import pytest

from needle_spark.plans.analytics_dashboard import (
    AnalyticsConfig,
    AnalyticsDashboard,
)

NOW = 1_700_000_000


@pytest.fixture()
def dash(spark):
    d = AnalyticsDashboard(spark, AnalyticsConfig(
        slow_query_threshold_ms=50.0, rate_window_seconds=60))
    # 3 fast searches, 1 slow filtered search, inserts, one old event
    d.track_query("docs", "search", 10.0, 5, k=10, ts=NOW - 5)
    d.track_query("docs", "search", 20.0, 5, k=10, ts=NOW - 5)
    d.track_query("docs", "search", 30.0, 5, k=10, has_filter=True,
                  ts=NOW - 5)
    d.track_query("imgs", "search", 400.0, 2, k=200, has_filter=True,
                  filter_complexity=5, ts=NOW - 5)
    d.track_query("docs", "insert", 5.0, 0, ts=NOW - 5)
    d.track_query("docs", "search", 99.0, 1, ts=NOW - 7200)  # outside window
    d.track_error("docs", "search", "boom")
    return d


def test_insights(dash):
    ins = dash.insights(now=NOW)
    assert ins["total_queries"] == 5
    assert ins["total_inserts"] == 1
    assert ins["slow_query_count"] == 2  # 400ms and 99ms
    assert ins["filtered_query_ratio"] == pytest.approx(2 / 5)
    assert ins["current_qps"] == pytest.approx(5 / 60)  # window excludes old
    assert ins["p95_latency_ms"] >= ins["p50_latency_ms"] > 0
    assert ins["error_rate"] == pytest.approx(1 / 6)


def test_slow_queries_with_suggestions(dash):
    slow = dash.slow_queries(limit=5)
    assert len(slow) == 2
    worst = slow[0]
    assert worst["event"]["latency_ms"] == 400.0
    assert "threshold" in worst["reason"]
    sugg = " ".join(worst["suggestions"])
    assert "filter" in sugg and "paginate" in sugg


def test_patterns(dash):
    top = dash.top_patterns(limit=3)
    assert top[0]["pattern_id"] == "docs|search|plain"
    assert top[0]["occurrences"] == 3
    slowest = dash.slowest_patterns(limit=1)
    assert slowest[0]["pattern_id"] == "imgs|search|filtered"


def test_collection_analytics_and_report(dash):
    coll = {r["collection"]: r for r in
            dash.collection_analytics().collect()}
    assert coll["docs"]["queries"] == 4
    assert coll["imgs"]["slow_queries"] == 1
    report = dash.generate_report(now=NOW)
    assert set(report) == {"insights", "slow_queries", "top_patterns",
                           "collections"}


def test_flush_and_bounded_buffer(spark, tmp_path, dash):
    p = str(tmp_path / "events")
    n = dash.flush_to_parquet(p)
    assert n == 6 and dash.events_df().count() == 0
    hist = spark.read.parquet(p)
    assert hist.count() == 6
    # the same aggregations run over the history unchanged
    ins = dash.insights(now=NOW, events=hist)
    assert ins["total_queries"] == 5

    small = AnalyticsDashboard(spark, AnalyticsConfig(max_events=3))
    for i in range(10):
        small.track_query("c", "search", 1.0, 1, ts=NOW)
    assert len(small._rows) == 3  # bounded like the reference deque
