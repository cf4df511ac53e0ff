"""Query analytics dashboard: event tracking, latency percentiles,
slow-query analysis, pattern grouping, and per-collection reports.

Reference: /root/reference/src/experimental/analytics.rs —
AnalyticsConfig (:58-115: slow-query threshold, retention, sample
rate), QueryEvent (:118-160), SlowQuery with reasons/suggestions
(:163-176), QueryPattern (:178-230: hash of collection + operation +
filter shape), get_insights (:506-578: windowed QPS + p50/p95/p99 +
error/filtered rates), get_slow_queries (:580), get_top_patterns /
get_slowest_patterns (:591-610), get_collection_analytics (:613),
generate_report (:623).

Spark mapping: events accumulate in a DataFrame-backed log (bounded
driver buffer, flushable to Parquet), and every dashboard read is one
aggregation — percentiles via percentile_approx (t-digest, map-side
combined), patterns via a groupBy on the pattern key.  At fleet scale
the same aggregations run over the Parquet event history unchanged."""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_SCHEMA = ("collection string, operation string, latency_ms double, "
                "result_count int, k int, has_filter boolean, "
                "filter_complexity int, ts long")


@dataclass
class AnalyticsConfig:
    """analytics.rs:58-115."""

    slow_query_threshold_ms: float = 100.0
    rate_window_seconds: int = 60
    max_events: int = 100_000


class AnalyticsDashboard:
    """analytics.rs:264+ over a DataFrame event log."""

    def __init__(self, spark, config: AnalyticsConfig | None = None):
        self.spark = spark
        self.config = config or AnalyticsConfig()
        self._rows: list[tuple] = []
        # LIFETIME op counter, like total_errors: the buffer is flushed
        # and evicted, so error_rate over buffer-resident counts would
        # explode after a flush (5 errors / 1 buffered query = 500%)
        self.total_ops = 0
        self.start_time = time.time()
        self.total_errors = 0

    # ------------------------------------------------------ tracking --
    def track_query(self, collection: str, operation: str, latency_ms: float,
                    result_count: int = 0, k: int | None = None,
                    has_filter: bool = False,
                    filter_complexity: int | None = None,
                    ts: int | None = None) -> None:
        self._rows.append((collection, operation, float(latency_ms),
                           int(result_count), k, bool(has_filter),
                           filter_complexity,
                           int(ts if ts is not None else time.time())))
        self.total_ops += 1
        del self._rows[: max(0, len(self._rows) - self.config.max_events)]

    def track_error(self, collection: str, operation: str,
                    error: str) -> None:
        self.total_errors += 1

    def events_df(self) -> DataFrame:
        return self.spark.createDataFrame(self._rows or [], EVENT_SCHEMA)

    def flush_to_parquet(self, path: str) -> int:
        """Persist the buffer (append) so fleet-wide dashboards read
        history with the same aggregations."""
        n = len(self._rows)
        if n:
            self.events_df().write.mode("append").parquet(path)
            self._rows = []
        return n

    # ------------------------------------------------------ insights --
    def insights(self, now: int | None = None,
                 events: DataFrame | None = None) -> dict:
        """get_insights (:506-578) as ONE aggregation: windowed QPS,
        approx latency percentiles, filtered ratio, error rate."""
        now = int(now if now is not None else time.time())
        ev = events if events is not None else self.events_df()
        win = self.config.rate_window_seconds
        in_win = F.col("ts") >= now - win
        is_q = F.col("operation").isin("search", "query")
        lat = F.when(in_win & is_q, F.col("latency_ms"))
        row = ev.agg(
            F.sum(in_win.cast("long")).alias("win_events"),
            F.avg(lat).alias("avg"),
            F.percentile_approx(lat, 0.5).alias("p50"),
            F.percentile_approx(lat, 0.95).alias("p95"),
            F.percentile_approx(lat, 0.99).alias("p99"),
            F.sum(is_q.cast("long")).alias("queries"),
            F.sum((F.col("operation") == "insert").cast("long")).alias("ins"),
            F.sum((F.col("operation") == "delete").cast("long")).alias("dels"),
            F.sum((is_q & (F.col("latency_ms") >
                           self.config.slow_query_threshold_ms))
                  .cast("long")).alias("slow"),
            F.sum((is_q & F.col("has_filter")).cast("long")).alias("filt"),
        ).first()
        queries = row["queries"] or 0
        return {
            "current_qps": (row["win_events"] or 0) / win,
            "avg_latency_ms": float(row["avg"] or 0.0),
            "p50_latency_ms": float(row["p50"] or 0.0),
            "p95_latency_ms": float(row["p95"] or 0.0),
            "p99_latency_ms": float(row["p99"] or 0.0),
            "total_queries": queries,
            "total_inserts": row["ins"] or 0,
            "total_deletes": row["dels"] or 0,
            "total_errors": self.total_errors,
            "slow_query_count": row["slow"] or 0,
            "filtered_query_ratio": (row["filt"] or 0) / queries
                                    if queries else 0.0,
            "uptime_seconds": int(now - self.start_time),
            # lifetime / lifetime: both counters survive buffer
            # flush/eviction, so the ratio stays meaningful
            "error_rate": (self.total_errors / self.total_ops
                           if self.total_ops else 0.0),
        }

    # -------------------------------------------------- slow queries --
    def slow_queries(self, limit: int = 10,
                     events: DataFrame | None = None) -> list[dict]:
        """get_slow_queries (:580) with the reference's reason +
        suggestion synthesis."""
        ev = events if events is not None else self.events_df()
        thr = self.config.slow_query_threshold_ms
        rows = (ev.filter(F.col("operation").isin("search", "query") &
                          (F.col("latency_ms") > thr))
                .orderBy(F.col("latency_ms").desc(), F.col("ts").desc())
                .limit(int(limit)).collect())
        out = []
        for r in rows:
            suggestions = []
            if r["has_filter"] and (r["filter_complexity"] or 0) > 3:
                suggestions.append("simplify the filter or pre-partition "
                                   "on its hottest field")
            if (r["k"] or 0) > 100:
                suggestions.append("large k: paginate with search_after")
            if not r["has_filter"]:
                suggestions.append("add a metadata pre-filter so the scan "
                                   "prunes")
            out.append({
                "event": r.asDict(),
                "reason": f"latency {r['latency_ms']:.1f}ms > "
                          f"threshold {thr}ms",
                "suggestions": suggestions,
            })
        return out

    # ------------------------------------------------------ patterns --
    def _patterns(self, events: DataFrame | None) -> DataFrame:
        ev = events if events is not None else self.events_df()
        key = F.concat_ws(
            "|", F.col("collection"), F.col("operation"),
            F.when(F.col("has_filter"), "filtered").otherwise("plain"))
        return (ev.withColumn("pattern_id", key)
                .groupBy("pattern_id")
                .agg(F.count(F.lit(1)).alias("occurrences"),
                     F.avg("latency_ms").alias("avg_latency_ms"),
                     F.max("latency_ms").alias("max_latency_ms"),
                     F.avg("result_count").alias("avg_results")))

    def top_patterns(self, limit: int = 10,
                     events: DataFrame | None = None) -> list[dict]:
        return [r.asDict() for r in
                self._patterns(events).orderBy(
                    F.col("occurrences").desc(),
                    F.col("pattern_id").asc()).limit(int(limit)).collect()]

    def slowest_patterns(self, limit: int = 10,
                         events: DataFrame | None = None) -> list[dict]:
        return [r.asDict() for r in
                self._patterns(events).orderBy(
                    F.col("avg_latency_ms").desc(),
                    F.col("pattern_id").asc()).limit(int(limit)).collect()]

    # --------------------------------------------------- collections --
    def collection_analytics(self, events: DataFrame | None = None
                             ) -> DataFrame:
        """get_collection_analytics (:613): per-collection rollup."""
        ev = events if events is not None else self.events_df()
        return (ev.groupBy("collection")
                .agg(F.count(F.lit(1)).alias("total_events"),
                     F.sum(F.col("operation").isin("search", "query")
                           .cast("long")).alias("queries"),
                     F.avg("latency_ms").alias("avg_latency_ms"),
                     # slow_queries counts QUERIES like insights()/
                     # slow_queries() do — a 150ms insert is not a
                     # slow query
                     F.sum((F.col("operation").isin("search", "query")
                            & (F.col("latency_ms") >
                               self.config.slow_query_threshold_ms))
                           .cast("long")).alias("slow_queries"))
                .orderBy("collection"))

    def generate_report(self, now: int | None = None) -> dict:
        """generate_report (:623)."""
        return {
            "insights": self.insights(now),
            "slow_queries": self.slow_queries(5),
            "top_patterns": self.top_patterns(5),
            "collections": [r.asDict()
                            for r in self.collection_analytics().collect()],
        }

    def clear(self) -> None:
        self._rows = []
        self.total_errors = 0
        self.total_ops = 0
