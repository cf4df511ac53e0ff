"""Predictive query prewarming: learn query patterns, predict what's
coming, and warm the cache before it arrives.

Reference: /root/reference/src/experimental/query_prewarming.rs —
PrewarmConfig (:26-52), QueryPattern/QueryParams (:56-83),
predict_next (:202-300: temporal-similarity x recency scoring, top
3*k_neighbors candidates, per-collection weighted centroid, confidence
threshold), record_hit/stats (:305-330), adapt_threshold (:333-350:
accuracy > 0.7 lowers, < 0.3 raises), extract_temporal_features /
temporal_similarity (:363-385: circular hour/day distance, 0.7/0.3
blend).

Spark mapping: the pattern log is a DataFrame (query_replay.py records
the raw material), candidate scoring is a scan expression, and the
top-(3*k_neighbors) cut is a TakeOrderedAndProject — only that bounded
page reaches the driver for the per-collection weighted-centroid
grouping, exactly the reference's own loop size.  Prewarming then
plays the predicted queries through the semantic cache so real traffic
hits warm entries."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class PrewarmConfig:
    """query_prewarming.rs:26-52."""

    max_history: int = 10_000
    confidence_threshold: float = 0.5
    k_neighbors: int = 5
    adaptive_threshold: bool = True
    decay_factor: float = 0.95


def temporal_features_expr(ts_col: Column | str) -> tuple[Column, Column]:
    """(hour_of_day, day_of_week) from epoch seconds
    (query_prewarming.rs:363-368; Mon=0, epoch was a Thursday)."""
    t = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    hour = ((t % 86_400) / 3_600).cast("int")
    day = ((t / 86_400).cast("long") + 3) % 7
    return hour, day.cast("int")


def temporal_similarity_expr(hour: Column, day: Column, now_hour: int,
                             now_day: int) -> Column:
    """Circular hour/day similarity, 0.7/0.3 blend (:370-385)."""
    hd = F.abs(hour - F.lit(int(now_hour)))
    hour_diff = F.least(hd, 24 - hd).cast("double")
    dd = F.abs(day - F.lit(int(now_day)))
    day_diff = F.least(dd, 7 - dd).cast("double")
    return 0.7 * (1.0 - hour_diff / 12.0) + 0.3 * (1.0 - day_diff / 3.5)


def score_patterns(log: DataFrame, now: int,
                   config: PrewarmConfig | None = None,
                   ts_col: str = "ts") -> DataFrame:
    """Candidate scoring: temporal similarity x recency decay — a pure
    scan expression over the pattern log."""
    c = config or PrewarmConfig()
    now_hour = (now % 86_400) // 3_600
    now_day = (now // 86_400 + 3) % 7
    hour, day = temporal_features_expr(ts_col)
    sim = temporal_similarity_expr(hour, day, now_hour, now_day)
    age_h = (F.lit(int(now)) - F.col(ts_col)) / 3_600.0
    recency = F.pow(F.lit(float(c.decay_factor)), F.greatest(age_h, F.lit(0.0)))
    return log.withColumn("__score", sim * recency)


class QueryPrewarmer:
    """query_prewarming.rs QueryPrewarmer on a DataFrame pattern log."""

    def __init__(self, spark, config: PrewarmConfig | None = None):
        self.spark = spark
        self.config = config or PrewarmConfig()
        self.current_threshold = self.config.confidence_threshold
        self._rows: list[tuple] = []
        self.total_predictions = 0
        self.predictions_hit = 0

    # ------------------------------------------------------- logging --
    def log_query(self, collection: str, embedding, k: int = 10,
                  had_filter: bool = False, ts: int | None = None) -> None:
        """Append one anonymized pattern (bounded history like the
        reference's deque)."""
        self._rows.append((collection, [float(x) for x in embedding],
                           int(k), bool(had_filter),
                           int(ts if ts is not None else time.time())))
        del self._rows[: max(0, len(self._rows) - self.config.max_history)]

    def log_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            self._rows or [],
            "collection string, embedding array<float>, k int, "
            "had_filter boolean, ts long")

    # ---------------------------------------------------- prediction --
    def predict_next(self, limit: int = 5, now: int | None = None,
                     log: DataFrame | None = None) -> list[dict]:
        """predict_next (:202-300): score all patterns, keep the top
        3*k_neighbors (TakeOrdered — bounded), weighted-centroid per
        collection, filter by the adaptive confidence threshold."""
        if log is None and len(self._rows) < 3:
            return []
        c = self.config
        now = int(now if now is not None else time.time())
        scored = score_patterns(log if log is not None else self.log_df(),
                                now, c)
        top = (scored.orderBy(F.col("__score").desc(), F.col("ts").desc())
               .limit(c.k_neighbors * 3).collect())
        groups: dict[str, list] = {}
        for r in top:
            groups.setdefault(r["collection"], []).append(r)
        preds = []
        for coll, rows in groups.items():
            total = sum(r["__score"] for r in rows)
            if total < 1e-10:
                continue
            dims = len(rows[0]["embedding"])
            centroid = [0.0] * dims
            for r in rows:
                w = r["__score"] / total
                for i, v in enumerate(r["embedding"][:dims]):
                    centroid[i] += v * w
            confidence = min(total / len(rows), 1.0)
            if confidence >= self.current_threshold:
                preds.append({
                    "collection": coll,
                    "predicted_embedding": centroid,
                    "confidence": confidence,
                    "predicted_k": sum(r["k"] for r in rows) // len(rows),
                })
        preds.sort(key=lambda p: -p["confidence"])
        preds = preds[:limit]
        # count only EMITTED predictions so accuracy (hits/total) can
        # actually reach 1.0 and adapt_threshold steers correctly
        self.total_predictions += len(preds)
        return preds

    # ------------------------------------------------------ feedback --
    def record_hit(self) -> None:
        self.predictions_hit += 1

    def stats(self) -> dict:
        """PrewarmStats (:99-114)."""
        acc = (self.predictions_hit / self.total_predictions
               if self.total_predictions else 0.0)
        return {
            "total_queries": len(self._rows),
            "total_predictions": self.total_predictions,
            "predictions_hit": self.predictions_hit,
            "accuracy": acc,
            "confidence_threshold": self.current_threshold,
            "history_size": len(self._rows),
            "tracked_collections": sorted({r[0] for r in self._rows}),
        }

    def adapt_threshold(self) -> None:
        """adapt_threshold (:333-350)."""
        if not self.config.adaptive_threshold:
            return
        s = self.stats()
        if s["total_predictions"] < 10:
            return
        if s["accuracy"] > 0.7:
            self.current_threshold = max(self.current_threshold * 0.95, 0.1)
        elif s["accuracy"] < 0.3:
            self.current_threshold = min(self.current_threshold * 1.1, 0.95)

    # ------------------------------------------------------- prewarm --
    def prewarm(self, predictions: list[dict], search_fn,
                cache=None) -> int:
        """Play the predicted queries so real traffic hits warm state:
        `search_fn(collection, embedding, k) -> result`; results land in
        `cache.put` when a cache is given.  Returns queries warmed."""
        n = 0
        for p in predictions:
            result = search_fn(p["collection"], p["predicted_embedding"],
                               p["predicted_k"])
            if cache is not None:
                cache.put(result, p["predicted_embedding"],
                          p["predicted_k"])
            n += 1
        return n
