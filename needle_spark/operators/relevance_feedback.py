"""Relevance feedback: signal scoring, temporally-decayed parameter
adjustments, rollback guardrails, and A/B test evaluation.

Reference: /root/reference/src/experimental/relevance_feedback.rs —
FeedbackSignal::relevance_score (:25-57: thumbs +-1, click 0.5, dwell
ramp, skip -0.3, rating maps 1-5 to [-1,1]), FeedbackConfig defaults
(:126-152), compute_adjustments (:293-343: decay-weighted average ->
ef factor = clamp(1 + lr*(1-avg), 0.5, 2.0), confidence = n/100),
should_rollback (:345), AbTest::winner (:231-241: best avg relevance
with >= 10 events), FeedbackStats (:364-392).

Spark mapping: feedback events live in a DataFrame (millions of rows,
not a driver deque), signal scoring is one CASE expression, and every
report — adjustment, stats, per-variant A/B results — is ONE
map-side-combined aggregation.  The ef_search factor maps onto this
engine's probe fraction (plans/tuning.AdaptiveProbeTuner applies it).
For cross-engine bit-exactness the oracle query pins temporal_decay to
0.5: weights become exact powers of two, so decay-weighted sums are
reproducible anywhere."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class FeedbackConfig:
    """relevance_feedback.rs:126-152."""

    learning_rate: float = 0.01
    min_events_for_adjustment: int = 10
    temporal_decay: float = 0.95
    rollback_threshold: float = -0.2


def signal_score_expr(signal_col: Column | str,
                      value_col: Column | str | None = None) -> Column:
    """FeedbackSignal::relevance_score (:42-57) as one CASE expression.
    `value_col` supplies the dwell seconds / rating value."""
    s = F.col(signal_col) if isinstance(signal_col, str) else signal_col
    v = (F.col(value_col) if isinstance(value_col, str) else value_col
         ) if value_col is not None else F.lit(0.0)
    dwell = F.greatest(F.least((v - 3.0) / 5.0, F.lit(1.0)), F.lit(-1.0))
    rating = F.greatest(F.least((v - 3.0) / 2.0, F.lit(1.0)), F.lit(-1.0))
    return (F.when(s == "thumbs_up", 1.0)
            .when(s == "thumbs_down", -1.0)
            .when(s == "click", 0.5)
            .when(s == "dwell", dwell)
            .when(s == "skip", -0.3)
            .when(s == "rating", rating))


def decay_weight_expr(ts_col: Column | str, now: int,
                      decay: float) -> Column:
    """Weight = decay^(age_hours) with integer hours — with decay=0.5
    the weight is an exact power of two (bit-reproducible)."""
    t = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    hours = F.floor((F.lit(int(now)) - t) / F.lit(3_600_000_000_000))
    return F.pow(F.lit(float(decay)), F.greatest(hours, F.lit(0)))


def compute_adjustments(events: DataFrame, now: int,
                        config: FeedbackConfig | None = None,
                        signal_col: str = "signal",
                        value_col: str = "value",
                        ts_col: str = "ts") -> DataFrame:
    """compute_adjustments (:293-343) as one aggregation: decayed
    average relevance -> probe/ef factor, positive ratio -> rerank
    weight, confidence = min(n/100, 1).  Returns a one-row DataFrame
    (empty below min_events, like the reference's None)."""
    c = config or FeedbackConfig()
    score = signal_score_expr(signal_col, value_col)
    w = decay_weight_expr(ts_col, now, c.temporal_decay)
    scored = events.select(score.alias("__s"), w.alias("__w")).filter(
        F.col("__s").isNotNull())
    agg = scored.agg(
        (F.sum(F.round(F.col("__s") * F.col("__w") * 1e6).cast("long"))
         .cast("double") / 1e6).alias("__wr"),
        (F.sum(F.round(F.col("__w") * 1e6).cast("long"))
         .cast("double") / 1e6).alias("__tw"),
        F.sum((F.col("__s") > 0).cast("long")).alias("__pos"),
        F.count(F.lit(1)).alias("event_count"),
    )
    avg = F.col("__wr") / F.col("__tw")
    ef = F.greatest(F.least(1.0 + c.learning_rate * (1.0 - avg),
                            F.lit(2.0)), F.lit(0.5))
    return (agg.filter((F.col("event_count") >=
                        c.min_events_for_adjustment) & (F.col("__tw") > 1e-10))
            .select(
                ef.alias("ef_search_factor"),
                (F.col("__pos").cast("double") / F.col("event_count"))
                .alias("rerank_weight"),
                avg.alias("avg_relevance"),
                F.col("event_count").cast("long").alias("event_count"),
                F.least(F.col("event_count").cast("double") / 100.0,
                        F.lit(1.0)).alias("confidence")))


def should_rollback(events: DataFrame, now: int,
                    config: FeedbackConfig | None = None, **kw) -> bool:
    """should_rollback (:345-352)."""
    c = config or FeedbackConfig()
    row = compute_adjustments(events, now, c, **kw).first()
    return row is not None and row["avg_relevance"] < c.rollback_threshold


def feedback_stats(events: DataFrame, signal_col: str = "signal",
                   value_col: str = "value") -> dict:
    """FeedbackStats (:364-392) in one aggregation."""
    score = signal_score_expr(signal_col, value_col)
    row = (events.select(score.alias("__s"),
                         (F.col(signal_col) == "click").alias("__c"))
           .filter(F.col("__s").isNotNull())
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum((F.col("__s") > 0).cast("long")).alias("pos"),
                F.sum((F.col("__s") < 0).cast("long")).alias("neg"),
                F.avg("__s").alias("avg"),
                F.sum(F.col("__c").cast("long")).alias("clicks")).first())
    n = row["n"] or 0
    return {
        "total_events": n,
        "positive_count": row["pos"] or 0,
        "negative_count": row["neg"] or 0,
        "avg_relevance": float(row["avg"]) if n else 0.0,
        "click_through_rate": (row["clicks"] or 0) / n if n else 0.0,
    }


def assign_variant_expr(user_col: Column | str, test_name: str,
                        variants: list[str]) -> Column:
    """Deterministic variant assignment: hash(user, test) mod variants
    — stable across sessions and engines (xxhash64)."""
    u = F.col(user_col) if isinstance(user_col, str) else user_col
    h = F.abs(F.xxhash64(u.cast("string"), F.lit(test_name)))
    expr = None
    for i, name in enumerate(variants):
        cond = (h % len(variants)) == i
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def ab_test_results(events: DataFrame, variant_col: str = "variant",
                    signal_col: str = "signal", value_col: str = "value",
                    min_events: int = 10) -> DataFrame:
    """Per-variant results + winner flag (AbTest::winner :231-241: best
    average relevance among variants with >= min_events)."""
    score = signal_score_expr(signal_col, value_col)
    per = (events.select(F.col(variant_col).alias("variant"),
                         score.alias("__s"))
           .filter(F.col("__s").isNotNull())
           .groupBy("variant")
           .agg(F.count(F.lit(1)).cast("long").alias("event_count"),
                F.avg("__s").alias("avg_relevance"),
                (F.sum((F.col("__s") > 0).cast("long")).cast("double") /
                 F.count(F.lit(1))).alias("positive_ratio")))
    from pyspark.sql.window import Window

    eligible = F.col("event_count") >= int(min_events)
    w = Window.orderBy(
        F.when(eligible, F.col("avg_relevance")).otherwise(F.lit(None))
         .desc_nulls_last(), F.col("variant").asc())
    return (per.withColumn("__rk", F.row_number().over(w))
            .withColumn("is_winner", (F.col("__rk") == 1) & eligible)
            .drop("__rk"))
