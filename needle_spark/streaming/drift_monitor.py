"""Streaming drift monitoring (reference:
/root/reference/src/observe/drift.rs — per-vector sliding-window
check :305-360, DriftHistoryEntry :213-224, get_trend :537-563,
reset_window :564-570).

Spark-first mapping: the reference checks drift one vector at a time
against an in-memory window; under Structured Streaming the natural
unit is the MICRO-BATCH — each batch plays the role of the current
window, compared against a baseline fitted ONCE (stats + a magnitude
quantile grid, so the per-batch check never rescans the baseline).
Reports append to a Parquet history log any consumer can query; the
trend classifier is the reference's drift-rate thresholds verbatim.

KS note: the per-batch statistic is computed between the baseline's
and the batch's magnitude QUANTILE GRIDS (default 1024 points each) —
exact when a side has <= grid_size rows, within 1/grid_size otherwise.
This keeps the baseline cost O(grid) per batch instead of a re-sort of
the full baseline every trigger — the 100 TB posture.

Threshold sizing: under H0 the two-sample KS statistic itself
fluctuates around 1.36*sqrt(1/n + 1/m) at the 5% level, so
`ks_threshold` must be sized to the micro-batch row count (the 0.1
default assumes batches of thousands of rows; a 100-row trigger wants
~0.2 or larger batches via trigger intervals).
"""

from __future__ import annotations

import os
import time
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.operators.drift import (
    DEFAULT_CENTROID_THRESHOLD,
    DEFAULT_KS_THRESHOLD,
    DEFAULT_VARIANCE_THRESHOLD,
    VectorStats,
    _cosine_distance,
    _magnitude_expr,
    _severity,
    vector_stats,
)

HISTORY_SCHEMA = (
    "epoch_id long, checked_ms long, n_samples long, drift_score double, "
    "centroid_shift double, variance_ratio double, ks_statistic double, "
    "is_drifting boolean, severity string"
)


def _magnitude_grid(df: DataFrame, vector_col: str, grid: int) -> np.ndarray:
    """Exact magnitude quantiles at `grid` evenly spaced fractions —
    one sort-based aggregation, O(grid) driver bytes."""
    qs = [i / (grid - 1) for i in range(grid)]
    row = df.select(
        F.percentile(_magnitude_expr(F.col(vector_col)), F.array(
            *[F.lit(q) for q in qs])).alias("g")
    ).first()
    return np.asarray(row["g"], dtype=np.float64)


def _grid_ks(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample KS between two quantile grids (the grids ARE the
    empirical samples when sides fit the grid)."""
    if a.size == 0 or b.size == 0:
        return 0.0
    merged = np.union1d(a, b)
    fa = np.searchsorted(a, merged, side="right") / a.size
    fb = np.searchsorted(b, merged, side="right") / b.size
    return float(np.abs(fa - fb).max())


class StreamingDriftMonitor:
    """Micro-batch drift monitor: fit once on a baseline frame, then
    `check_batch` (or `foreach_batch()` inside writeStream) scores each
    incoming batch and appends to the history log."""

    def __init__(
        self,
        baseline: DataFrame,
        vector_col: str = "vector",
        history_dir: str | None = None,
        centroid_threshold: float = DEFAULT_CENTROID_THRESHOLD,
        variance_threshold: float = DEFAULT_VARIANCE_THRESHOLD,
        ks_threshold: float = DEFAULT_KS_THRESHOLD,
        min_samples: int = 10,
        magnitude_grid: int = 1024,
    ):
        self.vector_col = vector_col
        self.history_dir = history_dir
        self.centroid_threshold = centroid_threshold
        self.variance_threshold = variance_threshold
        self.ks_threshold = ks_threshold
        self.min_samples = min_samples
        self.grid_size = magnitude_grid
        self.spark = baseline.sparkSession
        self.baseline_stats: VectorStats = vector_stats(baseline, vector_col)
        self.baseline_grid = _magnitude_grid(
            baseline, vector_col, magnitude_grid)
        self._memory_history: list[dict] = []

    # ------------------------------------------------------- checking --
    def check_batch(self, batch_df: DataFrame, epoch_id: int = -1) -> dict:
        """Score one batch against the baseline (drift.rs
        compute_drift_report :370-440 with the batch as the window).
        Batches under min_samples record a zero-score entry, like the
        reference's warm-up path (:330-336)."""
        n = batch_df.count()
        if n < self.min_samples:
            rep = {"epoch_id": int(epoch_id), "checked_ms": int(time.time() * 1000),
                   "n_samples": int(n), "drift_score": 0.0,
                   "centroid_shift": 0.0, "variance_ratio": 1.0,
                   "ks_statistic": 0.0, "is_drifting": False,
                   "severity": "none"}
            self._record(rep)
            return rep
        cs = vector_stats(batch_df, self.vector_col)
        bs = self.baseline_stats
        centroid_shift = _cosine_distance(bs.centroid, cs.centroid)
        b_total, c_total = sum(bs.variance), sum(cs.variance)
        variance_ratio = (c_total / b_total) if b_total > 0 else 1.0
        grid = _magnitude_grid(
            batch_df, self.vector_col, min(self.grid_size, max(2, n)))
        ks = _grid_ks(self.baseline_grid, grid)
        c_score = min(centroid_shift / self.centroid_threshold, 1.0)
        v_score = min(abs(variance_ratio - 1.0) / self.variance_threshold, 1.0)
        k_score = min(ks / self.ks_threshold, 1.0)
        score = 0.4 * c_score + 0.3 * v_score + 0.3 * k_score
        rep = {
            "epoch_id": int(epoch_id),
            "checked_ms": int(time.time() * 1000),
            "n_samples": int(n),
            "drift_score": float(score),
            "centroid_shift": float(centroid_shift),
            "variance_ratio": float(variance_ratio),
            "ks_statistic": float(ks),
            "is_drifting": bool(
                centroid_shift > self.centroid_threshold
                or abs(variance_ratio - 1.0) > self.variance_threshold
                or ks > self.ks_threshold),
            "severity": _severity(score),
        }
        self._record(rep)
        return rep

    def _record(self, rep: dict) -> None:
        self._memory_history.append(rep)
        if self.history_dir is not None:
            self.spark.createDataFrame([tuple(rep.values())], HISTORY_SCHEMA) \
                .write.mode("append").parquet(self.history_dir)

    def foreach_batch(self) -> Callable:
        """Adapter for `writeStream.foreachBatch(...)`."""
        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.check_batch(batch_df, epoch_id)
        return fn

    def attach(self, stream_df: DataFrame, checkpoint_dir: str,
               available_now: bool = False):
        """Wire the monitor onto a streaming DataFrame; returns the
        StreamingQuery."""
        w = stream_df.writeStream.foreachBatch(self.foreach_batch()) \
            .option("checkpointLocation", checkpoint_dir)
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    # -------------------------------------------------------- history --
    def history(self) -> DataFrame:
        """The drift history as a DataFrame (Parquet log if configured,
        else the in-memory entries)."""
        if self.history_dir is not None and os.path.exists(self.history_dir):
            return self.spark.read.parquet(self.history_dir)
        return self.spark.createDataFrame(
            [tuple(r.values()) for r in self._memory_history], HISTORY_SCHEMA)

    def trend(self, window: int = 5) -> str:
        """drift.rs get_trend :537-563 — drift-rate thresholds verbatim
        (severe_drift / increasing / moderate / decreasing / stable)."""
        recent = self._memory_history[-window:]
        if self.history_dir is not None and os.path.exists(self.history_dir):
            rows = (self.history().orderBy(F.col("epoch_id").desc(),
                                           F.col("checked_ms").desc())
                    .limit(window).collect())
            recent = [r.asDict() for r in rows]
        if not recent:
            return "stable"
        avg_score = sum(r["drift_score"] for r in recent) / len(recent)
        drift_rate = sum(1 for r in recent if r["is_drifting"]) / len(recent)
        if drift_rate > 0.8:
            return "severe_drift"
        if drift_rate > 0.5:
            return "increasing"
        if drift_rate > 0.2:
            return "moderate"
        if avg_score > 0.3:
            return "decreasing"
        return "stable"

    def reset_history(self) -> None:
        """reset_window/reset (:564-578): drop recorded history, keep
        the fitted baseline."""
        self._memory_history = []
