"""Temporal vector sequences: windowed centroids, trend vectors, and
trajectory similarity (DTW / discrete Fréchet).

Reference: /root/reference/src/experimental/temporal_sequences.rs —
VectorSequence (range :98, centroid :116, window_centroid :133, trend
:152-177), TrajectoryDistance (:196), dtw_distance (:205-232),
frechet_distance (:235-270), detect_drift (:280-340).

Spark mapping: a sequence is rows (seq_id, ts, vector) — there is no
driver-side sequence object, so a trillion-point corpus of sequences
is just a table.  Centroids/trends compile to window-rank +
fixed-point aggregation (order-exact, oracle-checkable).  DTW and
Fréchet are genuine dynamic programs over one sequence pair, so
trajectory search runs them per-sequence inside `applyInPandas`
against a broadcast query trajectory — each task owns whole sequences,
nothing quadratic crosses the wire."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_FX = 1_000_000.0


def sequence_range(df: DataFrame, start, end, ts_col: str = "ts") -> DataFrame:
    """VectorSequence.range (:98): inclusive time slice."""
    return df.filter((F.col(ts_col) >= start) & (F.col(ts_col) <= end))


def sequence_centroids(df: DataFrame, seq_col: str = "seq_id",
                       vector_col: str = "vector") -> DataFrame:
    """Per-sequence centroid (VectorSequence.centroid :116) — the exact
    fixed-point engine from vector_agg."""
    from needle_spark.operators.vector_agg import group_centroids

    return group_centroids(df, seq_col, vector_col)


def window_centroids(df: DataFrame, start, end, seq_col: str = "seq_id",
                     ts_col: str = "ts",
                     vector_col: str = "vector") -> DataFrame:
    """window_centroid (:133) for every sequence at once."""
    return sequence_centroids(sequence_range(df, start, end, ts_col),
                              seq_col, vector_col)


def sequence_trends(df: DataFrame, window_size: int = 10,
                    seq_col: str = "seq_id", ts_col: str = "ts",
                    vector_col: str = "vector") -> DataFrame:
    """trend (:152-177) for every sequence: centroid(last window) -
    centroid(first window), NULL-free only when the sequence has at
    least 2*window_size points (the reference returns None below that).

    Shape: two rank windows over (seq, ts), then ONE fixed-point
    aggregation over the exploded head/tail members — no per-sequence
    driver work."""
    w = int(window_size)
    asc = Window.partitionBy(seq_col).orderBy(
        F.col(ts_col).asc(), F.monotonically_increasing_id())
    desc = Window.partitionBy(seq_col).orderBy(
        F.col(ts_col).desc(), F.monotonically_increasing_id())
    ranked = (df.withColumn("__ra", F.row_number().over(asc))
              .withColumn("__rd", F.row_number().over(desc))
              .withColumn("__n", F.count(F.lit(1)).over(
                  Window.partitionBy(seq_col))))
    eligible = ranked.filter(F.col("__n") >= 2 * w)
    ends = eligible.filter((F.col("__ra") <= w) | (F.col("__rd") <= w))
    per = ends.select(
        F.col(seq_col).alias("seq"),
        F.when(F.col("__ra") <= w, F.lit("first")).otherwise(F.lit("last"))
         .alias("side"),
        F.posexplode(F.col(vector_col)).alias("pos", "x"))
    dim = per.groupBy("seq", "side", "pos").agg(
        (F.sum(F.round(F.col("x") * _FX).cast("long")).cast("double") / _FX
         / F.count(F.lit(1))).alias("v"))
    pivoted = (dim.groupBy("seq", "pos")
               .agg(F.max(F.when(F.col("side") == "first", F.col("v")))
                    .alias("fv"),
                    F.max(F.when(F.col("side") == "last", F.col("v")))
                    .alias("lv")))
    return (pivoted
            .groupBy("seq")
            .agg(F.collect_list(F.struct(F.col("pos"),
                                         (F.col("lv") - F.col("fv"))
                                         .alias("v"))).alias("__pv"))
            .select(F.col("seq"),
                    F.transform(F.array_sort(F.col("__pv")),
                                lambda s: s["v"]).alias("trend")))


# ===================================================================
# Trajectory distances (temporal_sequences.rs:196-270)
# ===================================================================

def dtw_distance(seq_a: Sequence[Sequence[float]],
                 seq_b: Sequence[Sequence[float]]) -> float:
    """Dynamic Time Warping with Euclidean point cost (:205-232)."""
    A = np.asarray(seq_a, dtype=np.float64)
    B = np.asarray(seq_b, dtype=np.float64)
    n, m = len(A), len(B)
    if n == 0 or m == 0:
        return float("inf")
    # pairwise point costs vectorized, then the DP sweep
    sa = (A * A).sum(axis=1)
    sb = (B * B).sum(axis=1)
    C = np.sqrt(np.maximum(sa[:, None] - 2.0 * (A @ B.T) + sb[None, :], 0.0))
    dp = np.full((n + 1, m + 1), np.inf)
    dp[0, 0] = 0.0
    for i in range(1, n + 1):
        prev, cur = dp[i - 1], dp[i]
        ci = C[i - 1]
        for j in range(1, m + 1):
            cur[j] = ci[j - 1] + min(prev[j], cur[j - 1], prev[j - 1])
    return float(dp[n, m])


def frechet_distance(seq_a: Sequence[Sequence[float]],
                     seq_b: Sequence[Sequence[float]]) -> float:
    """Discrete Fréchet distance (:235-270), iterative DP (no recursion
    depth limit)."""
    A = np.asarray(seq_a, dtype=np.float64)
    B = np.asarray(seq_b, dtype=np.float64)
    n, m = len(A), len(B)
    if n == 0 or m == 0:
        return float("inf")
    sa = (A * A).sum(axis=1)
    sb = (B * B).sum(axis=1)
    C = np.sqrt(np.maximum(sa[:, None] - 2.0 * (A @ B.T) + sb[None, :], 0.0))
    dp = np.empty((n, m))
    dp[0, 0] = C[0, 0]
    for j in range(1, m):
        dp[0, j] = max(dp[0, j - 1], C[0, j])
    for i in range(1, n):
        dp[i, 0] = max(dp[i - 1, 0], C[i, 0])
        for j in range(1, m):
            dp[i, j] = max(min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]),
                           C[i, j])
    return float(dp[n - 1, m - 1])


def centroid_trajectory_distance(seq_a, seq_b) -> float:
    """TrajectoryDistance::CentroidDistance."""
    A = np.asarray(seq_a, dtype=np.float64)
    B = np.asarray(seq_b, dtype=np.float64)
    if len(A) == 0 or len(B) == 0:
        return float("inf")
    return float(np.linalg.norm(A.mean(axis=0) - B.mean(axis=0)))


_TRAJ_FNS = {
    "dtw": dtw_distance,
    "frechet": frechet_distance,
    "centroid": centroid_trajectory_distance,
}


def trajectory_search(df: DataFrame, query_seq: Sequence[Sequence[float]],
                      k: int = 10, metric: str = "dtw",
                      seq_col: str = "seq_id", ts_col: str = "ts",
                      vector_col: str = "vector",
                      max_seq_len: int = 10_000) -> DataFrame:
    """Top-k most similar sequences to a query trajectory: each task
    runs the DP over its own whole sequences (applyInPandas on seq_id)
    against the broadcast query — only (seq_id, distance) leaves the
    workers, then one TakeOrdered.  Sequences longer than `max_seq_len`
    raise (DTW is O(n*m); downsample first)."""
    m = metric.lower()
    if m not in _TRAJ_FNS:
        raise ValueError(f"unknown trajectory metric: {metric!r}")
    fn = _TRAJ_FNS[m]
    Q = [list(map(float, v)) for v in query_seq]

    def _dist(key, pdf):
        if len(pdf) > max_seq_len:
            raise ValueError(
                f"sequence {key[0]!r} has {len(pdf)} points > cap "
                f"{max_seq_len}; downsample before trajectory search")
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        seq = pdf[vector_col].tolist()
        return pd.DataFrame({"seq_id": [str(key[0])],
                             "distance": [fn(seq, Q)]})

    out = (df.select(seq_col, ts_col, vector_col)
           .groupBy(seq_col)
           .applyInPandas(_dist, f"seq_id string, distance double"))
    return out.orderBy(F.col("distance").asc(),
                       F.col("seq_id").asc()).limit(int(k))


def sequence_drift(df: DataFrame, window_size: int,
                   seq_col: str = "seq_id", ts_col: str = "ts",
                   vector_col: str = "vector",
                   threshold: float = 0.1) -> DataFrame:
    """detect_drift(CosineDrift) (:280-340) for every sequence: angular
    change between the centroids of the two windows around the
    sequence midpoint; sequences shorter than 2*window_size drop (the
    reference returns None)."""
    w = int(window_size)
    byts = Window.partitionBy(seq_col).orderBy(
        F.col(ts_col).asc(), F.monotonically_increasing_id())
    ranked = (df.withColumn("__r", F.row_number().over(byts))
              .withColumn("__n", F.count(F.lit(1)).over(
                  Window.partitionBy(seq_col)))
              .filter(F.col("__n") >= 2 * w))
    mid = (F.col("__n") / 2).cast("int")
    sided = ranked.withColumn(
        "side",
        F.when((F.col("__r") > mid - w) & (F.col("__r") <= mid), "a")
         .when((F.col("__r") > mid) & (F.col("__r") <= mid + w), "b"))
    per = sided.filter(F.col("side").isNotNull()).select(
        F.col(seq_col).alias("seq"), "side",
        F.posexplode(F.col(vector_col)).alias("pos", "x"))
    dim = per.groupBy("seq", "side", "pos").agg(F.avg("x").alias("v"))
    piv = dim.groupBy("seq", "pos").agg(
        F.max(F.when(F.col("side") == "a", F.col("v"))).alias("a"),
        F.max(F.when(F.col("side") == "b", F.col("v"))).alias("b"))
    agg = piv.groupBy("seq").agg(
        F.sum(F.col("a") * F.col("b")).alias("dot"),
        F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("na"),
        F.sqrt(F.sum(F.col("b") * F.col("b"))).alias("nb"))
    score = F.when((F.col("na") > 0) & (F.col("nb") > 0),
                   1.0 - F.col("dot") / (F.col("na") * F.col("nb"))
                   ).otherwise(F.lit(1.0))
    return agg.select(
        "seq", score.alias("drift_score"),
        (score > float(threshold)).alias("drift_detected"))
