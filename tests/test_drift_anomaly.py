"""Drift detection (observe/drift.rs) and anomaly detection
(observe/anomaly.rs) as distributed aggregations."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.anomaly import (
    IsolationForest,
    avg_knn_distance,
    distance_outliers_percentile,
    iqr_outliers,
    lof_scores,
    zscore_outliers,
)
from needle_spark.operators.drift import (
    drift_report,
    two_sample_ks,
    vector_stats,
)


def vecs(spark, rows):
    return spark.createDataFrame(rows, "id long, vector array<float>")


def _gauss(rng, n, center, scale=0.5, d=4):
    return [[float(x) for x in center + rng.normal(scale=scale, size=d)]
            for _ in range(n)]


# ------------------------------------------------------------- drift --

def test_vector_stats_matches_numpy(spark):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(50, 4))
    df = vecs(spark, [(i, [float(x) for x in data[i]]) for i in range(50)])
    st = vector_stats(df, "vector")
    x = np.array([[np.float32(v) for v in row] for row in data],
                 dtype=np.float64)
    assert st.sample_count == 50
    assert np.allclose(st.centroid, x.mean(0), atol=1e-9)
    assert np.allclose(st.variance, x.var(0, ddof=1), atol=1e-9)
    assert np.allclose(st.min, x.min(0)) and np.allclose(st.max, x.max(0))
    assert abs(st.avg_magnitude
               - np.linalg.norm(x, axis=1).mean()) < 1e-9


def test_vector_stats_arrow_path_agrees(spark):
    """The >128-dim Arrow-partials path must equal the expression path."""
    from needle_spark.operators import drift as dr

    rng = np.random.default_rng(2)
    data = rng.normal(size=(40, 6))
    df = vecs(spark, [(i, [float(x) for x in data[i]]) for i in range(40)])
    a = vector_stats(df, "vector")
    old = dr._EXPR_DIMS_LIMIT
    dr._EXPR_DIMS_LIMIT = 1
    try:
        b = vector_stats(df, "vector")
    finally:
        dr._EXPR_DIMS_LIMIT = old
    assert np.allclose(a.centroid, b.centroid, atol=1e-9)
    assert np.allclose(a.variance, b.variance, atol=1e-9)
    assert abs(a.avg_magnitude - b.avg_magnitude) < 1e-9


def test_two_sample_ks_exact(spark):
    a = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4]], "x double")
    b = spark.createDataFrame([(float(x),) for x in [10, 11, 12, 13]], "x double")
    # disjoint supports: D = 1 (the reference's merge-walk quirk would
    # report 0 here — deliberately not replicated)
    assert two_sample_ks(a, b, "x") == pytest.approx(1.0)
    assert two_sample_ks(a, a, "x") == pytest.approx(0.0)
    c = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 10]], "x double")
    # F_a jumps to 3/4 by x=3 while F_c is 3/4 too; max gap is at x=4
    assert two_sample_ks(a, c, "x") == pytest.approx(0.25)


def test_drift_report_no_drift_vs_shift(spark):
    # a non-zero center: cosine centroid shift on zero-centered data
    # compares two noise directions and is meaningless (true of the
    # reference's formula too)
    rng = np.random.default_rng(3)
    center = np.array([1.0, 1.0, 1.0, 1.0])
    base = _gauss(rng, 200, center)
    same = _gauss(rng, 200, center)
    shifted = _gauss(rng, 200, np.array([4.0, -2.0, 4.0, -2.0]))
    b = vecs(spark, [(i, v) for i, v in enumerate(base)])
    s = vecs(spark, [(i, v) for i, v in enumerate(same)])
    d = vecs(spark, [(i, v) for i, v in enumerate(shifted)])

    quiet = drift_report(b, s)
    assert not quiet.is_drifting and quiet.severity in ("none", "low")
    assert quiet.samples_baseline == 200 and quiet.samples_current == 200

    loud = drift_report(b, d)
    assert loud.is_drifting and loud.drift_score > quiet.drift_score
    assert loud.centroid_shift > 0.5       # near-orthogonal centroids
    assert loud.ks_statistic > 0.5         # magnitudes jump
    assert loud.severity in ("medium", "high")
    assert len(loud.top_drifting_dimensions) == 4
    assert loud.top_drifting_dimensions[0]["drift_score"] >= \
        loud.top_drifting_dimensions[-1]["drift_score"]


# ------------------------------------------------------------ anomaly --

def _cluster_with_outlier(spark, n=60, d=4, seed=4):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(scale=0.3, size=d)])
            for i in range(n)]
    rows.append((999, [25.0] * d))
    return vecs(spark, rows)


def test_zscore_outliers_flags_planted(spark):
    df = _cluster_with_outlier(spark)
    got = {r["id"] for r in zscore_outliers(df, threshold=3.0).collect()}
    assert 999 in got and len(got) <= 4


def test_iqr_outliers_flags_planted(spark):
    df = _cluster_with_outlier(spark)
    got = {r["id"] for r in iqr_outliers(df, multiplier=3.0).collect()}
    assert 999 in got and len(got) <= 6


def test_avg_knn_distance_and_percentile(spark):
    df = _cluster_with_outlier(spark)
    d = {r["id"]: r["avg_knn_distance"]
         for r in avg_knn_distance(df, k=5).collect()}
    assert len(d) == 61
    assert d[999] > 10 * max(v for i, v in d.items() if i != 999)
    out = {r["id"]
           for r in distance_outliers_percentile(df, k=5, percentile=95.0)
           .collect()}
    assert 999 in out and len(out) <= 4


def test_lof_scores_uniform_vs_outlier(spark):
    df = _cluster_with_outlier(spark)
    lof = {r["id"]: r["lof"] for r in lof_scores(df, k=5).collect()}
    assert len(lof) == 61
    inliers = [v for i, v in lof.items() if i != 999]
    # uniform region: LOF ~ 1 (anomaly.rs test expectation)
    assert all(0.5 < v < 2.0 for v in inliers)
    assert lof[999] > 3.0


def test_isolation_forest_seeded_and_distributed(spark):
    df = _cluster_with_outlier(spark, n=100)
    f1 = IsolationForest(n_trees=50, sample_size=64, seed=9).fit(df)
    s1 = {r["id"]: r["anomaly_score"] for r in f1.score(df).collect()}
    f2 = IsolationForest(n_trees=50, sample_size=64, seed=9).fit(df)
    s2 = {r["id"]: r["anomaly_score"] for r in f2.score(df).collect()}
    assert s1 == s2                       # seeded: fully reproducible
    assert s1[999] > 0.6                  # planted outlier isolates fast
    assert s1[999] > max(v for i, v in s1.items() if i != 999)
    mean_inlier = float(np.mean([v for i, v in s1.items() if i != 999]))
    assert mean_inlier < 0.55


# --------------------------------------------------- streaming monitor --

def test_streaming_drift_monitor_batches_and_trend(spark, tmp_path):
    from needle_spark.streaming.drift_monitor import StreamingDriftMonitor

    rng = np.random.default_rng(7)
    center = np.array([1.0, 1.0, 1.0, 1.0])
    base = vecs(spark, [(i, v) for i, v in
                        enumerate(_gauss(rng, 300, center))])
    # ks_threshold sized to the batch: same-distribution KS noise for
    # n=200 vs m=300 sits near 1.36*sqrt(1/n+1/m) ~ 0.12, so the 0.1
    # default would flag statistical noise at this batch size
    mon = StreamingDriftMonitor(
        base, vector_col="vector", ks_threshold=0.2,
        history_dir=str(tmp_path / "drift_history"))

    # quiet batches: same distribution
    for e in range(3):
        rep = mon.check_batch(
            vecs(spark, [(i, v) for i, v in
                         enumerate(_gauss(rng, 200, center))]), epoch_id=e)
        assert not rep["is_drifting"], rep
    assert mon.trend(window=3) == "stable"

    # warm-up path: tiny batch records a zero entry
    tiny = mon.check_batch(vecs(spark, [(0, [1.0, 1.0, 1.0, 1.0])]),
                           epoch_id=3)
    assert tiny["n_samples"] == 1 and tiny["drift_score"] == 0.0

    # drifting batches: shifted center
    for e in range(4, 9):
        rep = mon.check_batch(
            vecs(spark, [(i, v) for i, v in enumerate(
                _gauss(rng, 200, np.array([4.0, -2.0, 4.0, -2.0])))]),
            epoch_id=e)
        assert rep["is_drifting"] and rep["severity"] in ("medium", "high")
    assert mon.trend(window=5) == "severe_drift"

    hist = mon.history().orderBy("epoch_id").collect()
    assert len(hist) == 9
    assert [r["is_drifting"] for r in hist] == [False] * 4 + [True] * 5


def test_streaming_drift_monitor_attaches_to_stream(spark, tmp_path):
    """End-to-end wiring through a real file stream + foreachBatch."""
    import json as _json

    from needle_spark.streaming.drift_monitor import StreamingDriftMonitor

    rng = np.random.default_rng(8)
    center = np.array([1.0, 1.0, 1.0, 1.0])
    base = vecs(spark, [(i, v) for i, v in
                        enumerate(_gauss(rng, 200, center))])
    mon = StreamingDriftMonitor(base, vector_col="vector", min_samples=5)

    src = str(tmp_path / "stream_src")
    import os as _os
    _os.makedirs(src, exist_ok=True)
    with open(_os.path.join(src, "b1.json"), "w") as f:
        for i, v in enumerate(_gauss(rng, 50,
                                     np.array([4.0, -2.0, 4.0, -2.0]))):
            f.write(_json.dumps({"id": i, "vector": v}) + "\n")
    stream = (spark.readStream.schema("id long, vector array<float>")
              .json(src))
    q = mon.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"),
                   available_now=True)
    q.awaitTermination(120)
    hist = mon.history().collect()
    assert len(hist) >= 1 and any(r["is_drifting"] for r in hist)
