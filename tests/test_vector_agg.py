"""Vector aggregations (reference:
src/experimental/vector_aggregation.rs): group centroids (exact +
Summarizer paths), spread, distance distributions, centroid outliers,
and per-group medoids."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.vector_agg import (
    centroid_distances,
    centroid_outliers,
    group_centroids,
    group_centroids_ml,
    group_distribution,
    group_medoid,
    group_spread,
)


@pytest.fixture(scope="module")
def grouped(spark):
    rows = [
        ("a1", "g1", [1.0, 0.0]), ("a2", "g1", [3.0, 0.0]),
        ("a3", "g1", [2.0, 3.0]),
        ("b1", "g2", [10.0, 10.0]), ("b2", "g2", [12.0, 10.0]),
    ]
    return spark.createDataFrame(rows, "id string, label string, "
                                       "vector array<float>")


def test_group_centroids_exact(grouped):
    cents = {r["group"]: r for r in group_centroids(grouped).collect()}
    assert cents["g1"]["centroid"] == [2.0, 1.0]
    assert cents["g1"]["count"] == 3
    assert cents["g2"]["centroid"] == [11.0, 10.0]


def test_group_centroids_partition_invariant(grouped):
    a = sorted((r["group"], tuple(r["centroid"])) for r in
               group_centroids(grouped.repartition(1)).collect())
    b = sorted((r["group"], tuple(r["centroid"])) for r in
               group_centroids(grouped.repartition(7)).collect())
    assert a == b


def test_group_centroids_ml_agrees(grouped):
    exact = {r["group"]: r["centroid"]
             for r in group_centroids(grouped).collect()}
    ml = {r["group"]: r["centroid"]
          for r in group_centroids_ml(grouped).collect()}
    for g in exact:
        assert np.allclose(exact[g], ml[g], atol=1e-5)


def test_group_spread(grouped):
    sp = {r["group"]: r["spread"] for r in group_spread(grouped).collect()}
    # g1: centroid (2,1); squared dists: (1+1), (1+1), (0+4) -> mean 8/3
    assert sp["g1"] == pytest.approx(8.0 / 3.0, abs=1e-5)
    assert sp["g2"] == pytest.approx(1.0, abs=1e-5)


def test_centroid_distances_and_outliers(spark):
    rows = [(f"n{i}", "g", [0.0 + 0.1 * (i % 3), 0.0]) for i in range(20)]
    rows.append(("far", "g", [50.0, 50.0]))
    df = spark.createDataFrame(rows, "id string, label string, "
                                     "vector array<float>")
    cents = group_centroids(df)
    with_d = centroid_distances(df, cents)
    far = with_d.filter(F.col("id") == "far").first()
    assert far["centroid_distance"] > 10
    out = centroid_outliers(df, threshold=2.0).collect()
    assert [r["id"] for r in out] == ["far"]
    assert out[0]["z_score"] > 2.0


def test_group_distribution(grouped):
    dist = {r["group"]: r for r in
            group_distribution(grouped, num_bins=4).collect()}
    g1 = dist["g1"]
    assert g1["min_distance"] >= 0
    assert g1["max_distance"] >= g1["mean_distance"] >= g1["min_distance"]
    assert len(g1["bin_counts"]) == 4
    assert sum(g1["bin_counts"]) == 3  # every member lands in a bin


def test_group_medoid(grouped):
    med = {r["group"]: r for r in group_medoid(grouped).collect()}
    # g1 medoid: the member minimizing summed distance (a3 is far; a1/a2
    # symmetric; compute: a1: 2 + sqrt(1+9)=5.16; a2: 2+sqrt(1+9)=5.16;
    # a3: sqrt(10)+sqrt(10)=6.32) -> tie a1/a2, argmin picks first
    assert med["g1"]["medoid_id"] in ("a1", "a2")
    assert med["g2"]["medoid_id"] in ("b1", "b2")
    assert med["g2"]["total_distance"] == pytest.approx(2.0)


def test_group_medoid_cap_and_metrics(spark, grouped):
    with pytest.raises(ValueError):
        group_medoid(grouped, metric="hamming")
    big = spark.createDataFrame(
        [(str(i), "g", [float(i), 0.0]) for i in range(30)],
        "id string, label string, vector array<float>")
    import py4j

    with pytest.raises(Exception):  # cap raises inside the task
        group_medoid(big, max_group_rows=10).collect()
    med = group_medoid(big, max_group_rows=50, metric="manhattan").first()
    assert med["medoid_id"] in ("14", "15")  # middle of the line
