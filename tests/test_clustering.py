"""K-means clustering (reference: src/experimental/clustering.rs) via
the distributed Spark ML engine adapted to array<float> columns."""

import numpy as np
import pytest

from needle_spark.plans.clustering import (
    ClusteringConfig,
    KMeansModel,
    cluster_summary,
    cluster_vectors,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(11)
    rows = []
    for c, center in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
        for i in range(40):
            v = [float(center[0] + rng.normal(0, 0.4)),
                 float(center[1] + rng.normal(0, 0.4))]
            rows.append((f"{c}_{i}", v))
    return spark.createDataFrame(rows, "id string, vector array<float>")


def test_fit_recovers_blobs(blobs):
    model = KMeansModel.fit(blobs, k=3)
    assert model.k == 3
    assigned = model.predict(blobs).collect()
    # every planted blob maps to exactly one cluster id
    by_blob = {}
    for r in assigned:
        by_blob.setdefault(r["id"].split("_")[0], set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
    # centroids land near the planted centers
    for cx, cy in [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]:
        assert any(abs(c[0] - cx) < 1 and abs(c[1] - cy) < 1
                   for c in model.centroids)


def test_inertia_and_silhouette(blobs):
    m3 = KMeansModel.fit(blobs, k=3)
    m2 = KMeansModel.fit(blobs, k=2)  # Spark ML requires k >= 2
    assert m3.inertia < m2.inertia  # more clusters -> lower SSE
    assert m3.silhouette(blobs) > 0.8  # well-separated blobs


def test_seed_determinism(blobs):
    a = KMeansModel.fit(blobs, k=3, config=ClusteringConfig(seed=5))
    b = KMeansModel.fit(blobs, k=3, config=ClusteringConfig(seed=5))
    assert sorted(a.centroids) == sorted(b.centroids)


def test_cosine_distance_mode(spark):
    rows = [(f"a{i}", [1.0, 0.01 * i]) for i in range(20)] + \
           [(f"b{i}", [0.01 * i, 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "id string, vector array<float>")
    got = cluster_vectors(df, 2, config=ClusteringConfig(distance="cosine"))
    by = {}
    for r in got.collect():
        by.setdefault(r["id"][0], set()).add(r["cluster"])
    assert by["a"] != by["b"] and len(by["a"]) == 1
    with pytest.raises(ValueError):
        ClusteringConfig(distance="manhattan") and KMeansModel.fit(
            df, 2, config=ClusteringConfig(distance="manhattan"))


def test_cluster_summary(blobs):
    model = KMeansModel.fit(blobs, k=3)
    summ = cluster_summary(blobs, model).collect()
    assert len(summ) == 3
    assert all(r["count"] == 40 for r in summ)
    assert all(r["spread"] < 2.0 for r in summ)  # tight blobs


def test_cosine_silhouette_works(spark):
    rows = [(f"a{i}", [1.0, 0.01 * i]) for i in range(15)] + \
           [(f"b{i}", [0.01 * i, 1.0]) for i in range(15)]
    df = spark.createDataFrame(rows, "id string, vector array<float>")
    m = KMeansModel.fit(df, 2, config=ClusteringConfig(distance="cosine"))
    assert m.silhouette(df) > 0.5  # no longer crashes on cosine
