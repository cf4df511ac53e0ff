"""PCA + random projection (reference: src/ml/dimreduce.rs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.dimreduce import PCA, RandomProjection


@pytest.fixture(scope="module")
def line_data(spark):
    # points along direction (3,4)/5 in 2-d plus small orthogonal noise
    rng = np.random.default_rng(11)
    t = rng.normal(size=400) * 10.0
    noise = rng.normal(size=400) * 0.1
    d = np.array([0.6, 0.8])
    o = np.array([-0.8, 0.6])
    pts = np.outer(t, d) + np.outer(noise, o) + np.array([5.0, -3.0])
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(pts)],
        "id long, vector array<double>",
    )


def test_pca_recovers_principal_direction(line_data):
    pca = PCA.fit(line_data, n_components=2)
    pc0 = pca.components[0]
    # principal axis aligns with (0.6, 0.8) up to sign
    assert abs(abs(float(np.dot(pc0, [0.6, 0.8]))) - 1.0) < 1e-3
    assert pca.mean == pytest.approx([5.0, -3.0], abs=1.0)
    ratios = pca.explained_variance_ratio()
    assert ratios[0] > 0.99 and ratios[0] >= ratios[1]


def test_pca_transform_matches_numpy(line_data):
    pca = PCA.fit(line_data, n_components=2)
    rows = line_data.orderBy("id").collect()
    x = np.array([r["vector"] for r in rows])
    expect = (x - pca.mean) @ pca.components.T
    got = pca.transform(line_data).orderBy("id").collect()
    got_m = np.array([[r["pc0"], r["pc1"]] for r in got])
    assert np.allclose(got_m, expect, atol=1e-9)


def test_pca_fit_is_distributed_no_row_collect(line_data):
    # the fit path only collects per-partition (n, sum, scatter) rows
    parts = line_data.repartition(8)
    a = PCA.fit(parts, n_components=1)
    b = PCA.fit(line_data.coalesce(1), n_components=1)
    assert np.allclose(np.abs(a.components), np.abs(b.components), atol=1e-9)
    assert np.allclose(a.explained_variance, b.explained_variance, atol=1e-9)


def test_random_projection_deterministic_and_jl(spark, embeddings):
    emb = embeddings.select("vec_id", F.col("embedding").alias("vector"))
    rp = RandomProjection(in_dim=64, out_dim=16, seed=3)
    assert rp.matrix() == RandomProjection(64, 16, 3).matrix()

    out = rp.transform(emb).orderBy("vec_id").limit(60).collect()
    orig = {r["vec_id"]: np.array(r["vector"], dtype=float) for r in
            emb.orderBy("vec_id").limit(60).collect()}
    proj = {r["vec_id"]: np.array([r[f"p{j}"] for j in range(16)])
            for r in out}
    # JL flavor: distance ratios concentrate around the matrix's norm
    # shrink factor sqrt(1/3) (entries uniform(-1,1)/sqrt(k) have
    # per-entry variance 1/3) — each pair within a loose band, the mean
    # close to the theoretical factor
    ids = sorted(orig)
    ratios = []
    for i in range(0, 40, 2):
        a, b = ids[i], ids[i + 1]
        od = np.linalg.norm(orig[a] - orig[b])
        pd_ = np.linalg.norm(proj[a] - proj[b])
        ratios.append(pd_ / od)
    shrink = 1.0 / np.sqrt(3.0)
    assert all(0.3 * shrink < r < 2.5 * shrink for r in ratios)
    assert abs(np.mean(ratios) - shrink) < 0.35 * shrink


def test_random_projection_plan_map_only(spark, embeddings):
    emb = embeddings.select("vec_id", F.col("embedding").alias("vector"))
    plan = RandomProjection(64, 2, 7).transform(
        emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "pythonUDF" not in plan


def test_pca_empty_dataset_raises_value_error(spark):
    empty = spark.createDataFrame([], "id long, vector array<float>")
    import pytest as _pytest

    from needle_spark.operators.dimreduce import PCA
    with _pytest.raises(ValueError, match="empty"):
        PCA.fit(empty, n_components=2)


# ------------------------------------------------- neighbor embedding --

def _cluster_frame(spark, n_per=40, d=16, seed=4):
    rng = np.random.default_rng(seed)
    centers = np.zeros((3, d))
    centers[0, 0] = 10.0
    centers[1, 1] = 10.0
    centers[2, 2] = 10.0
    rows = []
    for c in range(3):
        pts = centers[c] + rng.normal(scale=0.5, size=(n_per, d))
        rows += [(c * n_per + i, c, [float(x) for x in pts[i]])
                 for i in range(n_per)]
    return spark.createDataFrame(
        rows, "id long, cluster int, vector array<float>")


def test_neighbor_embedding_preserves_clusters(spark):
    """Trustworthiness at fixture scale: planted clusters stay
    separated in the 2-d layout (same-cluster mean distance well below
    cross-cluster)."""
    from needle_spark.operators.dimreduce import NeighborEmbedding

    df = _cluster_frame(spark)
    ne = NeighborEmbedding(n_iter=300, perplexity=15.0, max_landmarks=60,
                           seed=11)
    out = ne.fit_transform(df).collect()
    assert all(len(r["layout"]) == 2 and
               all(np.isfinite(v) for v in r["layout"]) for r in out)
    pos = {r["id"]: np.array(r["layout"]) for r in out}
    clu = {r["id"]: r["cluster"] for r in out}
    ids = sorted(pos)
    same, cross = [], []
    for i in range(0, len(ids), 3):
        for j in range(i + 1, len(ids), 7):
            d2 = np.linalg.norm(pos[ids[i]] - pos[ids[j]])
            (same if clu[ids[i]] == clu[ids[j]] else cross).append(d2)
    # clear separation, not a tuned constant: cross-cluster pairs sit
    # at least 2x further apart than same-cluster pairs on average
    assert np.mean(same) < 0.5 * np.mean(cross)


def test_neighbor_embedding_deterministic(spark):
    from needle_spark.operators.dimreduce import NeighborEmbedding

    df = _cluster_frame(spark, n_per=15)
    a = NeighborEmbedding(n_iter=100, max_landmarks=30, seed=5).fit_transform(df)
    b = NeighborEmbedding(n_iter=100, max_landmarks=30, seed=5).fit_transform(df)
    la = {r["id"]: r["layout"] for r in a.collect()}
    lb = {r["id"]: r["layout"] for r in b.collect()}
    assert la == lb
    # and invariant to input partitioning (hash-ordered landmark sample)
    c = NeighborEmbedding(n_iter=100, max_landmarks=30, seed=5).fit_transform(
        df.repartition(7))
    lc = {r["id"]: r["layout"] for r in c.collect()}
    assert {k: [round(v, 9) for v in vs] for k, vs in la.items()} == \
           {k: [round(v, 9) for v in vs] for k, vs in lc.items()}


def test_neighbor_embedding_landmarks_exact(spark):
    """A row that served as a landmark lands (nearly) on its fitted
    position: its zero distance dominates the inverse-distance weights."""
    from needle_spark.operators.dimreduce import NeighborEmbedding

    df = _cluster_frame(spark, n_per=12)
    ne = NeighborEmbedding(n_iter=100, max_landmarks=36, seed=3)
    out = ne.fit_transform(df)  # 36 rows = all rows are landmarks
    pos = {r["id"]: np.array(r["layout"]) for r in out.collect()}
    fitted = ne.landmarks_ld
    hd = ne.landmarks_hd
    # match each landmark row back by high-dim vector
    rows = {r["id"]: np.array(r["vector"]) for r in df.collect()}
    for i in range(hd.shape[0]):
        rid = next(k for k, v in rows.items()
                   if np.allclose(v, hd[i], atol=1e-6))
        assert np.allclose(pos[rid], fitted[i], atol=1e-4)


def test_neighbor_embedding_empty_raises(spark):
    from needle_spark.operators.dimreduce import NeighborEmbedding

    empty = spark.createDataFrame([], "id long, vector array<float>")
    with pytest.raises(ValueError, match="empty"):
        NeighborEmbedding().fit(empty)


def test_neighbor_embedding_single_row_is_finite(spark):
    from needle_spark.operators.dimreduce import NeighborEmbedding

    df = spark.createDataFrame([(0, [1.0, 2.0])], "id long, vector array<float>")
    out = NeighborEmbedding(n_iter=50).fit_transform(df).collect()
    assert len(out) == 1
    assert list(out[0]["layout"]) == [0.0, 0.0]
