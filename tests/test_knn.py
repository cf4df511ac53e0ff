"""kNN pipeline semantics (reference: src/collection/pipeline.rs:252-447,
search_methods.rs, batch.rs) checked against a brute-force python oracle."""

import math

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.knn import batch_knn, knn, radius_search, recommend


@pytest.fixture(scope="module")
def emb_local(embeddings):
    return [(r["vec_id"], list(r["embedding"]), r["label"]) for r in embeddings.collect()]


def cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if na == 0 or nb == 0:
        return 1.0
    return 1.0 - dot / (na * nb)


def brute(emb_local, qv, k, pred=None):
    rows = [
        (vid, cosine(vec, qv))
        for vid, vec, label in emb_local
        if pred is None or pred(vid, vec, label)
    ]
    rows.sort(key=lambda t: (t[1], t[0]))
    return rows[:k]


def test_knn_matches_bruteforce(spark, embeddings, emb_local):
    qv = emb_local[0][1]
    got = knn(embeddings, qv, k=10, vector_col="embedding", id_col="vec_id").collect()
    want = brute(emb_local, qv, 10)
    assert [r["vec_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert abs(r["distance"] - w[1]) < 1e-9


def test_knn_prefilter(spark, embeddings, emb_local):
    qv = emb_local[0][1]
    got = knn(
        embeddings, qv, k=5, filter={"label": {"$in": [1, 2, 3]}},
        vector_col="embedding", id_col="vec_id",
    ).collect()
    want = brute(emb_local, qv, 5, pred=lambda vid, vec, lab: lab in (1, 2, 3))
    assert [r["vec_id"] for r in got] == [w[0] for w in want]


def test_postfilter_differs_from_prefilter(spark, embeddings, emb_local):
    """post-filter takes GLOBAL top-(k*factor) first then filters
    (pipeline.rs:277-301) — can return < k rows."""
    qv = emb_local[0][1]
    k, factor = 5, 2
    post = knn(
        embeddings, qv, k=k, post_filter={"label": 4}, post_filter_factor=factor,
        vector_col="embedding", id_col="vec_id",
    ).collect()
    top_global = brute(emb_local, qv, k * factor)
    labels = {vid: lab for vid, _, lab in emb_local}
    want = [(vid, d) for vid, d in top_global if labels[vid] == 4][:k]
    assert [r["vec_id"] for r in post] == [w[0] for w in want]


def test_dimension_mismatch_rejected(embeddings):
    with pytest.raises(ValueError):
        knn(embeddings, [1.0, 2.0], dims=64, vector_col="embedding", id_col="vec_id")


def test_nan_rejected(embeddings):
    with pytest.raises(ValueError):
        knn(embeddings, [float("nan")] * 64, vector_col="embedding", id_col="vec_id")


def test_radius(spark, embeddings, emb_local):
    qv = emb_local[0][1]
    r = 0.4
    got = radius_search(embeddings, qv, radius=r, vector_col="embedding", id_col="vec_id").collect()
    want = [(vid, d) for vid, d in brute(emb_local, qv, len(emb_local)) if d <= r]
    assert [g["vec_id"] for g in got] == [w[0] for w in want]


def test_batch_knn(spark, embeddings, emb_local):
    queries = spark.createDataFrame(
        [(vid, vec) for vid, vec, _ in emb_local[:3]], "query_id bigint, vector array<float>"
    )
    got = batch_knn(embeddings, queries, k=4, doc_vector_col="embedding", doc_id_col="vec_id")
    got = got.orderBy("query_id", "rank").collect()
    for qid, qvec, _ in emb_local[:3]:
        rows = [r for r in got if r["query_id"] == qid]
        want = brute(emb_local, qvec, 4)
        assert [r["vec_id"] for r in rows] == [w[0] for w in want]
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_recommend(spark, embeddings, emb_local):
    pos = [emb_local[0][0], emb_local[1][0]]
    got = recommend(
        embeddings, pos, k=5, vector_col="embedding", id_col="vec_id"
    ).collect()
    dims = 64
    qv = [
        (emb_local[0][1][i] + emb_local[1][1][i]) / 2.0
        for i in range(dims)
    ]
    want = brute(emb_local, qv, 5, pred=lambda vid, vec, lab: vid not in pos)
    assert [r["vec_id"] for r in got] == [w[0] for w in want]


def test_ttl_and_asof(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0], 100, None),
            ("b", [0.9, 0.1], 200, 250),   # expires at 250
            ("c", [0.8, 0.2], 300, None),
        ],
        "id string, vector array<float>, inserted_at bigint, expires_at bigint",
    )
    qv = [1.0, 0.0]
    # as_of=250 hides c (inserted later); now=300 hides b (expired)
    got = knn(df, qv, k=10, as_of=250, now=300)
    assert [r["id"] for r in got.collect()] == ["a"]
    got2 = knn(df, qv, k=10, now=200)  # b not yet expired
    assert sorted(r["id"] for r in got2.collect()) == ["a", "b", "c"]
