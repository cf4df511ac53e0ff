"""Arrow batch-kNN fast path must agree with the exact expression path."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.knn import batch_knn
from needle_spark.operators.knn_arrow import batch_knn_arrow

METRICS = ["cosine", "euclidean", "dot", "manhattan", "chebyshev"]


@pytest.mark.parametrize("metric", METRICS)
def test_arrow_matches_exact(spark, embeddings, metric):
    queries = embeddings.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    exact = batch_knn(
        embeddings, queries, k=5, metric=metric,
        doc_vector_col="embedding", doc_id_col="vec_id",
    ).collect()
    fast = batch_knn_arrow(
        embeddings.repartition(7), queries, k=5, metric=metric,
        doc_vector_col="embedding", doc_id_col="vec_id",
    ).collect()
    key = lambda rows: [(r["query_id"], r["rank"], r["vec_id"]) for r in
                        sorted(rows, key=lambda r: (r["query_id"], r["rank"]))]
    assert key(exact) == key(fast)
    ed = {(r["query_id"], r["vec_id"]): r["distance"] for r in exact}
    # euclidean uses the |v|^2 - 2v.q + |q|^2 expansion -> ~1e-8 noise;
    # the engine's documented accuracy contract is 1e-6.
    for r in fast:
        assert abs(ed[(r["query_id"], r["vec_id"])] - r["distance"]) < 1e-6
