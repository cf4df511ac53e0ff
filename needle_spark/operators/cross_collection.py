"""Cross-collection / federated search.

Reference: /root/reference/src/search/cross_collection.rs — the same
query over many collections, merged with per-collection score
normalization (:748 min-max / z-score / softmax), aggregation strategies
(:56), routing rules (:996-1015); federated variant :765-798.

Spark shape: per-collection kNN (each a TakeOrderedAndProject over its
own scan) -> unionByName with a `collection` tag -> window-normalize per
collection -> global top-k.  Collections scan in parallel; the union is
k rows per collection, so the merge costs nothing at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from needle_spark.operators.knn import knn


def cross_collection_knn(
    collections: dict[str, DataFrame],
    query_vector: Sequence[float],
    k: int = 10,
    per_collection_k: int | None = None,
    metric: str = "cosine",
    normalization: str | None = "min_max",
    vector_col: str = "vector",
    id_col: str = "id",
    filter=None,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k across collections: (collection, id, distance, norm_score).

    Scoring: similarity = 1/(1+distance) normalized per collection so
    collections with different embedding scales are comparable
    (cross_collection.rs:748), optionally weighted per collection
    (routing rules :996-1015), then global top-k by score.
    """
    if not collections:
        raise ValueError("no collections given")
    per_k = per_collection_k or k
    parts = []
    for name, df in sorted(collections.items()):
        r = knn(
            df, query_vector, k=per_k, metric=metric, filter=filter,
            vector_col=vector_col, id_col=id_col,
        ).select(
            F.lit(name).alias("collection"),
            F.col(id_col).cast("string").alias(id_col),
            F.col("distance"),
        )
        parts.append(r)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    sim = F.lit(1.0) / (F.lit(1.0) + F.col("distance"))
    u = u.withColumn("score", sim)
    if normalization:
        w = Window.partitionBy("collection")
        s = F.col("score")
        if normalization == "min_max":
            lo, hi = F.min(s).over(w), F.max(s).over(w)
            u = u.withColumn(
                "score", F.when(hi == lo, F.lit(1.0)).otherwise((s - lo) / (hi - lo))
            )
        elif normalization == "z_score":
            mu, sd = F.avg(s).over(w), F.stddev_pop(s).over(w)
            u = u.withColumn(
                "score", F.when(sd == 0.0, F.lit(0.0)).otherwise((s - mu) / sd)
            )
        elif normalization == "softmax":
            mx = F.max(s).over(w)
            e = F.exp(s - mx)
            u = u.withColumn("score", e / F.sum(e).over(w))
        else:
            raise ValueError(f"unknown normalization: {normalization!r}")
    if weights:
        wexpr = F.lit(1.0)
        for name, wt in weights.items():
            wexpr = F.when(F.col("collection") == name, F.lit(float(wt))).otherwise(wexpr)
        u = u.withColumn("score", F.col("score") * wexpr)
    return u.orderBy(
        F.col("score").desc(), F.col("collection").asc(), F.col(id_col).asc()
    ).limit(k)
