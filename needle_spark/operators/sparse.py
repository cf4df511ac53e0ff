"""Sparse-vector search (TF-IDF / BM25 / SPLADE-style).

Reference: /root/reference/src/indexing/sparse.rs — documents hold
(indices[], values[]) pairs; relevance = dot product over matching
indices; top-k by score.

Spark shape: a classic sparse matrix-vector product as a join —
posexplode doc postings to (id, idx, val) rows, equi-join the (tiny,
broadcast) query postings on idx, groupBy(id).sum(val*qval).  At corpus
scale this is the inverted-index pattern: only postings for the query's
indices are touched (predicate pushdown on idx), and the aggregation is
map-side combined.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sparse_dot_scores(
    docs: DataFrame,
    query_indices: Sequence[int],
    query_values: Sequence[float],
    id_col: str = "id",
    indices_col: str = "indices",
    values_col: str = "values",
    score_col: str = "score",
) -> DataFrame:
    """(id, score) for all docs with score != 0 (docs sharing >=1 index)."""
    if len(query_indices) != len(query_values):
        raise ValueError("indices/values length mismatch")
    spark = docs.sparkSession
    q = spark.createDataFrame(
        list(zip([int(i) for i in query_indices], [float(v) for v in query_values])),
        "__idx int, __qval double",
    )
    posting = docs.select(
        F.col(id_col),
        F.explode(F.arrays_zip(F.col(indices_col), F.col(values_col))).alias("__p"),
    ).select(
        F.col(id_col),
        F.col(f"__p.{indices_col}").cast("int").alias("__idx"),
        F.col(f"__p.{values_col}").cast("double").alias("__val"),
    )
    return (
        posting.join(F.broadcast(q), "__idx")
        .groupBy(id_col)
        .agg(F.sum(F.col("__val") * F.col("__qval")).alias(score_col))
    )


def sparse_topk(
    docs: DataFrame,
    query_indices: Sequence[int],
    query_values: Sequence[float],
    k: int = 10,
    rounding: int | None = 9,
    id_col: str = "id",
    **kwargs,
) -> DataFrame:
    score_col = kwargs.get("score_col", "score")
    scored = sparse_dot_scores(docs, query_indices, query_values, id_col=id_col, **kwargs)
    key = F.round(F.col(score_col), rounding) if rounding else F.col(score_col)
    return scored.orderBy(key.desc(), F.col(id_col).asc()).limit(k)
