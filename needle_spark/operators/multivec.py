"""Multi-vector (ColBERT-style) MaxSim scoring.

Reference: /root/reference/src/indexing/multivec.rs — one document = many
token vectors; score(doc) = sum over query tokens of (max over doc
tokens of similarity) (:243 maxsim; two-stage centroid prefilter :275).

Spark shape (the classic exact decomposition): doc tokens exploded as
rows ⋈ broadcast query tokens -> per-(doc, query-token) max -> per-doc
sum -> top-k.  Two hash aggregations with map-side partial max/sum; the
doc-token table is scanned once and never shuffled at full width (only
(doc_id, qtok, sim) triples move).  The centroid prefilter of the
reference maps to the IVF planner at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.functions.distance import dot_expr


def maxsim_scores(
    doc_tokens: DataFrame,
    query_vectors: Sequence[Sequence[float]],
    doc_id_col: str = "doc_id",
    vector_col: str = "vector",
    score_col: str = "score",
) -> DataFrame:
    """Exact MaxSim: (doc_id, score) for every doc.

    Similarity is the dot product (ColBERT convention).  Deterministic:
    per-token max is exact; the final sum is over <= |query tokens|
    values (tiny, noise ~1e-16).
    """
    if not query_vectors:
        raise ValueError("empty query token set")
    q = F.array(*[
        F.struct(
            F.lit(i).alias("qtok"),
            F.array(*[F.lit(float(x)) for x in qv]).alias("qvec"),
        )
        for i, qv in enumerate(query_vectors)
    ])
    exploded = doc_tokens.select(
        F.col(doc_id_col), F.col(vector_col), F.explode(q).alias("__q")
    )
    sim = dot_expr(F.col(vector_col), F.col("__q.qvec"))
    per_qtok = (
        exploded.select(F.col(doc_id_col), F.col("__q.qtok").alias("qtok"), sim.alias("__sim"))
        .groupBy(doc_id_col, "qtok")
        .agg(F.max("__sim").alias("__m"))
    )
    return per_qtok.groupBy(doc_id_col).agg(F.sum("__m").alias(score_col))


def maxsim_topk(
    doc_tokens: DataFrame,
    query_vectors: Sequence[Sequence[float]],
    k: int = 10,
    rounding: int | None = 9,
    doc_id_col: str = "doc_id",
    vector_col: str = "vector",
    score_col: str = "score",
) -> DataFrame:
    scored = maxsim_scores(doc_tokens, query_vectors, doc_id_col, vector_col, score_col)
    key = F.round(F.col(score_col), rounding) if rounding else F.col(score_col)
    return scored.orderBy(key.desc(), F.col(doc_id_col).asc()).limit(k)
