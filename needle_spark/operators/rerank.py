"""Rerankers: MMR diversification and term-overlap scoring.

Reference: MMR (greedy diversify, /root/reference/src/search/
search_pipeline.rs:64-74,307-316; ast.rs:220) and the reranker family
(/root/reference/src/search/reranker.rs — Cohere API, TermOverlap
TF-IDF, CrossEncoder).

MMR is inherently sequential (each pick depends on all previous picks),
so it runs on the DRIVER over the top-fetch_k candidate set — which is
how the reference does it too (candidates are already <= fetch_k after
the ANN stage).  The candidate selection before it is fully distributed.
External model rerankers (Cohere/CrossEncoder) are the pandas-UDF
extension point; TermOverlap is implemented here as a deterministic
in-engine scorer.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.functions.text import tokenize_py


def mmr_diversify(
    candidates: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    lambda_mult: float = 0.5,
    vector_col: str = "vector",
    id_col: str = "id",
    distance_col: str = "distance",
) -> list:
    """Maximal Marginal Relevance: greedily pick k candidates maximizing
    lambda*sim(query, d) - (1-lambda)*max(sim(d, picked)).

    Returns the picked Rows in selection order.  Input should be the
    top-fetch_k candidate DataFrame (with vectors); the greedy loop runs
    driver-side over <= fetch_k rows.
    """
    rows = candidates.select(id_col, vector_col, distance_col).collect()
    if not rows:
        return []
    q = np.asarray(query_vector, dtype=np.float64)
    V = np.asarray([list(r[vector_col]) for r in rows], dtype=np.float64)

    def cos_sim(M, v):
        nm = np.linalg.norm(M, axis=1)
        nv = np.linalg.norm(v)
        denom = np.where(nm * nv == 0.0, 1.0, nm * nv)
        return np.where(nm * nv == 0.0, 0.0, (M @ v) / denom)

    rel = cos_sim(V, q)
    picked: list[int] = []
    remaining = list(range(len(rows)))
    while remaining and len(picked) < k:
        if not picked:
            best = max(remaining, key=lambda i: rel[i])
        else:
            P = V[picked]
            def mmr_score(i):
                div = cos_sim(P, V[i]).max()
                return lambda_mult * rel[i] - (1.0 - lambda_mult) * div
            best = max(remaining, key=mmr_score)
        picked.append(best)
        remaining.remove(best)
    return [rows[i] for i in picked]


def term_overlap_scores(
    results: DataFrame,
    query_text: str,
    text_col: str = "text",
    out_col: str = "rerank_score",
) -> DataFrame:
    """TermOverlap reranker (reranker.rs TermOverlap): fraction of query
    terms present in the document text.  Pure Catalyst expression."""
    q_terms = sorted(set(tokenize_py(query_text)))
    if not q_terms:
        return results.withColumn(out_col, F.lit(0.0))
    from needle_spark.functions.text import tokenize_expr

    toks = tokenize_expr(text_col)
    qarr = F.array(*[F.lit(t) for t in q_terms])
    hits = F.size(F.array_intersect(F.array_distinct(toks), qarr))
    return results.withColumn(
        out_col, hits.cast("double") / F.lit(float(len(q_terms)))
    )


def rerank_udf(score_fn):
    """Extension point for model-based rerankers (Cohere / CrossEncoder,
    reranker.rs): wrap any (query, text) -> score python function as an
    Arrow-batched pandas UDF applied to the candidate set."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _score(query: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series([float(score_fn(q, t)) for q, t in zip(query, text)])

    return _score
