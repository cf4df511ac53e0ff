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

from dataclasses import dataclass
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
    cols = [id_col, vector_col]
    if distance_col in candidates.columns:
        cols.append(distance_col)  # passed through for the caller
    rows = candidates.select(*cols).collect()
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


# ------------------------------------------------- IDF term overlap ---

def term_overlap_idf_scores(
    results: DataFrame,
    query_text: str,
    text_col: str = "text",
    out_col: str = "rerank_score",
) -> DataFrame:
    """TF-IDF weighted term overlap — the exact scoring of the
    reference's TermOverlapReranker (reranker.rs score_by_term_overlap
    :415-468): per query term, smoothed IDF over the CANDIDATE SET
    (ln((N+1)/(df+1)) + 1); a document scores the sum of IDFs of the
    query terms it contains, normalized by sqrt(|distinct doc terms|) *
    n_query_terms.  Whitespace tokenization, like the reference.

    Pure Catalyst: the candidate set is small (post-ANN), so the
    full-partition window aggregates cost nothing."""
    from pyspark.sql import Window

    q_terms = [t for t in query_text.lower().split() if t]
    if not q_terms:
        return results.withColumn(out_col, F.lit(0.0))
    doc_terms = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                 lambda t: F.length(t) > 0))
    w = Window.partitionBy()
    out = results.withColumn("__dt", doc_terms)
    n = F.count(F.lit(1)).over(w).cast("double")
    score = F.lit(0.0)
    for i, t in enumerate(dict.fromkeys(q_terms)):  # unique, order kept
        has = F.array_contains(F.col("__dt"), t)
        df_t = F.sum(has.cast("int")).over(w).cast("double")
        idf = F.log((n + 1.0) / (df_t + 1.0)) + 1.0
        score = score + F.when(has, idf).otherwise(F.lit(0.0))
    # NOTE: reference divides by the FULL query term count (dups too)
    denom = F.sqrt(F.greatest(F.size("__dt"), F.lit(1)).cast("double")) \
        * F.lit(float(len(q_terms)))
    return out.withColumn(out_col, score / denom).drop("__dt")


# ----------------------------------------------------- ensemble/noop ---

def ensemble_rerank(
    results: DataFrame,
    scorers,
    top_k: int = 10,
    weights=None,
    rrf_k: float = 60.0,
    id_col: str = "id",
    out_col: str = "score",
) -> DataFrame:
    """EnsembleReranker (reranker.rs:469-553): run each scorer, rank its
    output, fuse with weighted RRF weight/(k + rank + 1) (0-based rank),
    return top_k by fused score.

    scorers: list of (name, fn(results) -> DataFrame with a
    'rerank_score' column)."""
    from functools import reduce

    from pyspark.sql import Window

    if weights is None:
        weights = [1.0] * len(scorers)
    parts = []
    for (name, fn), wt in zip(scorers, weights):
        scored = fn(results)
        w = Window.orderBy(F.col("rerank_score").desc(), F.col(id_col).asc())
        parts.append(scored.select(
            F.col(id_col),
            (F.lit(float(wt)) /
             (F.lit(rrf_k) + F.row_number().over(w).cast("double"))
             ).alias("__c"),
        ))
    fused = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy(id_col).agg(F.sum("__c").alias(out_col))
        .orderBy(F.col(out_col).desc(), F.col(id_col).asc())
        .limit(top_k)
    )
    # the payload join does not preserve sort order — re-rank after
    # it.  A payload column named like out_col (BM25 results carry
    # 'score') would make that orderBy ambiguous: the fused score wins.
    payload = results.drop(out_col) if out_col in results.columns \
        else results
    return fused.join(payload, id_col, "left").orderBy(
        F.col(out_col).desc(), F.col(id_col).asc())


def noop_rerank(results: DataFrame, top_k: int | None = None) -> DataFrame:
    """NoOpReranker (reranker.rs:557): original order, optional cut."""
    return results.limit(top_k) if top_k is not None else results


# ------------------------------------------- Thompson-sampling bandits ---

@dataclass
class RelevanceFeedback:
    """Click/rating feedback event (reranker.rs:598-628)."""

    query_id: str
    vector_id: str
    relevance_score: float
    position: int
    timestamp: int = 0


@dataclass
class BetaParams:
    """Beta distribution state (reranker.rs:632-676): uniform prior,
    mean+variance-scaled-noise sampling, reward updates, drift decay."""

    alpha: float = 1.0
    beta: float = 1.0

    def sample(self, rng) -> float:
        mean = self.alpha / (self.alpha + self.beta)
        var = (self.alpha * self.beta) / (
            (self.alpha + self.beta) ** 2 * (self.alpha + self.beta + 1.0))
        noise = rng.uniform(-1.0, 1.0)
        return min(1.0, max(0.0, mean + noise * var ** 0.5))

    def update(self, reward: float) -> None:
        self.alpha += reward
        self.beta += 1.0 - reward

    def expected_value(self) -> float:
        return self.alpha / (self.alpha + self.beta)

    def decay(self, factor: float) -> None:
        self.alpha = 1.0 + (self.alpha - 1.0) * factor
        self.beta = 1.0 + (self.beta - 1.0) * factor


@dataclass
class BanditsConfig:
    """reranker.rs:680-699 defaults."""

    decay_factor: float = 0.95
    decay_interval: int = 100
    ab_testing: bool = False
    max_feedback_log: int = 10_000


class BanditsReranker:
    """Thompson-sampling reranker learning from user feedback
    (reranker.rs:702-815): per-vector Beta posteriors, sampled scores
    reorder the candidate set (driver-side over <= fetch_k rows, like
    MMR), periodic concept-drift decay, bounded feedback log, optional
    A/B split.  `seed` makes exploration deterministic for tests."""

    def __init__(self, config: BanditsConfig | None = None, seed: int | None = None):
        import random

        self.config = config or BanditsConfig()
        self.params: dict[str, BetaParams] = {}
        self.feedback_log: list[RelevanceFeedback] = []
        self.total_feedback = 0
        self.total_reranks = 0
        self._rng = random.Random(seed)

    def record_feedback(self, fb: RelevanceFeedback) -> None:
        self.params.setdefault(fb.vector_id, BetaParams()).update(fb.relevance_score)
        self.feedback_log.append(fb)
        self.total_feedback += 1
        if self.total_feedback % self.config.decay_interval == 0:
            for p in self.params.values():
                p.decay(self.config.decay_factor)
        if len(self.feedback_log) > self.config.max_feedback_log:
            del self.feedback_log[:len(self.feedback_log) - self.config.max_feedback_log]

    def rerank_rows(self, rows: list, id_col: str = "id") -> list:
        """Reorder collected result rows by Thompson samples (higher
        first; stable for untracked ids which share the uniform
        prior's distribution)."""
        self.total_reranks += 1
        if self.config.ab_testing and self._rng.random() < 0.5:
            return list(rows)
        scored = [
            (self.params.get(r[id_col], BetaParams()).sample(self._rng), i)
            for i, r in enumerate(rows)
        ]
        order = sorted(range(len(rows)), key=lambda i: (-scored[i][0], i))
        return [rows[i] for i in order]

    def rerank(self, results: DataFrame, id_col: str = "id") -> DataFrame:
        rows = results.collect()
        out = self.rerank_rows(rows, id_col=id_col)
        return results.sparkSession.createDataFrame(out, results.schema)

    def expected_relevance(self, vector_id: str) -> float:
        p = self.params.get(vector_id)
        return p.expected_value() if p else 0.5

    def stats(self) -> dict:
        return {
            "total_feedback": self.total_feedback,
            "total_reranks": self.total_reranks,
            "unique_vectors_tracked": len(self.params),
            "feedback_log_size": len(self.feedback_log),
            "ab_testing_enabled": self.config.ab_testing,
        }


# ------------------------------------------- model-API configs (stubs) ---

@dataclass
class CohereConfig:
    """Cohere rerank API config (reranker.rs:134-168) — pair with
    rerank_udf(client.score) in production; no network in tests."""

    api_key: str = ""
    model: str = "rerank-english-v2.0"
    base_url: str = "https://api.cohere.ai/v1"
    timeout_secs: int = 30


@dataclass
class HuggingFaceConfig:
    """Cross-encoder config (reranker.rs:307-358)."""

    model: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"
    device: str = "cpu"
    max_length: int = 512
    batch_size: int = 32
