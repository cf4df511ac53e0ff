"""Reranker family depth (reranker.rs): IDF-weighted term overlap
(exact formula :415-468), ensemble RRF fusion (:469-553), no-op (:557),
Thompson-sampling bandits with feedback learning (:598-815)."""

import math

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.rerank import (
    BanditsConfig,
    BanditsReranker,
    BetaParams,
    RelevanceFeedback,
    ensemble_rerank,
    noop_rerank,
    term_overlap_idf_scores,
    term_overlap_scores,
)

DOCS = [
    ("a", "spark shuffles data between executors"),
    ("b", "spark caches hot data in memory"),
    ("c", "completely unrelated cooking recipe"),
    ("d", "executors run spark tasks on data partitions"),
]


@pytest.fixture(scope="module")
def results(spark):
    return spark.createDataFrame(DOCS, "id string, text string")


def py_idf_overlap(query, docs):
    """Line-for-line python oracle of score_by_term_overlap."""
    q_terms = query.lower().split()
    n = float(len(docs))
    lowers = [d.lower() for d in docs]
    idf = {}
    for t in q_terms:
        df = float(sum(1 for d in lowers if t in d.split()))
        idf[t] = math.log((n + 1.0) / (df + 1.0)) + 1.0
    out = []
    for d in lowers:
        terms = set(d.split())
        score = sum(idf[t] for t in q_terms if t in terms)
        out.append(score / (math.sqrt(max(len(terms), 1)) * len(q_terms)))
    return out


def test_idf_overlap_matches_reference_formula(results):
    query = "spark data executors"
    got = {r["id"]: r["rerank_score"] for r in
           term_overlap_idf_scores(results, query).collect()}
    want = dict(zip([d[0] for d in DOCS],
                    py_idf_overlap(query, [d[1] for d in DOCS])))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    # rare-term weighting: doc with the rarer matched terms outranks a
    # doc matching only common terms
    assert got["d"] > got["c"]


def test_ensemble_rrf_fusion(results):
    """Two scorers fused by weighted RRF; weights tilt the winner."""
    s_simple = ("simple", lambda df: term_overlap_scores(df, "spark data"))
    s_cook = ("cooking", lambda df: term_overlap_scores(df, "cooking recipe"))
    fused = ensemble_rerank(results, [s_simple, s_cook], top_k=4).collect()
    assert len(fused) == 4
    scores = [r["score"] for r in fused]
    assert scores == sorted(scores, reverse=True)
    # heavily weighting the cooking scorer pushes doc c to the top
    tilted = ensemble_rerank(
        results, [s_simple, s_cook], weights=[0.1, 10.0], top_k=1).collect()
    assert tilted[0]["id"] == "c"


def test_noop_rerank(results):
    assert noop_rerank(results).count() == 4
    assert noop_rerank(results, top_k=2).count() == 2


def test_beta_params_math():
    p = BetaParams()
    assert p.expected_value() == 0.5  # uniform prior
    p.update(1.0)
    assert (p.alpha, p.beta) == (2.0, 1.0)
    assert abs(p.expected_value() - 2.0 / 3.0) < 1e-12
    p.update(0.0)
    assert (p.alpha, p.beta) == (2.0, 2.0)
    p.decay(0.5)
    assert (p.alpha, p.beta) == (1.5, 1.5)  # 1 + (x-1)*factor


def test_bandits_learns_from_feedback(results):
    r = BanditsReranker(BanditsConfig(decay_interval=1000), seed=7)
    # heavy positive feedback for c, negative for a
    for _ in range(40):
        r.record_feedback(RelevanceFeedback("q", "c", 1.0, 0))
        r.record_feedback(RelevanceFeedback("q", "a", 0.0, 1))
    assert r.expected_relevance("c") > 0.9
    assert r.expected_relevance("a") < 0.1
    assert r.expected_relevance("never_seen") == 0.5
    rows = results.orderBy("id").collect()
    top = [r.rerank_rows(rows)[0]["id"] for _ in range(10)]
    assert top.count("c") >= 8  # exploitation dominates after feedback
    st = r.stats()
    assert st["total_feedback"] == 80 and st["unique_vectors_tracked"] == 2
    assert st["total_reranks"] == 10


def test_bandits_decay_and_log_bounds():
    r = BanditsReranker(BanditsConfig(decay_interval=10, decay_factor=0.5,
                                      max_feedback_log=5), seed=1)
    for i in range(10):
        r.record_feedback(RelevanceFeedback("q", "v", 1.0, 0, timestamp=i))
    assert len(r.feedback_log) == 5  # evicted to the cap
    # decay fired at event 10: alpha pulled halfway back toward 1
    assert r.params["v"].alpha < 11.0
