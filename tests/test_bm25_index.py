"""Bm25Index (build-once) must agree with the one-shot bm25_scores and
amortize repeated queries."""

import time

import pytest

from needle_spark.operators.hybrid import Bm25Index, bm25_scores


def test_index_matches_oneshot(spark, documents):
    idx = Bm25Index(documents, id_col="doc_id", text_col="text")
    try:
        for q in ("fast merge sort join", "window batch", "the"):
            a = {r["doc_id"]: r["score"] for r in idx.search(q, limit=None).collect()}
            b = {r["doc_id"]: r["score"] for r in
                 bm25_scores(documents, q, id_col="doc_id", text_col="text").collect()}
            assert set(a) == set(b)
            for k in a:
                assert abs(a[k] - b[k]) < 1e-9
    finally:
        idx.unpersist()


def test_search_many_matches_per_query(spark, documents):
    """Batched multi-query search (one explode+join job) returns exactly
    the per-query top-k."""
    queries = {"q0": "fast merge sort", "q1": "window batch", "q2": "query row data"}
    idx = Bm25Index(documents, id_col="doc_id", text_col="text")
    try:
        many = idx.search_many(queries, limit=10).collect()
        got = {}
        for r in many:
            got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
        for qid, text in queries.items():
            want = [(r["doc_id"], r["score"])
                    for r in idx.search(text, limit=10).collect()]
            assert sorted(got[qid]) == sorted(want), qid
    finally:
        idx.unpersist()


def test_index_amortizes(spark, documents):
    idx = Bm25Index(documents, id_col="doc_id", text_col="text")
    try:
        idx.search("fast merge", limit=5).collect()  # warm the caches
        t0 = time.perf_counter()
        for q in ("sort join", "window batch scan", "query row data"):
            idx.search(q, limit=5).collect()
        amortized = (time.perf_counter() - t0) / 3
        t1 = time.perf_counter()
        bm25_scores(documents, "sort join", id_col="doc_id", text_col="text").collect()
        oneshot = time.perf_counter() - t1
        # warm index queries skip the tokenize scan entirely
        assert amortized < oneshot * 1.5
    finally:
        idx.unpersist()
