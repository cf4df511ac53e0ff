"""Bm25Index (build-once) must agree with the one-shot bm25_scores and
amortize repeated queries; version-stamped indexes detect source drift."""

import time
import warnings

import pytest

from needle_spark.catalog import Database
from needle_spark.operators.hybrid import (
    Bm25Index,
    StaleIndexError,
    StaleIndexWarning,
    bm25_scores,
)


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


@pytest.fixture()
def text_coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "bm25db"))
    c = db.create_collection(
        "texts", dims=2, schema="id string, vector array<float>, text string"
    )
    c.insert(spark.createDataFrame(
        [("a", [1.0, 0.0], "merge sort join algorithms"),
         ("b", [0.0, 1.0], "window batch streaming scan"),
         ("c", [1.0, 1.0], "query row data layout")],
        "id string, vector array<float>, text string",
    ), now_ms=1000)
    return c


def test_stale_warn_default(spark, text_coll):
    idx = Bm25Index.from_collection(text_coll)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # fresh index: no warning
            idx.search("merge sort", limit=5).collect()
        text_coll.insert(spark.createDataFrame(
            [("d", [0.5, 0.5], "merge sort revisited")],
            "id string, vector array<float>, text string"))
        with pytest.warns(StaleIndexWarning, match="version 1 .*now at version 2"):
            got = idx.search("merge sort", limit=5).collect()
        # warn policy serves the FROZEN postings (build-once lifecycle)
        assert {r["id"] for r in got} == {"a"}
    finally:
        idx.unpersist()


def test_stale_error_and_ignore(spark, text_coll):
    idx = Bm25Index.from_collection(text_coll, stale_policy="error")
    try:
        text_coll.delete(ids=["c"])
        with pytest.raises(StaleIndexError):
            idx.search("query row", limit=5).collect()
        idx.stale_policy = "ignore"
        assert {r["id"] for r in idx.search("query row", limit=5).collect()} == {"c"}
    finally:
        idx.unpersist()


def test_stale_rebuild(spark, text_coll):
    idx = Bm25Index.from_collection(text_coll, stale_policy="rebuild")
    try:
        text_coll.insert(spark.createDataFrame(
            [("d", [0.5, 0.5], "merge sort revisited")],
            "id string, vector array<float>, text string"))
        got = {r["id"] for r in idx.search("merge sort", limit=5).collect()}
        assert got == {"a", "d"}
        assert idx.built_version == text_coll._read_manifest()["version"]
        # search_many also checks; no further drift -> no rebuild churn
        many = idx.search_many({"q": "merge sort"}, limit=5).collect()
        assert {r["id"] for r in many} == {"a", "d"}
    finally:
        idx.unpersist()
