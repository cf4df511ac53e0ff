"""NL->filter parser (nl_filter.rs behavior) and SQ8 quantization."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.nl_filter import NLFilterParser
from needle_spark.plans.quantization import SQ8

NOW = 1_000_000_000


def test_nl_temporal_and_topic():
    p = NLFilterParser()
    q = p.parse("Show me documents from last week about machine learning", now=NOW)
    assert q.temporal is not None
    assert q.temporal["start"] == NOW - 7 * 86400
    assert q.filter == {"inserted_at": {"$gte": NOW - 7 * 86400}}
    assert "machine learning" in q.search_text
    assert "temporal" in q.intents and q.confidence > 0


def test_nl_numeric_and_tags():
    p = NLFilterParser()
    q = p.parse("articles about ML with score > 0.8 tagged as landscape", now=NOW)
    conds = q.filter["$and"]
    assert {"tags": {"$contains": "landscape"}} in conds
    assert {"score": {"$gt": 0.8}} in conds
    assert "ml" in q.search_text


def test_nl_comparison_words_and_fields():
    p = NLFilterParser()
    q = p.parse("documents in category science by alice with rating at least 4", now=NOW)
    conds = q.filter["$and"]
    assert {"category": "science"} in conds
    assert {"author": "alice"} in conds
    assert {"rating": {"$gte": 4.0}} in conds


def test_nl_last_n_days_and_compiles(spark):
    from needle_spark.filters import compile_filter

    p = NLFilterParser()
    q = p.parse("events from the last 3 days", now=NOW)
    assert q.temporal["start"] == NOW - 3 * 86400
    df = spark.createDataFrame(
        [("a", NOW - 86400), ("b", NOW - 10 * 86400)], "id string, inserted_at long"
    )
    kept = [r["id"] for r in df.filter(compile_filter(q.filter, df=df)).collect()]
    assert kept == ["a"]


def test_nl_no_filter():
    q = NLFilterParser().parse("just plain text search", now=NOW)
    assert q.filter is None and q.temporal is None
    assert q.search_text != ""


def test_sq8_roundtrip_and_search(spark, embeddings):
    sq = SQ8.fit(embeddings, vector_col="embedding")
    enc = sq.encode(embeddings).cache()
    # codes are genuinely int8 and reconstruct within one quantization step
    row = enc.select(
        F.max(F.array_max("codes")).alias("hi"), F.min(F.array_min("codes")).alias("lo"),
        F.max(
            F.array_max(
                F.zip_with(
                    sq.dequantize_expr(), F.col("embedding"),
                    lambda d, x: F.abs(d - x.cast("double")),
                )
            )
        ).alias("err"),
    ).first()
    assert -128 <= row["lo"] and row["hi"] <= 127
    step = (sq.hi - sq.lo) / 255.0
    assert row["err"] <= step * 0.5 + 1e-9

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    from needle_spark.operators.knn import knn

    exact = [r["vec_id"] for r in knn(
        embeddings, qv, k=10, metric="euclidean",
        vector_col="embedding", id_col="vec_id").collect()]
    quant = [r["vec_id"] for r in sq.search(
        enc, qv, k=10, rescore_factor=4, metric="euclidean", id_col="vec_id").collect()]
    # rescored quantized search should recover nearly all of the exact top-k
    overlap = len(set(exact) & set(quant)) / 10
    assert overlap >= 0.9
    assert quant[0] == exact[0] == 0  # self match survives quantization
