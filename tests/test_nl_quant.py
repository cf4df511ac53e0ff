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


def test_nl_boolean_and_list_extractors():
    """ValueExtractor::Boolean (negation-aware) and ::List
    (nl_filter.rs:369-395)."""
    p = NLFilterParser()
    q = p.parse("published articles about rust", now=NOW)
    assert q.filter == {"is_published": True}
    q = p.parse("not published drafts about rust", now=NOW)
    assert q.filter == {"is_published": False}
    q = p.parse("unverified reports", now=NOW)
    assert q.filter == {"is_verified": False}
    q = p.parse("photos tagged as sunset, beach and ocean", now=NOW)
    assert q.filter == {"tags": {"$all": ["sunset", "beach", "ocean"]}}


def test_nl_exclusions(spark):
    from needle_spark.filters import compile_filter

    p = NLFilterParser()
    q = p.parse("photos not tagged as private", now=NOW)
    assert q.filter == {"tags": {"$not": {"$contains": "private"}}}
    assert "exclude" in q.intents
    df = spark.createDataFrame(
        [("a", ["public"]), ("b", ["private", "x"])],
        "id string, tags array<string>")
    kept = [r["id"] for r in df.filter(compile_filter(q.filter, df=df)).collect()]
    assert kept == ["a"]
    q = p.parse("products excluding category toys", now=NOW)
    assert q.filter == {"category": {"$ne": "toys"}}


def test_nl_temporal_aliases():
    p = NLFilterParser()
    assert p.parse("alerts from the past hour", now=NOW).temporal["start"] == NOW - 3600
    assert p.parse("logs in the last 24 hours", now=NOW).temporal["start"] == NOW - 86400
    y = p.parse("orders from yesterday", now=NOW).temporal
    assert (y["start"], y["end"]) == (NOW - 2 * 86400, NOW - 86400)


def test_nl_intent_classification():
    from needle_spark.operators.nl_filter import classify_intent

    c = classify_intent("how many documents are in category science")
    assert c.primary_intent == "aggregate"
    assert "filter" in c.secondary_intents
    assert c.confidence_scores["aggregate"] == 1.0  # normalized max
    c = classify_intent("compare cats versus dogs")
    assert c.primary_intent == "compare"
    assert classify_intent("zebra").primary_intent == "search"  # default


def test_nl_conversational_context():
    """Pronoun resolution, continuation, sticky filters
    (nl_filter.rs:769-965)."""
    from needle_spark.operators.nl_filter import ConversationalQueryParser

    p = ConversationalQueryParser()
    first = p.parse_with_context("find articles about quantum computing", now=NOW)
    assert "quantum computing" in first.search_text
    # "more about it" resolves the pronoun to the last search text
    second = p.parse_with_context("show me more about it", now=NOW)
    assert "quantum computing" in second.search_text
    # sticky context filter ANDs into subsequent queries
    p.context.add_filter({"lang": "en"})
    third = p.parse_with_context("find papers about entanglement", now=NOW)
    assert third.filter == {"lang": "en"}
    p.context.store_entity("user", "alice")
    assert p.context.get_entity("user") == "alice"
    assert p.context.has_context()
    # intent classification orders primary first
    agg = p.parse_with_context("count papers by topic", now=NOW)
    assert agg.intents[0] == "aggregate"


def test_nl_query_builder():
    from needle_spark.operators.nl_filter import QueryBuilder

    q = (QueryBuilder("machine learning")
         .with_category("science").with_author("alice")
         .with_score_above(0.8).from_last_days(7, now=NOW).build())
    conds = q.filter["$and"]
    assert {"category": "science"} in conds
    assert {"author": "alice"} in conds
    assert {"score": {"$gt": 0.8}} in conds
    assert {"inserted_at": {"$gte": NOW - 7 * 86400}} in conds
    assert q.temporal["start"] == NOW - 7 * 86400


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


def test_binary_encode_null_vector_zero_words(spark):
    """Review r9: the Arrow packbits encode must pack NULL vectors to
    all-zero words — the semantics of the column expression it
    replaced (null > 0.0 -> null -> otherwise(0)) — instead of
    crashing the whole encode stage on one null row."""
    from needle_spark.plans.quantization import BinaryQuantizer

    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0]), (2, None), (3, [-1.0, -1.0, 1.0])],
        "id long, vector array<float>")
    enc = {r["id"]: r["bits"]
           for r in BinaryQuantizer().encode(df).collect()}
    assert enc[2] == [0]
    assert enc[1] == [0b101] and enc[3] == [0b100]


def test_binary_encode_ragged_and_nan(spark):
    """ADVICE r9: np.stack crashed the encode stage on vectors shorter
    than the probed dim — the replaced element_at expression padded
    missing tail bits with null->0 — and NaN components packed to 0
    where Spark's NaN-greater total ordering (NaN > 0.0 == true)
    packed 1.  The kernel must zero-pad short rows, truncate long
    ones, and keep Spark's NaN semantics."""
    import math

    from needle_spark.plans.quantization import BinaryQuantizer

    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0]),          # probe row fixes dim=3
         (2, [1.0]),                      # short: tail pads to 0
         (3, [-1.0, 1.0, -1.0, 1.0]),     # long: truncates to dim
         (4, [math.nan, -1.0, math.nan])],  # NaN packs 1 (Spark order)
        "id long, vector array<double>")
    enc = {r["id"]: r["bits"]
           for r in BinaryQuantizer().encode(df).collect()}
    assert enc[1] == [0b101]
    assert enc[2] == [0b001]
    assert enc[3] == [0b010]
    assert enc[4] == [0b101]
