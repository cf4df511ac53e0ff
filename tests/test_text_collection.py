"""Auto-embedding text collections (text_collection.rs): insert raw
text -> chunk -> embed transparently -> kNN end-to-end with the
deterministic hash provider."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.operators.federated import hash_embedding
from needle_spark.operators.text_collection import TextCollection, chunk_expr


@pytest.fixture()
def db(spark, tmp_path):
    return Database(spark, str(tmp_path / "db"))


def chunks_of(spark, text, **kw):
    return spark.range(1).select(
        chunk_expr(F.lit(text), **kw).alias("c")).first()["c"]


def test_chunk_strategies(spark):
    assert chunks_of(spark, "a b c") == ["a b c"]
    assert chunks_of(spark, "One. Two. Three.", strategy="sentence") == \
        ["One", "Two", "Three."]
    assert chunks_of(spark, "p1\n\np2\n\n  ", strategy="paragraph") == ["p1", "p2"]
    fixed = chunks_of(spark, "abcdefghij", strategy="fixed", chars=4, overlap=2)
    assert fixed == ["abcd", "cdef", "efgh", "ghij", "ij"]
    # empty-chunk fallback: whole text survives
    assert chunks_of(spark, "   ", strategy="sentence") == ["   "]


def test_insert_and_search_end_to_end(spark, db):
    tc = TextCollection.create(db, "docs", hash_embedding(dim=8))
    tc.insert_text("d1", "rust is a systems programming language", now_ms=1)
    tc.insert_text("d2", "python is great for data science", now_ms=2)
    batch = spark.createDataFrame(
        [("d3", "spark runs distributed dataframes"),
         ("d4", "needle searches vectors quickly")],
        "id string, text string")
    assert tc.insert_text_df(batch, now_ms=3) == 2

    # vector column was populated transparently — kNN works end to end
    hits = tc.search_text("systems programming language", k=2).collect()
    assert hits[0]["id"] == "d1"
    assert hits[0]["text"].startswith("rust")
    # and the stored vector matches the provider exactly
    row = tc.collection.df().filter(F.col("id") == "d1").first()
    want = hash_embedding(dim=8)("rust is a systems programming language")
    assert [round(float(x), 6) for x in row["vector"]] == \
        [round(float(x), 6) for x in want]


def test_chunked_insert_lineage_and_ask(spark, db):
    tc = TextCollection.create(
        db, "chunked", hash_embedding(dim=8), chunking="sentence")
    tc.insert_text("doc", "Cats purr. Dogs bark. Fish swim.", now_ms=1)
    rows = {r["id"]: r for r in tc.collection.df().collect()}
    assert set(rows) == {"doc__chunk_0", "doc__chunk_1", "doc__chunk_2"}
    assert rows["doc__chunk_1"]["source_doc"] == "doc"
    assert rows["doc__chunk_1"]["chunk_index"] == 1
    assert rows["doc__chunk_1"]["text"] == "Dogs bark"

    tc.insert_text("doc2", "Birds fly south in winter.", now_ms=2)
    # single chunk -> plain id (reference insert_text :251)
    assert tc.collection.contains("doc2")

    # ask(): best passage per source document, ranked
    best = tc.ask("Dogs bark", k=2).collect()
    assert best[0]["source_doc"] == "doc"
    assert best[0]["id"] == "doc__chunk_1"
    assert len({r["source_doc"] for r in best}) == len(best)  # one per doc


def test_filtered_search(spark, db):
    tc = TextCollection.create(db, "filt", hash_embedding(dim=8))
    tc.insert_text_df(spark.createDataFrame(
        [("a", "alpha document"), ("b", "beta document")],
        "id string, text string"), now_ms=1)
    got = tc.search_text("alpha document", k=5,
                         flt={"source_doc": {"$in": ["b"]}}).collect()
    assert [r["id"] for r in got] == ["b"]
