"""Tokenizer + Porter stemmer semantics (reference: hybrid.rs:239-268)."""

import duckdb
from pyspark.sql import functions as F

from needle_spark.functions.text import (
    duckdb_tokenize_sql,
    porter_stem,
    tokenize_expr,
    tokenize_py,
)


def test_tokenize_pipeline(spark):
    df = spark.createDataFrame(
        [("The quick-brown FOX, and a dog! x 42nd",)], "t string"
    )
    toks = df.select(tokenize_expr("t").alias("toks")).first()["toks"]
    # lowercased, split on non-alnum, len>=2, stop words removed
    # ("the"/"and"/"a" dropped, "x" too short)
    assert toks == ["quick", "brown", "fox", "dog", "42nd"]


def test_tokenize_py_matches_expr(spark):
    texts = ["Hello, World! It is GREAT.", "", "a b c dd", "The THE the"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["toks"] for r in df.select(tokenize_expr("t").alias("toks")).collect()]
    assert got == [tokenize_py(t) for t in texts]


def test_tokenize_duckdb_twin_matches(spark, documents):
    spark_toks = [
        (r["doc_id"], list(r["toks"]))
        for r in documents.select("doc_id", tokenize_expr("text").alias("toks"))
        .orderBy("doc_id").limit(30).collect()
    ]
    sql = duckdb_tokenize_sql("text")
    duck = duckdb.connect().execute(
        f"SELECT doc_id, {sql} FROM '/root/testdata/sf0.001/documents.parquet' "
        "ORDER BY doc_id LIMIT 30"
    ).fetchall()
    assert spark_toks == [(i, list(t)) for i, t in duck]


def test_porter_known_pairs():
    # canonical examples from the published algorithm description
    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "falling": "fall",
        "hissing": "hiss", "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc", "digitizer": "digit",
        "operator": "oper", "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electrical": "electr", "hopefulness": "hope",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "adjustable": "adjust", "effective": "effect",
        "probate": "probat", "controlling": "control", "rolling": "roll",
    }
    for w, want in pairs.items():
        assert porter_stem(w) == want, f"{w}: got {porter_stem(w)!r}, want {want!r}"
