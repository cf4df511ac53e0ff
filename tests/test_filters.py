"""Filter-JSON -> Column compiler semantics (reference:
src/metadata.rs:644-681 operators, :984 parser; tests mirror the shapes in
the reference's metadata tests)."""

import pytest

from needle_spark.filters import FilterError, compile_filter

ROWS = [
    # id, category, price, year, tags, status, title
    ("d1", "books", 10.0, 2020, ["red", "new"], "active", "Intro to Spark"),
    ("d2", "books", 20.0, 2021, ["blue"], None, "Advanced Spark"),
    ("d3", "electronics", 100.0, 2022, ["red", "sale", "new"], "active", "Camera X100"),
    ("d4", "electronics", 200.0, 2023, [], "archived", "Laptop Pro"),
    ("d5", "clothing", 30.0, 2020, ["sale"], "active", "T-shirt"),
]
SCHEMA = (
    "id string, category string, price double, year bigint, "
    "tags array<string>, status string, title string"
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def ids(df, flt):
    return sorted(r["id"] for r in df.filter(compile_filter(flt, df=df)).collect())


def test_implicit_eq(df):
    assert ids(df, {"category": "books"}) == ["d1", "d2"]


def test_multi_field_implicit_and(df):
    assert ids(df, {"category": "books", "price": {"$gte": 15}}) == ["d2"]


def test_comparisons(df):
    assert ids(df, {"price": {"$gt": 20, "$lte": 100}}) == ["d3", "d5"]
    assert ids(df, {"year": {"$ne": 2020}}) == ["d2", "d3", "d4"]


def test_in_nin(df):
    assert ids(df, {"category": {"$in": ["books", "clothing"]}}) == ["d1", "d2", "d5"]
    assert ids(df, {"category": {"$nin": ["books", "clothing"]}}) == ["d3", "d4"]


def test_between(df):
    assert ids(df, {"price": {"$between": [20, 100]}}) == ["d2", "d3", "d5"]


def test_and_or_not_nesting(df):
    flt = {
        "$and": [
            {"price": {"$lt": 150}},
            {"$or": [{"category": "books"}, {"status": {"$exists": False}}]},
        ]
    }
    assert ids(df, flt) == ["d1", "d2"]
    assert ids(df, {"$not": {"category": "books"}}) == ["d3", "d4", "d5"]


def test_string_ops(df):
    assert ids(df, {"title": {"$contains": "Spark"}}) == ["d1", "d2"]
    assert ids(df, {"title": {"$startsWith": "Advanced"}}) == ["d2"]
    assert ids(df, {"title": {"$endsWith": "Pro"}}) == ["d4"]
    assert ids(df, {"title": {"$regex": "^[A-Z][a-z]+ [A-Z]"}}) == ["d2", "d3", "d4"]


def test_exists(df):
    assert ids(df, {"status": {"$exists": True}}) == ["d1", "d3", "d4", "d5"]
    assert ids(df, {"status": {"$exists": False}}) == ["d2"]


def test_array_ops(df):
    assert ids(df, {"tags": {"$contains": "red"}}) == ["d1", "d3"]
    assert ids(df, {"tags": {"$all": ["red", "new"]}}) == ["d1", "d3"]
    assert ids(df, {"tags": {"$size": 1}}) == ["d2", "d5"]
    assert ids(df, {"tags": {"$elemMatch": {"$startsWith": "sa"}}}) == ["d3", "d5"]


def test_size_on_string(df):
    assert ids(df, {"category": {"$size": 5}}) == ["d1", "d2"]  # len("books") == 5


def test_type(df):
    assert ids(df, {"price": {"$type": "number"}}) == ["d1", "d2", "d3", "d4", "d5"]
    assert ids(df, {"price": {"$type": "string"}}) == []
    assert ids(df, {"status": {"$type": "null"}}) == ["d2"]


def test_unknown_field_never_matches(df):
    assert ids(df, {"nope": 1}) == []


def test_errors(df):
    with pytest.raises(FilterError):
        compile_filter({}, df=df)
    with pytest.raises(FilterError):
        compile_filter({"$bogus": 1}, df=df)
    with pytest.raises(FilterError):
        compile_filter({"price": {"$frob": 1}}, df=df)
    with pytest.raises(FilterError):
        compile_filter({"$and": {"a": 1}}, df=df)


def test_meta_map_fallback(spark):
    df = spark.createDataFrame(
        [("m1", {"color": "red", "n": "5"}), ("m2", {"color": "blue", "n": "12"})],
        "id string, meta map<string,string>",
    )
    got = lambda f: sorted(
        r["id"] for r in df.filter(compile_filter(f, df=df, meta_col="meta")).collect()
    )
    assert got({"color": "red"}) == ["m1"]
    # numeric literal vs string map value -> dynamic numeric compare
    assert got({"n": {"$gt": 6}}) == ["m2"]
    assert got({"missing": {"$exists": False}}) == ["m1", "m2"]
