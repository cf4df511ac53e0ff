"""QuerySession — query_lang/session.rs parity: persistent params,
history, default-collection injection, dot-commands, aggregate-function
parsing."""

import pytest
from pyspark.sql import functions as F

from needle_spark.ql import QueryExecutor
from needle_spark.ql.session import (
    HELP_TEXT,
    QuerySession,
    SessionError,
    parse_aggregate,
)


@pytest.fixture(scope="module")
def sess(spark, embeddings):
    emb = embeddings.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"), "label")
    ex = QueryExecutor(spark, tables={"embeddings": emb})
    return QuerySession(ex)


def test_parse_aggregate_spellings():
    # session.rs:243-301
    assert parse_aggregate("COUNT(*)") == ("COUNT", None)
    assert parse_aggregate("COUNT") == ("COUNT", None)
    assert parse_aggregate("COUNT_DISTINCT(category)") == (
        "COUNT_DISTINCT", "category")
    assert parse_aggregate("AVG(price)") == ("AVG", "price")
    assert parse_aggregate("min(score)") == ("MIN", "score")
    assert parse_aggregate("SUM(qty)") == ("SUM", "qty")
    with pytest.raises(SessionError):
        parse_aggregate("MEDIAN(x)")
    with pytest.raises(SessionError):
        parse_aggregate("AVG()")


def test_params_persist_and_merge(spark, sess, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    sess.set_param("q", qv)
    assert sess.get_param("q") == qv
    rows = sess.execute(
        "SELECT id, distance FROM embeddings WHERE vector SIMILAR TO $q "
        "LIMIT 5").collect()
    assert len(rows) == 5 and rows[0]["id"] == 0
    # call-site params shadow session params
    qv2 = [float(x) for x in
           embeddings.filter("vec_id = 1").first()["embedding"]]
    rows2 = sess.execute(
        "SELECT id, distance FROM embeddings WHERE vector SIMILAR TO $q "
        "LIMIT 1", {"q": qv2}).collect()
    assert rows2[0]["id"] == 1
    sess.clear_params()
    assert sess.get_param("q") is None


def test_default_collection_injection(spark, sess):
    # session.rs:182-196: missing FROM pulls the session default in
    sess.command(".use embeddings")
    assert sess.prepare("SELECT id, label") == \
        "SELECT id, label FROM embeddings LIMIT 10"
    assert sess.prepare("WHERE label = 1 LIMIT 3") == \
        "SELECT * FROM embeddings WHERE label = 1 LIMIT 3"
    rows = sess.execute("SELECT id, label").collect()
    assert len(rows) == 10  # default_limit applied


def test_empty_and_unknown_command_rejected(sess):
    with pytest.raises(SessionError):
        sess.prepare("   ")
    with pytest.raises(SessionError):
        sess.execute(".frobnicate")


def test_history_records_raw_input(spark, embeddings):
    emb = embeddings.select(F.col("vec_id").alias("id"), "label")
    s = QuerySession(QueryExecutor(spark, tables={"e": emb}),
                     max_history=2)
    s.execute("SELECT id FROM e LIMIT 1")
    s.execute("SELECT id FROM e LIMIT 2")
    s.execute("SELECT id FROM e LIMIT 3")
    assert s.history() == ["SELECT id FROM e LIMIT 2",
                           "SELECT id FROM e LIMIT 3"]  # bounded


def test_dot_commands(sess):
    sess.command(".set k 5")
    assert sess.get_param("k") == 5
    sess.command(".set name 'alice'")
    assert sess.get_param("name") == "alice"
    sess.command(".set ratio 0.5")
    assert sess.get_param("ratio") == 0.5
    sess.command(".set on true")
    assert sess.get_param("on") is True
    assert sess.command(".params")["k"] == 5
    assert ".help" in sess.command(".help")
    assert sess.command(".history") == sess.history()
    sess.command(".clear")
    assert sess.command(".params") == {}


def test_help_text_lists_commands():
    for cmd in (".use", ".params", ".set", ".history", ".clear", ".help",
                ".quit", "SIMILAR TO", "TIME_DECAY"):
        assert cmd in HELP_TEXT
