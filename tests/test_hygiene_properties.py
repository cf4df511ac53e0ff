"""Property-based cross-engine parity for the hygiene operators: for
arbitrary generated documents, the Spark expressions and their DuckDB
SQL twins must agree cell-for-cell.  This is the same contract the
driver's oracle gate checks at sf0.01, pushed into adversarial inputs
(empty docs, whitespace runs, newline soup, repeated lines, unicode).

Alphabet note: uppercase unicode and \\x0b/\\x0c are excluded — Java
regex and RE2 disagree on \\s membership for vertical tab / form feed,
and case folding of dotted-I locales differs by engine.  The operators
document ASCII-token semantics ([a-z0-9]+), so the contract is parity
over the documented input class.
"""

import string

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from needle_spark.operators import llm_hygiene as H

_ALPHABET = sorted(
    set(string.ascii_letters + string.digits + string.punctuation + " \t\n")
    | {"é", "ß", "主", "•"}
)

texts_strategy = st.lists(
    st.text(alphabet=st.sampled_from(_ALPHABET), max_size=200),
    min_size=1, max_size=8,
)


def _frames(spark, texts):
    sdf = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    return sdf, con


def _round(v):
    return round(v, 9) if isinstance(v, float) else v


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=12, deadline=None)
@given(texts=texts_strategy)
def test_gopher_quality_parity(sp, texts):
    sdf, con = _frames(sp, texts)
    s = {r["doc_id"]: tuple(_round(x) for x in tuple(r)[1:])
         for r in H.gopher_quality(sdf).collect()}
    d = {r[0]: tuple(_round(x) for x in r[1:])
         for r in con.execute(H.gopher_quality_sql()).fetchall()}
    assert s == d


@settings(max_examples=12, deadline=None)
@given(texts=texts_strategy, n=st.integers(min_value=1, max_value=4))
def test_word_ngrams_parity(sp, texts, n):
    sdf, con = _frames(sp, texts)
    s = {r["doc_id"]: r["g"] for r in sdf.select(
        "doc_id", H.word_ngrams_expr("text", n).alias("g")).collect()}
    d = {r[0]: r[1] for r in con.execute(
        f"SELECT doc_id, {H.duckdb_word_ngrams_sql('text', n)} FROM documents"
    ).fetchall()}
    assert s == d


@settings(max_examples=12, deadline=None)
@given(texts=texts_strategy)
def test_pii_redaction_parity(sp, texts):
    # salt some genuine PII into the generated soup
    texts = list(texts) + [
        texts[0] + " a@b.io 555-123-4567",
        "123-45-6789 " + texts[-1] + " 1.2.3.4",
    ]
    sdf, con = _frames(sp, texts)
    s = {r["doc_id"]: tuple(r)[1:] for r in H.redact_pii(sdf).collect()}
    d = {r[0]: tuple(r[1:]) for r in con.execute(H.redact_pii_sql()).fetchall()}
    assert s == d


@settings(max_examples=12, deadline=None)
@given(texts=texts_strategy)
def test_dedup_lines_parity(sp, texts):
    sdf, con = _frames(sp, texts)
    s = {r["doc_id"]: r["x"] for r in sdf.select(
        "doc_id", H.dedup_lines_expr("text").alias("x")).collect()}
    d = {r[0]: r[1] for r in con.execute(
        "SELECT doc_id, " + H.duckdb_dedup_lines_sql("text")
        + " FROM documents").fetchall()}
    assert s == d


@settings(max_examples=12, deadline=None)
@given(keys=st.lists(st.text(alphabet=st.sampled_from(_ALPHABET), max_size=40),
                     min_size=1, max_size=6))
def test_md5_sampler_frac_parity(sp, keys):
    from pyspark.sql import functions as F

    sdf = sp.createDataFrame([(k,) for k in keys], "k string")
    s = [r["f"] for r in sdf.select(
        H._md5_u32_frac(F.col("k")).alias("f")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    d = [r[0] for r in con.execute(
        "SELECT CAST(('0x' || substr(md5(k), 1, 8))::UBIGINT AS DOUBLE)"
        " / 4294967296.0 FROM t").fetchall()]
    assert s == pytest.approx(d, abs=0)
