"""Time decay (pipeline.rs:180-228), MaxSim (multivec.rs:243), sparse
dot search (sparse.rs) — semantics vs python oracles."""

import math

import pytest
from pyspark.sql import functions as F

from needle_spark.functions.timedecay import apply_time_decay, decay_factor_expr, age_expr
from needle_spark.operators.multivec import maxsim_topk
from needle_spark.operators.sparse import sparse_topk


def test_decay_factors(spark):
    df = spark.createDataFrame([(a,) for a in [0, 50, 100, 150, 200]], "age long")
    rows = df.select(
        "age",
        decay_factor_expr("exponential", F.col("age"), half_life_seconds=100).alias("e"),
        decay_factor_expr("linear", F.col("age"), max_age_seconds=100).alias("l"),
        decay_factor_expr("step", F.col("age"), window_seconds=100).alias("s"),
        decay_factor_expr("gaussian", F.col("age"), sigma_seconds=100).alias("g"),
    ).collect()
    for r in rows:
        a = r["age"]
        assert abs(r["e"] - math.exp(-math.log(2) / 100 * a)) < 1e-12
        assert r["l"] == (0.0 if a >= 100 else 1.0 - a / 100)
        assert r["s"] == (1.0 if a <= 100 else 0.0)
        assert abs(r["g"] - math.exp(-((a / 100) ** 2) / 2)) < 1e-12
    # half-life at exactly age==half_life is 0.5
    half = df.filter("age = 100").select(
        decay_factor_expr("exponential", F.col("age"), half_life_seconds=100).alias("e")
    ).first()["e"]
    assert abs(half - 0.5) < 1e-12


def test_zero_halflife_edge(spark):
    df = spark.createDataFrame([(0,), (5,)], "age long")
    got = {r["age"]: r["e"] for r in df.select(
        "age", decay_factor_expr("exponential", F.col("age"), half_life_seconds=0).alias("e")
    ).collect()}
    assert got == {0: 1.0, 5: 0.0}


def test_apply_time_decay_reorders(spark):
    # close-but-older doc loses to slightly-farther-but-newer doc
    df = spark.createDataFrame(
        [("old", 0.10, 0), ("new", 0.12, 900), ("dead", 0.01, 0)],
        "id string, distance double, inserted_at long",
    )
    out = apply_time_decay(
        df.filter("id != 'dead'"), "exponential", now=1000, k=2,
        half_life_seconds=100, **{},
    ).collect()
    # old: age 1000 -> factor 2^-10 -> dist 102.4 ; new: age 100 -> 0.5 -> 0.24
    assert [r["id"] for r in out] == ["new", "old"]
    assert abs(out[0]["distance"] - 0.24) < 1e-9


def test_zero_decay_goes_last(spark):
    df = spark.createDataFrame(
        [("in", 0.5, 950), ("out", 0.1, 100)],
        "id string, distance double, inserted_at long",
    )
    out = apply_time_decay(df, "step", now=1000, k=2, window_seconds=100).collect()
    assert [r["id"] for r in out] == ["in", "out"]
    assert out[1]["distance"] > 1e300  # pushed to the bottom, not dropped


def test_maxsim(spark):
    # 2 docs x token vectors, 2 query tokens; python oracle
    doc_tokens = [
        ("d1", [1.0, 0.0]), ("d1", [0.0, 1.0]),
        ("d2", [0.5, 0.5]), ("d2", [1.0, 1.0]), ("d2", [-1.0, 0.0]),
    ]
    q = [[1.0, 0.0], [0.0, 2.0]]
    df = spark.createDataFrame(doc_tokens, "doc_id string, vector array<float>")
    got = {r["doc_id"]: r["score"] for r in maxsim_topk(df, q, k=10).collect()}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    want = {}
    for d in ("d1", "d2"):
        toks = [v for i, v in doc_tokens if i == d]
        want[d] = sum(max(dot(t, qv) for t in toks) for qv in q)
    assert got == pytest.approx(want, abs=1e-9)  # d1: 1+2=3, d2: 1+2=3
    assert want == {"d1": 3.0, "d2": 3.0}


def test_sparse_topk(spark):
    docs = [
        ("a", [1, 5, 9], [1.0, 2.0, 3.0]),
        ("b", [5, 9], [4.0, 1.0]),
        ("c", [2, 3], [9.0, 9.0]),
    ]
    df = spark.createDataFrame(docs, "id string, indices array<int>, values array<float>")
    rows = sparse_topk(df, [5, 9, 7], [1.0, 1.0, 100.0], k=5).collect()
    got = {r["id"]: r["score"] for r in rows}
    assert got == {"a": 5.0, "b": 5.0}  # c shares no index -> absent
    assert [r["id"] for r in rows] == ["a", "b"]  # tie -> id asc
