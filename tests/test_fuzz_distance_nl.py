"""Fuzz parity for the remaining two reference fuzz targets (round 6):
fuzz/fuzz_targets/fuzz_distance.rs (finite inputs -> finite distance,
no panic, any metric) and fuzz_nl_filter.rs (the NL filter parser never
panics on any input).

The distance fuzz is STRONGER than the reference's: besides finiteness
it asserts value agreement with an independent numpy oracle, and it
runs the whole corpus as ONE Spark job (the reference fuzzes a scalar
function; ours is a JVM expression, so per-example jobs would be all
overhead)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from needle_spark.functions.distance import distance_expr
from needle_spark.operators.nl_filter import NLFilterParser

METRICS = ["cosine", "euclidean", "dot", "manhattan", "chebyshev",
           "cosine_normalized", "hamming"]


def _numpy_distance(metric: str, a: np.ndarray, b: np.ndarray) -> float:
    if metric == "cosine":
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 1.0  # engine convention: zero vector -> sim 0
        return float(1.0 - (a @ b) / (na * nb))
    if metric == "cosine_normalized":
        return float(1.0 - a @ b)
    if metric == "euclidean":
        return float(np.linalg.norm(a - b))
    if metric == "dot":
        return float(-(a @ b))
    if metric == "manhattan":
        return float(np.abs(a - b).sum())
    if metric == "chebyshev":
        return float(np.abs(a - b).max())
    if metric == "hamming":
        return float(((a != 0) != (b != 0)).sum())
    raise AssertionError(metric)


def _fuzz_rows():
    """Deterministic fuzz corpus: random magnitudes spanning 1e-6 to
    1e6, sign-mixed, plus the classic edge rows (zeros, one-hot,
    equal, negated, dim-1)."""
    rng = np.random.default_rng(99)
    rows = []
    for i in range(60):
        dim = int(rng.choice([1, 2, 3, 8, 64, 512]))
        scale = 10.0 ** rng.uniform(-6, 6)
        a = (rng.standard_normal(dim) * scale).astype(np.float64)
        b = (rng.standard_normal(dim) * scale).astype(np.float64)
        if i % 7 == 0:
            b = a.copy()           # identical -> distance 0 family
        if i % 11 == 0:
            b = -a                 # antipodal
        if i % 13 == 0:
            a = np.zeros(dim)      # zero vector conventions
        rows.append((i, a.tolist(), b.tolist()))
    rows.append((len(rows), [0.0], [0.0]))
    rows.append((len(rows) + 1, [1.0, 0.0], [0.0, 1.0]))
    return rows


def test_distance_fuzz_finite_and_matches_numpy(spark):
    rows = _fuzz_rows()
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>")
    exprs = [distance_expr(m, F.col("a"), F.col("b")).alias(m)
             for m in METRICS]
    got = {r["i"]: r for r in df.select("i", *exprs).collect()}
    for i, a, b in rows:
        av, bv = np.asarray(a), np.asarray(b)
        for m in METRICS:
            v = got[i][m]
            assert v is not None and math.isfinite(v), \
                f"{m} not finite on row {i}"
            want = _numpy_distance(m, av, bv)
            tol = 1e-6 * max(1.0, abs(want))
            assert abs(v - want) <= tol, (m, i, v, want)


NL_VOCAB = ["show", "me", "find", "recent", "documents", "about",
            "spark", "where", "lang", "is", "from", "last", "week",
            "7", "days", "not", "and", "or", "similar", "to", ">", "<",
            "=", "''", '"x"', "NULL", "$query", "(", ")", ","]


@settings(derandomize=True, max_examples=300, deadline=None)
@given(text=st.one_of(
    st.text(max_size=60),
    st.lists(st.sampled_from(NL_VOCAB), max_size=12).map(" ".join)))
def test_nl_filter_never_crashes(text):
    """fuzz_nl_filter.rs parity: the NL parser consumes ANY input and
    returns a ParsedQuery (it is heuristic — it must not raise)."""
    out = NLFilterParser().parse(text)
    assert out is not None


def test_nl_filter_still_parses_real_queries():
    """Anti-triviality guard for the fuzz contract."""
    p = NLFilterParser()
    out = p.parse("show me recent documents about spark from last week")
    assert out is not None and (out.filter or out.search_text)
