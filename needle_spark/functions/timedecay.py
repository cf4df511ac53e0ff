"""Time-decay scoring (reference: /root/reference/src/collection/
pipeline.rs:180-228, apply_time_decay :616-656).

Semantics: decay_factor(age) in [0,1]; the result DISTANCE is divided by
the factor (older -> larger -> worse); factor 0 pushes the row to the
bottom (reference uses f32::MAX); results re-sorted and truncated to k.

- exponential: exp(-ln(2)/half_life * age); half_life=0 -> 1 at age 0 else 0
- linear:      1 - age/max_age for age < max_age else 0
- step:        1 if age <= window else 0
- gaussian:    exp(-(age/sigma)^2 / 2)  (WITH-clause grammar extension,
               query_lang/ast.rs:63-70)

`now` is always an injected parameter — never wall clock — so results
are deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECAYED_MAX = 1.7976931348623157e308  # f64 stand-in for the reference's f32::MAX


def age_expr(now: int, inserted_at: Column | str) -> Column:
    """Saturating age in seconds (reference: now.saturating_sub(ts))."""
    c = F.col(inserted_at) if isinstance(inserted_at, str) else inserted_at
    return F.greatest(F.lit(0).cast("long"), F.lit(int(now)) - c.cast("long"))


def decay_factor_expr(kind: str, age: Column, **params) -> Column:
    k = kind.lower()
    if k == "exponential":
        hl = int(params["half_life_seconds"])
        if hl == 0:
            return F.when(age == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        lam = F.log(F.lit(2.0)) / F.lit(float(hl))
        return F.exp(-lam * age.cast("double"))
    if k == "linear":
        ma = int(params["max_age_seconds"])
        if ma == 0:
            return F.lit(0.0)
        return F.when(
            age >= ma, F.lit(0.0)
        ).otherwise(F.lit(1.0) - age.cast("double") / F.lit(float(ma)))
    if k == "step":
        w = int(params["window_seconds"])
        return F.when(age <= w, F.lit(1.0)).otherwise(F.lit(0.0))
    if k == "gaussian":
        sigma = float(params["sigma_seconds"])
        x = age.cast("double") / F.lit(sigma)
        return F.exp(-(x * x) / F.lit(2.0))
    raise ValueError(f"unknown decay kind: {kind!r}")


def duckdb_decay_sql(kind: str, age: str, **params) -> str:
    """DuckDB twin of decay_factor_expr (same op order)."""
    k = kind.lower()
    if k == "exponential":
        hl = int(params["half_life_seconds"])
        if hl == 0:
            return f"CASE WHEN {age} = 0 THEN 1.0 ELSE 0.0 END"
        return f"exp(-(ln(2.0) / {float(hl)!r}) * CAST({age} AS DOUBLE))"
    if k == "linear":
        ma = int(params["max_age_seconds"])
        if ma == 0:
            return "0.0"
        return (
            f"CASE WHEN {age} >= {ma} THEN 0.0 "
            f"ELSE 1.0 - CAST({age} AS DOUBLE) / {float(ma)!r} END"
        )
    if k == "step":
        w = int(params["window_seconds"])
        return f"CASE WHEN {age} <= {w} THEN 1.0 ELSE 0.0 END"
    if k == "gaussian":
        sigma = float(params["sigma_seconds"])
        x = f"(CAST({age} AS DOUBLE) / {sigma!r})"
        return f"exp(-({x} * {x}) / 2.0)"
    raise ValueError(f"unknown decay kind: {kind!r}")


def apply_time_decay(
    results: DataFrame,
    kind: str,
    now: int,
    k: int,
    inserted_at_col: str = "inserted_at",
    distance_col: str = "distance",
    id_col: str = "id",
    **params,
) -> DataFrame:
    """Rescale distances by 1/decay, re-sort, truncate to k
    (pipeline.rs:616-656)."""
    age = age_expr(now, inserted_at_col)
    factor = decay_factor_expr(kind, age, **params)
    decayed = F.when(factor > 0.0, F.col(distance_col) / factor).otherwise(
        F.lit(DECAYED_MAX)
    )
    return (
        results.withColumn(distance_col, decayed)
        .orderBy(F.col(distance_col).asc(), F.col(id_col).asc())
        .limit(k)
    )
