"""SQL-analytics over collection metadata.

Mirrors the reference's aggregation engine (/root/reference/src/search/
sql_analytics.rs): COUNT(*) / COUNT(field) / SUM / AVG / MIN / MAX with
multi-key GROUP BY, HAVING over aggregate aliases, and the fixed
WHERE -> GROUP BY -> HAVING -> ORDER BY -> LIMIT execution order
(sql_analytics.rs:231-310).

Everything delegates to `groupBy().agg()` — Spark's hash aggregate with
map-side partial aggregation is the scalable version of the reference's
single-threaded list-scan grouping, and null-skipping SUM/AVG/MIN/MAX
semantics match (sql_analytics.rs:376-408).

`sum_fixed` / `avg_fixed` exist for oracle-grade determinism: a float64
SUM is order-dependent across partitionings, so queries that must
hash-match an external engine aggregate in exact integer cents instead.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from needle_spark.filters import compile_filter

AGG_FUNCS = ("count", "sum", "avg", "min", "max")


def sum_fixed(col: Column | str, scale: int = 2) -> Column:
    """Order-independent, bit-exact SUM of a double column.

    Rounds each value to `scale` decimals, sums as integers, divides back.
    The integer sum is exact, so the result is identical regardless of
    partition count or merge order — and reproducible in any engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = 10 ** scale
    return F.sum(F.round(c * factor).cast("long")).cast("double") / float(factor)


def avg_fixed(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return sum_fixed(c, scale) / F.count(c).cast("double")


def _agg_col(func: str, field: str | None, alias: str | None) -> Column:
    f = func.lower()
    if f == "count":
        c = F.count(F.lit(1)) if field in (None, "*") else F.count(F.col(field))
    elif f in ("sum", "avg", "min", "max"):
        if field in (None, "*"):
            raise ValueError(f"{func} requires a field")
        c = getattr(F, f)(F.col(field))
    else:
        raise ValueError(f"unknown aggregate function: {func}")
    if alias is None:
        alias = f"{f}_{field}" if field not in (None, "*") else f
    return c.alias(alias)


class AnalyticsQuery:
    """Builder mirroring sql_analytics::AnalyticsQuery.

    >>> (AnalyticsQuery(df)
    ...    .where({"price": {"$gt": 10}})
    ...    .group_by("category")
    ...    .agg(("count", "*", "cnt"), ("avg", "price", "avg_price"))
    ...    .having(F.col("cnt") >= 3)
    ...    .order_by(("avg_price", "desc"))
    ...    .limit(5)
    ...    .to_df())
    """

    def __init__(self, df: DataFrame, meta_col: str | None = None):
        self._df = df
        self._meta_col = meta_col
        self._where: Column | None = None
        self._group: list[str] = []
        self._aggs: list[Column] = []
        self._having: Column | None = None
        self._order: list[tuple[str, str]] = []
        self._limit: int | None = None

    def where(self, flt: dict[str, Any] | Column) -> "AnalyticsQuery":
        self._where = (
            flt if isinstance(flt, Column)
            else compile_filter(flt, df=self._df, meta_col=self._meta_col)
        )
        return self

    def group_by(self, *fields: str) -> "AnalyticsQuery":
        self._group = list(fields)
        return self

    def agg(self, *specs: tuple | Column) -> "AnalyticsQuery":
        for s in specs:
            if isinstance(s, Column):
                self._aggs.append(s)
            else:
                func, field, *alias = s
                self._aggs.append(_agg_col(func, field, alias[0] if alias else None))
        return self

    def having(self, cond: Column) -> "AnalyticsQuery":
        self._having = cond
        return self

    def order_by(self, *keys: str | tuple[str, str]) -> "AnalyticsQuery":
        for k in keys:
            if isinstance(k, str):
                self._order.append((k, "asc"))
            else:
                self._order.append((k[0], k[1].lower()))
        return self

    def limit(self, n: int) -> "AnalyticsQuery":
        self._limit = n
        return self

    def to_df(self) -> DataFrame:
        # fixed order: WHERE -> GROUP BY -> HAVING -> ORDER BY -> LIMIT
        # (sql_analytics.rs:231-310)
        out = self._df
        if self._where is not None:
            out = out.filter(self._where)
        if self._group:
            out = out.groupBy(*[F.col(g) for g in self._group]).agg(*self._aggs)
        elif self._aggs:
            out = out.agg(*self._aggs)
        if self._having is not None:
            out = out.filter(self._having)
        if self._order:
            out = out.orderBy(
                *[F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in self._order]
            )
        if self._limit is not None:
            out = out.limit(self._limit)
        return out


def filtered_count(
    df: DataFrame, flt: dict[str, Any] | Column | None = None, meta_col: str | None = None
) -> int:
    """count(filter) (accessors.rs:118).  The predicate pushes into the
    scan, so at scale this is a metadata-heavy count, not a full read."""
    if flt is None:
        return df.count()
    pred = flt if isinstance(flt, Column) else compile_filter(flt, df=df, meta_col=meta_col)
    return df.filter(pred).count()


def field_stats(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """Per-field cardinality/min/max/null-count (metadata.rs:606-642,
    accessors.rs:246-251) as one pass of partial aggregates."""
    aggs = []
    for f in fields:
        aggs += [
            F.approx_count_distinct(f).alias(f"{f}_cardinality"),
            F.count(F.col(f)).alias(f"{f}_count"),
            F.min(f).alias(f"{f}_min"),
            F.max(f).alias(f"{f}_max"),
        ]
    return df.agg(*aggs)
