"""Insert / search hooks (reference: /root/reference/src/hooks.rs:1-40).

The reference ships five built-ins: normalize_l2, validate_dimensions,
add_timestamp (insert hooks) and dedup_results, score_threshold (search
hooks).  Here a hook is a DataFrame -> DataFrame function; registries
compose them in order.  Everything stays declarative (column
expressions), so hooks don't break pushdown; arbitrary python hooks are
the pandas-UDF extension point.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.functions.distance import l2_normalize_expr

Hook = Callable[[DataFrame], DataFrame]


def normalize_l2(vector_col: str = "vector") -> Hook:
    """Insert hook: L2-normalize vectors (hooks.rs normalize_l2)."""
    return lambda df: df.withColumn(vector_col, l2_normalize_expr(F.col(vector_col)))


def validate_dimensions(dims: int, vector_col: str = "vector") -> Hook:
    """Insert hook: fail the batch if any vector has the wrong width."""
    def _hook(df: DataFrame) -> DataFrame:
        bad = df.filter(F.size(vector_col) != dims).count()
        if bad:
            raise ValueError(f"{bad} rows with dimension != {dims}")
        return df
    return _hook


def add_timestamp(now: int, col: str = "inserted_at") -> Hook:
    """Insert hook: stamp rows with an (injected, deterministic) time."""
    return lambda df: df.withColumn(col, F.lit(int(now)).cast("long"))


def dedup_results(id_col: str = "id", distance_col: str = "distance") -> Hook:
    """Search hook: keep the best-scoring row per id."""
    from pyspark.sql import Window

    def _hook(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(F.col(distance_col).asc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
    return _hook


def score_threshold(max_distance: float, distance_col: str = "distance") -> Hook:
    """Search hook: drop results worse than a distance cutoff."""
    return lambda df: df.filter(F.col(distance_col) <= max_distance)


class HookRegistry:
    """Ordered hook chains for insert and search (hooks.rs pipeline)."""

    def __init__(self):
        self.insert_hooks: list[Hook] = []
        self.search_hooks: list[Hook] = []

    def on_insert(self, hook: Hook) -> "HookRegistry":
        self.insert_hooks.append(hook)
        return self

    def on_search(self, hook: Hook) -> "HookRegistry":
        self.search_hooks.append(hook)
        return self

    def apply_insert(self, df: DataFrame) -> DataFrame:
        for h in self.insert_hooks:
            df = h(df)
        return df

    def apply_search(self, df: DataFrame) -> DataFrame:
        for h in self.search_hooks:
            df = h(df)
        return df
