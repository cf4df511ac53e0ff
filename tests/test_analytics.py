"""SQL-analytics golden cases ported from the reference's aggregation
tests (src/search/sql_analytics.rs:470-615 over the 6-row products
fixture)."""

from pyspark.sql import functions as F

from needle_spark.operators.analytics import (
    AnalyticsQuery,
    avg_fixed,
    field_stats,
    filtered_count,
    sum_fixed,
)


def test_count_star(products):
    out = AnalyticsQuery(products).agg(("count", "*", "cnt")).to_df().first()
    assert out["cnt"] == 6


def test_global_aggregates(products):
    row = (
        AnalyticsQuery(products)
        .agg(("sum", "price", "total"), ("avg", "price", "avg_p"),
             ("min", "price", "min_p"), ("max", "price", "max_p"))
        .to_df()
        .first()
    )
    assert row["total"] == 375.0
    assert row["avg_p"] == 62.5
    assert row["min_p"] == 10.0
    assert row["max_p"] == 200.0


def test_group_by_having_order(products):
    rows = (
        AnalyticsQuery(products)
        .group_by("category")
        .agg(("count", "*", "cnt"), ("avg", "price", "avg_price"))
        .having(F.col("cnt") >= 3)
        .to_df()
        .collect()
    )
    assert len(rows) == 1 and rows[0]["category"] == "books"

    rows = (
        AnalyticsQuery(products)
        .group_by("category")
        .agg(("avg", "price", "avg_price"))
        .order_by(("avg_price", "desc"))
        .limit(1)
        .to_df()
        .collect()
    )
    assert rows[0]["category"] == "electronics"
    assert rows[0]["avg_price"] == 150.0


def test_where_then_group(products):
    rows = (
        AnalyticsQuery(products)
        .where({"price": {"$gte": 15}})
        .group_by("category")
        .agg(("count", "*", "cnt"))
        .order_by("category")
        .to_df()
        .collect()
    )
    assert [(r["category"], r["cnt"]) for r in rows] == [
        ("books", 2), ("clothing", 1), ("electronics", 2)
    ]


def test_filtered_count(products):
    assert filtered_count(products, {"category": "books"}) == 3
    assert filtered_count(products) == 6


def test_fixed_point_sums_are_partitioning_invariant(lineitem):
    a = lineitem.repartition(1).agg(sum_fixed("l_extendedprice").alias("s")).first()["s"]
    b = lineitem.repartition(16).agg(sum_fixed("l_extendedprice").alias("s")).first()["s"]
    assert a == b  # bit-exact, not approximately


def test_avg_fixed(products):
    got = products.agg(avg_fixed("price").alias("a")).first()["a"]
    assert got == 62.5


def test_field_stats(products):
    row = field_stats(products, ["category", "price"]).first()
    assert row["price_min"] == 10.0 and row["price_max"] == 200.0
    assert row["category_count"] == 6
