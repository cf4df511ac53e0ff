"""Distance metric semantics vs the reference (src/distance.rs:43-73)
and bit-exactness vs the DuckDB oracle twin."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from needle_spark.functions.distance import (
    distance_expr,
    duckdb_distance_sql,
    l2_normalize_expr,
)

A = [1.0, 0.0, 0.0]
B = [0.0, 1.0, 0.0]
METRICS = ["cosine", "cosine_normalized", "euclidean", "dot", "manhattan", "hamming", "chebyshev"]


def one(spark, metric, a, b):
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    return df.select(distance_expr(metric, F.col("a"), F.col("b")).alias("d")).first()["d"]


def test_orthogonal_cosine(spark):
    assert abs(one(spark, "cosine", A, B) - 1.0) < 1e-9


def test_identical_cosine_zero(spark):
    assert abs(one(spark, "cosine", A, A)) < 1e-9


def test_zero_vector_cosine_is_one(spark):
    # norm==0 -> distance 1.0 (distance.rs:159-160)
    assert one(spark, "cosine", [0.0, 0.0, 0.0], A) == 1.0


def test_euclidean(spark):
    assert abs(one(spark, "euclidean", A, B) - math.sqrt(2)) < 1e-12


def test_dot_is_negated(spark):
    assert one(spark, "dot", [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]) == -32.0


def test_manhattan(spark):
    assert one(spark, "manhattan", [1.0, 2.0], [4.0, 0.0]) == 5.0


def test_hamming_binarizes(spark):
    # (0,1,2,0) vs (1,0,2,0) -> binary (0,1,1,0) vs (1,0,1,0) -> 2 diffs
    assert one(spark, "hamming", [0.0, 1.0, 2.0, 0.0], [1.0, 0.0, 2.0, 0.0]) == 2.0


def test_chebyshev(spark):
    assert one(spark, "chebyshev", [1.0, 5.0], [4.0, 3.0]) == 3.0


def test_query_literal_accepted(spark):
    df = spark.createDataFrame([(A,)], "a array<float>")
    d = df.select(distance_expr("cosine", F.col("a"), B).alias("d")).first()["d"]
    assert abs(d - 1.0) < 1e-9


def test_l2_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "v array<float>")
    rows = df.select(l2_normalize_expr(F.col("v")).alias("n")).collect()
    assert [round(x, 6) for x in rows[0]["n"]] == [0.6, 0.8]
    assert list(rows[1]["n"]) == [0.0, 0.0]  # zero vector passes through


@pytest.mark.parametrize("metric", METRICS)
def test_bitexact_vs_duckdb(spark, embeddings, metric):
    """The Spark expression and its DuckDB-SQL twin must agree bit-for-bit
    on real float32 data — this is what makes the oracle hash check sound."""
    qv = embeddings.orderBy("vec_id").first()["embedding"]
    # NB: a float-literal list in DuckDB SQL goes through a decimal->FLOAT
    # cast that is not correctly rounded; oracle queries must source the
    # query vector from the same parquet via a scalar subquery instead.
    q_sql = (
        "(SELECT embedding FROM '/root/testdata/sf0.001/embeddings.parquet' WHERE vec_id = 0)"
    )
    spark_rows = (
        embeddings.withColumn("d", distance_expr(metric, F.col("embedding"), [float(x) for x in qv]))
        .select("vec_id", "d")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    dsql = duckdb_distance_sql(metric, "embedding", q_sql)
    duck = duckdb.connect().execute(
        f"SELECT vec_id, {dsql} AS d FROM '/root/testdata/sf0.001/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 50"
    ).fetchall()
    for (sid, sd), (did, dd) in zip([(r["vec_id"], r["d"]) for r in spark_rows], duck):
        assert sid == did
        assert sd == dd, f"{metric}: spark {sd!r} != duckdb {dd!r} (vec {sid})"
