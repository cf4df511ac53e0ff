"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (filtered kNN) at sf0.001.
`queries()` maps operator names -> (spark, sf_dir) -> DataFrame.
`oracle_sql()` maps the same names -> DuckDB SQL over the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings).

Determinism rules used throughout (see needle_spark.functions.distance):
- distances are left-to-right float64 folds -> bit-exact in both engines;
- query vectors come from the tables themselves (scalar subqueries in the
  oracle) so both engines see identical float32 inputs;
- float SUM/AVG aggregates use exact integer fixed-point (sum_fixed) so
  results are independent of partitioning/merge order;
- every ordered/limited query tie-breaks on a unique key.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

import pandas as pd  # resolves the pandas_udf type hints under
                     # `from __future__ import annotations`

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from needle_spark.functions.distance import distance_expr, duckdb_distance_sql
from needle_spark.operators.analytics import AnalyticsQuery, avg_fixed, sum_fixed
from needle_spark.operators.knn import batch_knn, knn, radius_search


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may hand us a session without our factory's confs;
    # a TIMESTAMP(NANOS) events.parquet is unreadable without this.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # normalize ts to epoch NANOS as bigint regardless of how the
        # generator wrote it (TIMESTAMP(NANOS) -> already long;
        # timestamp[us] -> TIMESTAMP_NTZ, converted as UTC to match
        # DuckDB's epoch_ns on naive timestamps)
        if dict(df.dtypes).get("ts") not in ("bigint", None):
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    return df


_QV_CACHE: dict[tuple[str, int], list[float]] = {}


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    key = (sf_dir, vec_id)
    if key not in _QV_CACHE:
        row = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == vec_id).first()
        _QV_CACHE[key] = [float(x) for x in row["embedding"]]
    return _QV_CACHE[key]


_Q_SQL = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"


# ---------------------------------------------------------------------
# Driver-gate array projection.  The driver's canonicalizer pandas-sorts
# result columns before hashing; raw array columns raise "unhashable
# type: 'list'" (CORRECTNESS_r07 schema_adapted_read et al.).  Every
# query that would return an array column projects it to a deterministic
# scalar string instead: numeric arrays as comma-joined fixed-point
# integers round(x*1e6) (half-away-from-zero in both Spark's HALF_UP
# round and DuckDB's std::round, operating on bit-identical doubles
# because both engines compute the values with the same op order),
# string arrays via array_join on an ASCII unit separator.  Gate
# projection only — the underlying operators still return real arrays.

def _fx6_join(col: F.Column) -> F.Column:
    return F.array_join(
        F.transform(col, lambda x: F.round(x.cast("double") * 1000000.0)
                    .cast("long").cast("string")), ",")


def _fx6_join_sql(expr: str) -> str:
    return ("array_to_string(list_transform(" + expr +
            ", x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)"
            " AS VARCHAR)), ',')")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filtered top-10 cosine kNN on sf0.001 embeddings."""
    sf_dir = "/root/testdata/sf0.001"
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return knn(
        emb, qv, k=10, metric="cosine",
        filter={"label": {"$gte": 0}},
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


# ---------------------------------------------------------------- kNN ---

def _mk_knn(metric: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = _t(spark, sf_dir, "embeddings")
        qv = _query_vec(spark, sf_dir, 0)
        return knn(
            emb, qv, k=10, metric=metric, vector_col="embedding", id_col="vec_id"
        ).select("vec_id", "label", "distance")
    return q


def _knn_oracle(metric: str, k: int = 10, where: str = "", post: str = "") -> str:
    d = duckdb_distance_sql(metric, "embedding", _Q_SQL)
    return (
        f"SELECT vec_id, label, {d} AS distance FROM embeddings {where} "
        f"ORDER BY distance ASC, vec_id ASC LIMIT {k}"
    )


_FOLD_SQL = "list_reduce(list_prepend(0.0::DOUBLE, {body}), (acc, x) -> acc + x)"


def _norm_sql(a: str) -> str:
    body = f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return "sqrt(" + _FOLD_SQL.format(body=body) + ")"


def _knn_cosine_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cosine_normalized metric over L2-normalized vectors (the caller
    contract: unit vectors, distance = 1 - dot)."""
    from needle_spark.functions.distance import l2_normalize_expr

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", l2_normalize_expr(F.col("embedding")))
    qv = _query_vec(spark, sf_dir, 0)
    n = math.sqrt(sum(x * x for x in qv)) or 1.0
    qn = [x / n for x in qv]
    return knn(
        emb, qn, k=10, metric="cosine_normalized",
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


def _knn_cosine_normalized_sql() -> str:
    # doc side mirrors l2_normalize_expr's float32 round-trip; the query
    # side stays double like the Python-normalized literal
    a = ("list_transform(embedding, x -> "
         f"CAST(CAST(x AS DOUBLE) / {_norm_sql('embedding')} AS FLOAT))")
    q_inner = ("list_transform(embedding, x -> "
               f"CAST(x AS DOUBLE) / {_norm_sql('embedding')})")
    b = f"(SELECT {q_inner} FROM embeddings WHERE vec_id = 0)"
    d = duckdb_distance_sql("cosine_normalized", a, b)
    return (
        f"SELECT vec_id, label, {d} AS distance FROM embeddings "
        f"ORDER BY distance ASC, vec_id ASC LIMIT 10"
    )


def _knn_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming distance over sign-binarized embeddings (the binary-code
    search shape; raw embeddings are dense so binarize first)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform(F.col("embedding"),
                    lambda x: F.when(x > 0, F.lit(1.0)).otherwise(F.lit(0.0))
                    .cast("float")),
    )
    qv = _query_vec(spark, sf_dir, 0)
    qb = [1.0 if x > 0 else 0.0 for x in qv]
    return knn(
        emb, qb, k=10, metric="hamming",
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


def _knn_hamming_sql() -> str:
    binz = ("list_transform({v}, x -> CASE WHEN x > 0 "
            "THEN 1.0::FLOAT ELSE 0.0::FLOAT END)")
    a = binz.format(v="embedding")
    b = f"(SELECT {binz.format(v='embedding')} FROM embeddings WHERE vec_id = 0)"
    d = duckdb_distance_sql("hamming", a, b)
    return (
        f"SELECT vec_id, label, {d} AS distance FROM embeddings "
        f"ORDER BY distance ASC, vec_id ASC LIMIT 10"
    )


def _matryoshka_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine MRL search: 16-d renormalized prefix retrieves
    4x candidates, exact 64-d rescore picks the top 10."""
    from needle_spark.operators.matryoshka import coarse_to_fine_search

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return coarse_to_fine_search(
        emb, qv, k=10, coarse_dim=16, candidate_multiplier=4,
        metric="cosine", vector_col="embedding", id_col="vec_id",
    )


def _matryoshka_sql() -> str:
    from needle_spark.operators.matryoshka import duckdb_truncate_sql

    sliced = "embedding[1:16]"
    norm = ("sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
            "list_transform(embedding[1:16], x -> CAST(x AS DOUBLE) * "
            "CAST(x AS DOUBLE))), (acc, x) -> acc + x))")
    q_coarse = (
        f"(SELECT CASE WHEN {norm} > 0.0 THEN "
        f"list_transform({sliced}, x -> CAST(x AS DOUBLE) / {norm}) "
        f"ELSE list_transform({sliced}, x -> CAST(x AS DOUBLE)) END "
        f"FROM embeddings WHERE vec_id = 0)"
    )
    cd = duckdb_distance_sql("cosine", duckdb_truncate_sql("embedding", 16),
                             q_coarse)
    fd = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH c AS (
  SELECT vec_id, embedding, {cd} AS coarse_distance FROM embeddings
  ORDER BY coarse_distance ASC, vec_id ASC LIMIT 40
)
SELECT vec_id, coarse_distance, {fd} AS distance
FROM c ORDER BY distance ASC, vec_id ASC LIMIT 10
"""


def _random_projection_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded JL projection of embeddings to 2-d (visualization /
    compression path); the matrix derives from a counter hash so the
    DuckDB twin embeds identical literals."""
    from needle_spark.operators.dimreduce import RandomProjection

    emb = _t(spark, sf_dir, "embeddings")
    rp = RandomProjection(in_dim=64, out_dim=2, seed=7)
    return rp.transform(emb, vector_col="embedding").select("vec_id", "p0", "p1")


def _random_projection_sql() -> str:
    from needle_spark.operators.dimreduce import RandomProjection

    rp = RandomProjection(in_dim=64, out_dim=2, seed=7)
    exprs = ", ".join(rp.duckdb_transform_sql("embedding"))
    return f"SELECT vec_id, {exprs} FROM embeddings"


def _federated_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated search: route by query attrs to the parity members,
    weight odd results down, global top-k (federated.py over
    cross_collection_knn)."""
    from needle_spark.operators.federated import (
        FederationConfig, RoutingRule, federated_knn,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)

    def member(parity: int) -> DataFrame:
        return emb.filter(F.col("vec_id") % 2 == parity).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))

    config = FederationConfig(
        members={"even": member(0), "odd": member(1),
                 "all": emb.select(F.col("vec_id").alias("id"),
                                   F.col("embedding").alias("vector"))},
        weights={"even": 1.0, "odd": 0.7},
        rules=[RoutingRule(
            name="parity",
            predicate=lambda attrs: attrs.get("domain") == "parity",
            targets=["even", "odd"],
        )],
    )
    return federated_knn(
        config, qv, k=10, per_collection_k=8,
        query_attrs={"domain": "parity"},
    )


def _federated_routed_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH e AS (SELECT 'even' AS collection, CAST(vec_id AS VARCHAR) AS id, {d} AS distance
           FROM embeddings WHERE vec_id % 2 = 0
           ORDER BY distance ASC, vec_id ASC LIMIT 8),
o AS (SELECT 'odd' AS collection, CAST(vec_id AS VARCHAR) AS id, {d} AS distance
      FROM embeddings WHERE vec_id % 2 = 1
      ORDER BY distance ASC, vec_id ASC LIMIT 8),
u AS (SELECT *, 1.0 / (1.0 + distance) AS s FROM (SELECT * FROM e UNION ALL SELECT * FROM o)),
n AS (
  SELECT collection, id, distance,
         CASE WHEN max(s) OVER w = min(s) OVER w THEN 1.0
              ELSE (s - min(s) OVER w) / (max(s) OVER w - min(s) OVER w) END
           * CASE WHEN collection = 'odd' THEN 0.7 ELSE 1.0 END AS score
  FROM u WINDOW w AS (PARTITION BY collection)
)
SELECT collection, id, distance, score FROM n
ORDER BY score DESC, collection ASC, id ASC LIMIT 10
"""


def _knn_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return knn(
        emb, qv, k=10, metric="cosine",
        filter={"label": {"$in": [1, 2, 3]}},
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


def _knn_postfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return knn(
        emb, qv, k=10, metric="cosine",
        post_filter={"label": {"$lte": 4}}, post_filter_factor=3,
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


def _radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return radius_search(
        emb, qv, radius=0.7, limit=200, metric="cosine",
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


def _batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    return batch_knn(
        emb, queries, k=5, metric="cosine",
        doc_vector_col="embedding", doc_id_col="vec_id",
    ).withColumn("rank", F.col("rank").cast("long"))


_BATCH_KNN_SQL = f"""
SELECT query_id, vec_id, distance, rank FROM (
  SELECT q.vec_id AS query_id, d.vec_id AS vec_id,
         {duckdb_distance_sql("cosine", "d.embedding", "q.embedding")} AS distance,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {duckdb_distance_sql("cosine", "d.embedding", "q.embedding")} ASC,
                    d.vec_id ASC
         ) AS rank
  FROM embeddings d, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
) WHERE rank <= 5
"""


def _recommend_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recommend = kNN on (mean(pos) - mean(neg)); exact SQL twin below
    from needle_spark.operators.knn import recommend

    emb = _t(spark, sf_dir, "embeddings")
    return recommend(
        emb, positive_ids=[0, 1], negative_ids=[2], k=10, metric="cosine",
        vector_col="embedding", id_col="vec_id",
    ).select("vec_id", "label", "distance")


# --------------------------------------------------------- analytics ---

def _agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            sum_fixed("l_quantity").alias("sum_qty"),
            sum_fixed("l_extendedprice").alias("sum_price"),
            avg_fixed("l_discount", scale=4).alias("avg_disc"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_AGG_LINEITEM_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS cnt,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price,
       (CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0)
         / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
       min(l_quantity) AS min_qty,
       max(l_extendedprice) AS max_price
FROM lineitem
WHERE l_quantity > 0
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _having_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        AnalyticsQuery(orders)
        .where({"o_orderstatus": {"$ne": "P"}})
        .group_by("o_orderpriority")
        .agg(("count", "*", "cnt"), avg_fixed("o_totalprice").alias("avg_total"))
        .having(F.col("cnt") >= 10)
        .order_by(("avg_total", "desc"), ("o_orderpriority", "asc"))
        .limit(5)
        .to_df()
    )


_HAVING_ORDER_SQL = """
SELECT o_orderpriority, count(*) AS cnt,
       (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0)
         / CAST(count(o_totalprice) AS DOUBLE) AS avg_total
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY o_orderpriority
HAVING count(*) >= 10
ORDER BY avg_total DESC, o_orderpriority ASC
LIMIT 5
"""


def _filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    from needle_spark.filters import compile_filter

    flt = {
        "$and": [
            {"o_totalprice": {"$between": [50_000, 200_000]}},
            {
                "$or": [
                    {"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}},
                    {"o_orderstatus": "F"},
                ]
            },
            {"$not": {"o_custkey": {"$lt": 10}}},
        ]
    }
    return orders.filter(compile_filter(flt, df=orders)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


_FILTER_COMPOUND_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_totalprice >= 50000 AND o_totalprice <= 200000)
  AND (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderstatus = 'F')
  AND NOT (o_custkey < 10)
"""


def _filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    from needle_spark.filters import compile_filter

    flt = {"o_orderstatus": "O", "o_totalprice": {"$gt": 100_000}}
    return orders.filter(compile_filter(flt, df=orders)).agg(
        F.count(F.lit(1)).alias("cnt")
    )


_FILTERED_COUNT_SQL = """
SELECT count(*) AS cnt FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 100000
"""


def _group_docs_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


_GROUP_DOCS_LANG_SQL = """
SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def _topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_TOPK_PER_GROUP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def _events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            sum_fixed("value", scale=4).alias("sum_value"),
            F.count("user_id").alias("user_events"),
        )
        .orderBy("event_type")
    )


_EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(*) AS cnt,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value,
       count(user_id) AS user_events
FROM events GROUP BY event_type ORDER BY event_type
"""


_RECOMMEND_SQL = f"""
WITH qvec AS (
  SELECT list_transform(
           list_zip(
             (SELECT embedding FROM embeddings WHERE vec_id = 0),
             (SELECT embedding FROM embeddings WHERE vec_id = 1),
             (SELECT embedding FROM embeddings WHERE vec_id = 2)
           ),
           z -> (CAST(z[1] AS DOUBLE) + CAST(z[2] AS DOUBLE)) / 2.0
                - CAST(z[3] AS DOUBLE)
         ) AS v
)
SELECT vec_id, label,
       {duckdb_distance_sql("cosine", "embedding", "(SELECT v FROM qvec)")} AS distance
FROM embeddings
WHERE vec_id NOT IN (0, 1, 2)
ORDER BY distance ASC, vec_id ASC LIMIT 10
"""


# ------------------------------------------------------ text & fusion ---

_BM25_QUERY = "fast merge sort join"


def _bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.hybrid import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    return bm25_scores(docs, _BM25_QUERY, id_col="doc_id", text_col="text")


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.hybrid import bm25_topk, rrf_fuse

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    qv = _query_vec(spark, sf_dir, 0)
    vec = knn(
        emb, qv, k=50, metric="cosine", vector_col="embedding", id_col="vec_id"
    ).select(F.col("vec_id").alias("id"), "distance")
    bm = bm25_topk(
        docs, _BM25_QUERY, limit=50, id_col="doc_id", text_col="text"
    ).select(F.col("doc_id").alias("id"), "score")
    return rrf_fuse(vec, bm, limit=20)


def _hybrid_rrf_sql() -> str:
    from needle_spark.operators.hybrid import duckdb_bm25_sql

    dist = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    bm25 = duckdb_bm25_sql(_BM25_QUERY, table="documents", id_col="doc_id")
    return f"""
WITH vecraw AS (
  SELECT vec_id AS id, {dist} AS distance FROM embeddings
  ORDER BY distance ASC, id ASC LIMIT 50
),
vec AS (
  SELECT id, 1.0 / (1.0 + distance) AS vector_score,
         CAST(row_number() OVER (ORDER BY distance ASC, id ASC) AS BIGINT) AS vector_rank
  FROM vecraw
),
bmraw AS ({bm25}),
bmtop AS (SELECT doc_id AS id, score FROM bmraw
          ORDER BY round(score, 9) DESC, id ASC LIMIT 50),
bm AS (
  SELECT id, score AS bm25_score,
         CAST(row_number() OVER (ORDER BY round(score, 9) DESC, id ASC) AS BIGINT) AS bm25_rank
  FROM bmtop
)
SELECT COALESCE(vec.id, bm.id) AS id,
       COALESCE(0.5 / (60.0 + vector_rank), 0.0)
         + COALESCE(0.5 / (60.0 + bm25_rank), 0.0) AS score,
       vector_score, bm25_score, vector_rank, bm25_rank
FROM vec FULL OUTER JOIN bm ON vec.id = bm.id
ORDER BY score DESC, COALESCE(vec.id, bm.id) ASC LIMIT 20
"""


def _rerank_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.hybrid import rerank_by_field

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    top = knn(
        emb, qv, k=30, metric="cosine", vector_col="embedding", id_col="vec_id"
    ).select("vec_id", "label", "distance")
    return rerank_by_field(top, "label", k=10, fetch_k=30, descending=True, id_col="vec_id")


def _rerank_by_field_sql() -> str:
    dist = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
SELECT vec_id, label, distance FROM (
  SELECT vec_id, label, {dist} AS distance FROM embeddings
  ORDER BY distance ASC, vec_id ASC LIMIT 30
) ORDER BY label DESC, vec_id ASC LIMIT 10
"""


# ------------------------------------------- dedup & text analysis ---

def _dedup_events_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.dedup import exact_dedup

    ev = _t(spark, sf_dir, "events")
    return exact_dedup(ev, ["user_id", "event_type"], id_col="event_id").select(
        "event_id", "user_id", "event_type"
    )


_DEDUP_EVENTS_SQL = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


_MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark decontamination: flag corpus docs sharing
    any 8-gram with the held-out 'benchmark' slice (doc_id % 10 == 0)."""
    from needle_spark.operators.llm_hygiene import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(corpus, bench, n=8, id_col="doc_id", text_col="text")


def _gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-paper quality rules as scan-projection expressions."""
    from needle_spark.operators.llm_hygiene import gopher_quality

    return gopher_quality(_t(spark, sf_dir, "documents"))


def _stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixing sample (md5-threshold, map-only)."""
    from needle_spark.operators.llm_hygiene import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "source", _MIX_FRACTIONS, key_col="doc_id", seed="mix0",
        default_fraction=0.05,
    ).select("doc_id", "source")


def _pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII counts + redaction over documents with deterministically
    injected PII (the corpus itself is synthetic-clean, so the query
    plants emails/SSNs to make the check meaningful)."""
    from needle_spark.operators.llm_hygiene import redact_pii

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" reach me: user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" ssn 123-45-6789 tel 555-123-4567")).otherwise(
                F.lit("")),
        ).alias("text"),
    )
    return redact_pii(injected, id_col="doc_id", text_col="text")


def _pii_redact_sql() -> str:
    from needle_spark.operators.llm_hygiene import redact_pii_sql

    inner = (
        "SELECT doc_id, text || "
        "CASE WHEN doc_id % 3 = 0 THEN ' reach me: user' || "
        "CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || "
        "CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789 tel 555-123-4567' "
        "ELSE '' END AS text FROM documents"
    )
    return redact_pii_sql(table=f"({inner})")


def _dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-line removal over constructed multi-line
    docs (synthetic corpus is single-line, so lines are planted)."""
    from needle_spark.operators.llm_hygiene import dedup_lines_expr

    docs = _t(spark, sf_dir, "documents")
    multi = docs.select(
        "doc_id",
        F.concat_ws("\n", F.col("text"), F.col("text"), F.lit("END"),
                    F.col("text")).alias("text"),
    )
    return multi.select("doc_id", dedup_lines_expr("text").alias("deduped"))


def _dedup_lines_sql() -> str:
    from needle_spark.operators.llm_hygiene import duckdb_dedup_lines_sql

    inner = (
        "SELECT doc_id, text || chr(10) || text || chr(10) || 'END' || "
        "chr(10) || text AS text FROM documents"
    )
    return (f"SELECT doc_id, {duckdb_dedup_lines_sql('text')} AS deduped "
            f"FROM ({inner})")


def _ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text", n=3, threshold=0.6)


def _neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup group assignment (the step between "pairs found" and
    "keep one per group"): hash-min connected components over the exact
    n-gram-Jaccard pair graph.  Oracle: DuckDB recursive CTE reachability
    over the identical pair set."""
    from needle_spark.operators.dedup import (neardup_components,
                                              ngram_jaccard_pairs)

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.6)
    return (neardup_components(pairs, id_col="doc_id")
            .select("doc_id", "component")
            .orderBy("doc_id"))


def _neardup_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper selection: one representative (smallest id) per near-dup
    component; unpaired docs pass through."""
    from needle_spark.operators.dedup import (neardup_dedup,
                                              ngram_jaccard_pairs)

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.6)
    return (neardup_dedup(docs, pairs, id_col="doc_id")
            .select("doc_id").orderBy("doc_id"))


def _neardup_components_sql() -> str:
    pairs = _jaccard_oracle_sql(0.6)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION
  SELECT id2, id1 FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS component
  FROM reach GROUP BY a
)
SELECT doc_id, component FROM comp ORDER BY doc_id
"""


def _neardup_dedup_keep_sql() -> str:
    comps = _neardup_components_sql().replace(
        "SELECT doc_id, component FROM comp ORDER BY doc_id",
        "SELECT doc_id FROM comp WHERE doc_id != component")
    return (f"SELECT doc_id FROM documents WHERE doc_id NOT IN "
            f"({comps}) ORDER BY doc_id")


def _minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text", n=3, verify_threshold=0.6
    )


def _jaccard_oracle_sql(threshold: float = 0.6) -> str:
    from needle_spark.operators.dedup import duckdb_shingles_sql

    sh = duckdb_shingles_sql("t", 3)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) >= 1) AS t
  FROM documents
),
sh AS (SELECT doc_id, {sh} AS s FROM toks),
e AS (SELECT doc_id, unnest(s) AS g FROM sh),
sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS DOUBLE) AS c
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2, jaccard FROM (
  SELECT id1, id2, c / (CAST(s1.sz + s2.sz AS DOUBLE) - c) AS jaccard
  FROM inter
  JOIN sizes s1 ON s1.doc_id = id1
  JOIN sizes s2 ON s2.doc_id = id2
) WHERE jaccard >= {threshold!r}
"""


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered simhash runs the md5-derived 64-bit token-hash family
    (round 6, VERDICT-r5 ask #1b): identical banding/hamming algorithm,
    and DuckDB reproduces the hash bit-identically
    (('0x'||substr(md5,1,16))::UBIGINT), so the driver gate gets a full
    rows+schema+hash row instead of `no_oracle`.  The xxhash64 family
    remains the library performance default (one JVM hash vs four md5
    substrings per token) and is pinned by pytest golden signatures +
    result-identity vs this md5 twin (tests/test_dedup.py)."""
    from needle_spark.operators.dedup import simhash_candidates

    docs = _t(spark, sf_dir, "documents")
    return simhash_candidates(docs, id_col="doc_id", text_col="text",
                              max_hamming=8, impl="md5")


def _simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias kept for artifact continuity with CORRECTNESS_r05 — same
    plan as `simhash_candidates` above."""
    return _simhash(spark, sf_dir)


_SIMHASH_MD5_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> length(t) >= 2)) AS t
  FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS hv FROM tok
),
votes AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM h, (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b
),
sim AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << b)::HUGEINT
                  ELSE 0::HUGEINT END)::UBIGINT AS s
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, s, band.band AS band,
         (s >> (band.band * 16)) & 65535 AS block
  FROM sim, (SELECT unnest(range(4)) AS band) band
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         bit_count(xor(a.s, b.s)) AS hamming
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.block = b.block
              AND a.doc_id < b.doc_id
)
SELECT id1, id2, CAST(hamming AS INT) AS hamming
FROM pairs WHERE hamming <= 8
"""


def _embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    # 0.6 is a DENSE threshold (epsilon ~ centroid spacing), so replicas
    # cover most cells; fewer cells = less duplicated shuffle for this
    # workload.  Sparse near-dup thresholds want more cells (see docstring).
    return embedding_neardup_pairs(
        emb, threshold=0.6, metric="cosine", id_col="vec_id",
        vector_col="embedding", num_cells=8,
    )


def _embedding_neardup_sql() -> str:
    d = duckdb_distance_sql("cosine", "a.embedding", "b.embedding")
    return f"""
SELECT id1, id2, distance FROM (
  SELECT a.vec_id AS id1, b.vec_id AS id2, {d} AS distance
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE distance <= 0.6
"""


def _embedding_neardup_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dot-metric near-dup through the ALSH/norm-augmentation cell path
    (round 6, VERDICT r5 ask #2; operators/dedup.py docstring).  The
    embeddings table is unit-norm, so threshold -0.4 (dot >= 0.4)
    selects the cosine-0.6 pair set — the oracle checks both the
    reduction's exactness and the distance values."""
    from needle_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, threshold=-0.4, metric="dot", id_col="vec_id",
        vector_col="embedding", num_cells=8,
    )


def _embedding_neardup_dot_sql() -> str:
    d = duckdb_distance_sql("dot", "a.embedding", "b.embedding")
    return f"""
SELECT id1, id2, distance FROM (
  SELECT a.vec_id AS id1, b.vec_id AS id2, {d} AS distance
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE distance <= -0.4
"""


def _insert_dedup_reject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-time semantic-dedup, Reject policy (round 10; reference
    src/collection/dedup.rs:112-130 apply_dedup_policy, insert.rs:147):
    treat vec_id >= 100 as the existing collection and vec_id < 100 as
    an incoming batch in id order; the result is the ACCEPTED id set
    under the reference's SEQUENTIAL semantics — a row is rejected
    when its 1-NN distance to (existing ∪ earlier ACCEPTED batch rows)
    is under the threshold.  Oracle: a DuckDB recursive-CTE greedy
    over the identical distances (operators/insert_dedup.py)."""
    from needle_spark.operators.insert_dedup import insert_dedup_reject_ids

    emb = _t(spark, sf_dir, "embeddings")
    existing = emb.filter(F.col("vec_id") >= 100)
    batch = emb.filter(F.col("vec_id") < 100)
    return insert_dedup_reject_ids(
        existing, batch, threshold=0.65, id_col="vec_id",
        vector_col="embedding", metric="cosine")


def _insert_dedup_reject_sql() -> str:
    t = 0.65
    d_be = duckdb_distance_sql("cosine", "b.embedding", "e.embedding")
    d_bb = duckdb_distance_sql("cosine", "b.embedding", "b2.embedding")
    # MATERIALIZED is load-bearing: the recursive step must not
    # re-evaluate the distance CTEs per iteration (35s -> 0.8s)
    return f"""
WITH RECURSIVE
b AS MATERIALIZED (
  SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings WHERE vec_id < 100),
ex AS MATERIALIZED (
  SELECT b.rn AS rn, MIN({d_be}) AS dmin
  FROM b, embeddings e WHERE e.vec_id >= 100 GROUP BY b.rn),
wb AS MATERIALIZED (
  SELECT b.vec_id AS i, b2.vec_id AS j
  FROM b, b AS b2 WHERE b.vec_id != b2.vec_id AND {d_bb} < {t}),
bk AS MATERIALIZED (SELECT vec_id, rn FROM b),
step AS (
  SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS acc
  UNION ALL
  SELECT bk.rn,
         CASE WHEN ex.dmin < {t}
                   OR EXISTS (SELECT 1 FROM wb
                              WHERE wb.i = bk.vec_id
                                AND list_contains(s.acc, wb.j))
              THEN s.acc ELSE list_append(s.acc, bk.vec_id) END
  FROM step s JOIN bk ON bk.rn = s.rn + 1 JOIN ex ON ex.rn = bk.rn
)
SELECT unnest(acc) AS vec_id
FROM (SELECT acc FROM step ORDER BY rn DESC LIMIT 1)
ORDER BY vec_id
"""


def _incremental_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming/incremental near-dup (operators/incremental_dedup.py,
    round 11): treat doc_id % 5 == 0 as one incoming micro-batch and
    the rest as the bootstrapped corpus state; the result is the KEPT
    batch id set — a batch doc drops when exact-verified Jaccard >=
    0.6 against any corpus doc, else keep-FIRST in id order within the
    batch (insert_dedup's sequential walk).  Oracle: the identical
    exact-Jaccard pair set (same shingle SQL as `minhash_lsh_dedup`,
    equal unless a banding miss occurs — same argument as that green
    row since the banding params are identical) + a DuckDB
    recursive-CTE greedy for the within-batch walk."""
    import shutil
    import tempfile

    from needle_spark.operators.incremental_dedup import \
        IncrementalMinHashDedup

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    tmp = tempfile.mkdtemp(prefix="incdedup_oracle_")
    try:
        inc = IncrementalMinHashDedup(
            spark, os.path.join(tmp, "state"), id_col="doc_id",
            text_col="text", threshold=0.6)
        inc.bootstrap(corpus)
        res = inc.dedup_batch(batch, corpus, update_state=False)
        # `kept` is a filter over the batch frame (drops already
        # resolved eagerly) — safe to drop the state dir now
        return res["kept"].select("doc_id").orderBy("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _incremental_dedup_keep_sql() -> str:
    from needle_spark.operators.dedup import duckdb_shingles_sql

    sh = duckdb_shingles_sql("t", 3)
    return f"""
WITH RECURSIVE
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) >= 1) AS t
  FROM documents
),
sh AS MATERIALIZED (SELECT doc_id, {sh} AS s FROM toks),
e AS (SELECT doc_id, unnest(s) AS g FROM sh),
sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS DOUBLE) AS c
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS MATERIALIZED (
  SELECT id1, id2 FROM inter
  JOIN sizes s1 ON s1.doc_id = id1
  JOIN sizes s2 ON s2.doc_id = id2
  WHERE c / (CAST(s1.sz + s2.sz AS DOUBLE) - c) >= 0.6
),
b AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id % 5 = 0),
cd AS MATERIALIZED (
  SELECT DISTINCT bb.doc_id FROM b bb JOIN jac
    ON (jac.id1 = bb.doc_id AND jac.id2 % 5 != 0)
    OR (jac.id2 = bb.doc_id AND jac.id1 % 5 != 0)),
wb AS MATERIALIZED (
  SELECT id1 AS i, id2 AS j FROM jac
  WHERE id1 % 5 = 0 AND id2 % 5 = 0),
step AS (
  SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS acc
  UNION ALL
  SELECT bb.rn,
         CASE WHEN EXISTS (SELECT 1 FROM cd
                           WHERE cd.doc_id = bb.doc_id)
                   OR EXISTS (SELECT 1 FROM wb
                              WHERE wb.j = bb.doc_id
                                AND list_contains(s.acc, wb.i))
              THEN s.acc ELSE list_append(s.acc, bb.doc_id) END
  FROM step s JOIN b bb ON bb.rn = s.rn + 1
)
SELECT unnest(acc) AS doc_id
FROM (SELECT acc FROM step ORDER BY rn DESC LIMIT 1)
ORDER BY doc_id
"""


def _insert_dedup_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version policy (dedup.rs:152): every near-duplicate insert is
    stored under '{id}-v{N}' where N is the collection length at that
    row's turn.  Because Version inserts EVERY row, each batch row sees
    ALL earlier batch rows — so unlike Reject, the oracle needs no
    recursion: dup_i = (1-NN vs existing < t) OR (min over earlier
    batch rows < t), and N = |existing| + (rn - 1).  Ids are
    zero-padded so string order == numeric order in both engines."""
    from needle_spark.operators.insert_dedup import (SemanticDedupConfig,
                                                     apply_insert_dedup)

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "sid", F.lpad(F.col("vec_id").cast("string"), 4, "0"))
    existing = emb.filter(F.col("vec_id") >= 100) \
        .select(F.col("sid").alias("id"), F.col("embedding"))
    batch = emb.filter(F.col("vec_id") < 100) \
        .select(F.col("sid").alias("id"), F.col("embedding"))
    cfg = SemanticDedupConfig.new(0.65, "version")
    res = apply_insert_dedup(existing, batch, cfg, id_col="id",
                             vector_col="embedding")
    return res.accepted.select("id").orderBy("id")


def _insert_dedup_version_sql() -> str:
    t = 0.65
    d_be = duckdb_distance_sql("cosine", "b.embedding", "e.embedding")
    d_bb = duckdb_distance_sql("cosine", "a.embedding", "b.embedding")
    return f"""
WITH
b AS MATERIALIZED (
  SELECT lpad(CAST(vec_id AS VARCHAR), 4, '0') AS bid, embedding,
         row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings WHERE vec_id < 100),
ex AS MATERIALIZED (
  SELECT b.rn AS rn, MIN({d_be}) AS dmin
  FROM b, embeddings e WHERE e.vec_id >= 100 GROUP BY b.rn),
wb AS MATERIALIZED (
  SELECT b.rn AS rn, MIN({d_bb}) AS dmin
  FROM b, b AS a WHERE a.rn < b.rn GROUP BY b.rn)
SELECT CASE WHEN LEAST(ex.dmin, COALESCE(wb.dmin, 1e9)) < {t}
            THEN b.bid || '-v' || CAST(400 + b.rn - 1 AS VARCHAR)
            ELSE b.bid END AS id
FROM b JOIN ex ON ex.rn = b.rn LEFT JOIN wb ON wb.rn = b.rn
ORDER BY id
"""


def _text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.text_analysis import (
        bpe_token_count_expr,
        fingerprint_expr,
        lang_id_expr,
        quality_score_expr,
        word_count_expr,
    )

    from needle_spark.operators.text_analysis import text_profile_arrow

    docs = _t(spark, sf_dir, "documents")
    # one-pass Arrow kernel (tokenize once per doc); value-identical to
    # the expression pipeline above, ~4x faster — the expression twins
    # (lang_id_expr etc.) remain the composable public API
    return text_profile_arrow(docs, id_col="doc_id", text_col="text")


def _text_profile_sql() -> str:
    from needle_spark.operators.text_analysis import (
        BPE_TOKEN_RE,
        duckdb_fingerprint_sql,
        duckdb_lang_id_sql,
        duckdb_quality_score_sql,
    )

    return f"""
SELECT doc_id,
       {duckdb_lang_id_sql('text')} AS pred_lang,
       CAST(len(list_filter(string_split_regex(text, '\\s+'),
                            w -> length(w) > 0)) AS BIGINT) AS word_cnt,
       CAST(len(regexp_extract_all(lower(text), '{BPE_TOKEN_RE}')) AS BIGINT) AS bpe_cnt,
       {duckdb_quality_score_sql('text')} AS quality,
       {duckdb_fingerprint_sql('text')} AS fingerprint
FROM documents
"""


# --------------------------------------- temporal / multivec / sparse ---

_DECAY_HALF_LIFE = 2000


def _emb_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with a deterministic inserted_at (vec_id * 10 s)."""
    return _t(spark, sf_dir, "embeddings").withColumn(
        "inserted_at", (F.col("vec_id") * 10).cast("long")
    )


def _time_decay_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.functions.timedecay import apply_time_decay

    emb = _emb_temporal(spark, sf_dir)
    now = emb.agg(F.max("inserted_at")).first()[0] + 100
    qv = _query_vec(spark, sf_dir, 0)
    top = knn(
        emb, qv, k=30, metric="cosine", vector_col="embedding", id_col="vec_id"
    ).select("vec_id", "inserted_at", "distance")
    return apply_time_decay(
        top, "exponential", now=now, k=10, id_col="vec_id",
        half_life_seconds=_DECAY_HALF_LIFE,
    )


def _time_decay_knn_sql() -> str:
    from needle_spark.functions.timedecay import duckdb_decay_sql

    dist = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    decay = duckdb_decay_sql(
        "exponential",
        "greatest(0, (SELECT max(vec_id * 10) + 100 FROM embeddings) - inserted_at)",
        half_life_seconds=_DECAY_HALF_LIFE,
    )
    return f"""
WITH top AS (
  SELECT vec_id, CAST(vec_id * 10 AS BIGINT) AS inserted_at, {dist} AS distance
  FROM embeddings ORDER BY distance ASC, vec_id ASC LIMIT 30
)
SELECT vec_id, inserted_at,
       CASE WHEN {decay} > 0.0 THEN distance / ({decay})
            ELSE 1.7976931348623157e308 END AS distance
FROM top
ORDER BY distance ASC, vec_id ASC LIMIT 10
"""


def _asof_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_temporal(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    return knn(
        emb, qv, k=10, metric="cosine", vector_col="embedding", id_col="vec_id",
        as_of=2000,
    ).select("vec_id", "label", "distance")


def _maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.multivec import maxsim_scores

    emb = _t(spark, sf_dir, "embeddings")
    # multivec fixture: each 64-dim embedding = 4 token vectors of 16 dims
    doc_tokens = emb.select(
        "vec_id",
        F.explode(
            F.array(*[F.slice("embedding", t * 16 + 1, 16).alias("v") for t in range(4)])
        ).alias("vector"),
    )
    q = _query_vec(spark, sf_dir, 0)
    q_tokens = [q[t * 16:(t + 1) * 16] for t in range(4)]
    return maxsim_scores(doc_tokens, q_tokens, doc_id_col="vec_id")


def _maxsim_sql() -> str:
    from needle_spark.functions.distance import duckdb_distance_sql as _d

    dot = "-(" + _d("dot", "dt.v", "qt.v") + ")"  # dot distance is negated dot
    return f"""
WITH toks(t) AS (VALUES (0), (1), (2), (3)),
dt AS (
  SELECT vec_id, t, embedding[(t * 16 + 1):(t * 16 + 16)] AS v
  FROM embeddings, toks
),
qt AS (
  SELECT t, embedding[(t * 16 + 1):(t * 16 + 16)] AS v
  FROM embeddings, toks WHERE vec_id = 0
),
per_tok AS (
  SELECT dt.vec_id, qt.t AS qtok, max({dot}) AS m
  FROM dt, qt GROUP BY dt.vec_id, qt.t
)
SELECT vec_id, sum(m) AS score FROM per_tok GROUP BY vec_id
"""


_SPARSE_THRESHOLD = 0.15


def _sparse_query_postings(spark: SparkSession, sf_dir: str):
    q = _query_vec(spark, sf_dir, 0)
    idx = [i for i, v in enumerate(q) if v > _SPARSE_THRESHOLD]
    return idx, [q[i] for i in idx]


def _sparse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    indices = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.when(F.element_at("embedding", i + 1) > _SPARSE_THRESHOLD, i),
        ),
        lambda x: x.isNotNull(),
    )
    return emb.select(
        F.col("vec_id").alias("id"),
        indices.alias("indices"),
        F.transform(indices, lambda i: F.element_at("embedding", i + 1)).alias("values"),
    ).filter(F.size("indices") > 0)


def _sparse_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.sparse import sparse_dot_scores

    idx, vals = _sparse_query_postings(spark, sf_dir)
    return sparse_dot_scores(_sparse_docs(spark, sf_dir), idx, vals, id_col="id")


def _sparse_dot_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, unnest(range(0, 64)) AS pos, unnest(embedding) AS val
  FROM embeddings
),
d AS (SELECT vec_id, pos, CAST(val AS DOUBLE) AS val FROM e WHERE val > {_SPARSE_THRESHOLD!r}),
q AS (SELECT pos, CAST(val AS DOUBLE) AS qval FROM e
      WHERE vec_id = 0 AND val > {_SPARSE_THRESHOLD!r})
SELECT d.vec_id AS id, sum(d.val * q.qval) AS score
FROM d JOIN q USING (pos) GROUP BY d.vec_id
"""


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over the events stream table.
    ts is TIMESTAMP(NANOS) read as bigint nanos; the window id uses
    integer division (doubles lose precision above 2^53)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("window_id", F.expr("ts div 3600000000000"))
        .groupBy("window_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            sum_fixed("value", scale=4).alias("sum_value"),
        )
        .orderBy("window_id", "event_type")
    )


_EVENTS_HOURLY_SQL = """
SELECT epoch_ns(ts) // 3600000000000 AS window_id, event_type,
       count(*) AS cnt,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _field_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_orderpriority").alias("prio_card"),
        F.countDistinct("o_orderstatus").alias("status_card"),
        F.count("o_totalprice").alias("price_count"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.min("o_orderkey").alias("key_min"),
        F.max("o_orderkey").alias("key_max"),
    )


_FIELD_STATS_SQL = """
SELECT count(DISTINCT o_orderpriority) AS prio_card,
       count(DISTINCT o_orderstatus) AS status_card,
       count(o_totalprice) AS price_count,
       min(o_totalprice) AS price_min,
       max(o_totalprice) AS price_max,
       min(o_orderkey) AS key_min,
       max(o_orderkey) AS key_max
FROM orders
"""


def _filter_ops_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the string/array filter operators ($contains,
    $startsWith, $endsWith, $regex, $size) end-to-end."""
    from needle_spark.filters import compile_filter

    docs = _t(spark, sf_dir, "documents")
    flt = {
        "$and": [
            {"text": {"$contains": "merge"}},
            {"source": {"$startsWith": "src"}},
            {"lang": {"$size": 2}},
            {"$or": [
                {"text": {"$regex": "fast[a-z ]*merge"}},
                {"source": {"$endsWith": "1"}},
            ]},
        ]
    }
    return docs.filter(compile_filter(flt, df=docs)).select("doc_id", "lang", "source")


_FILTER_OPS_TEXT_SQL = """
SELECT doc_id, lang, source FROM documents
WHERE text LIKE '%merge%'
  AND starts_with(source, 'src')
  AND length(lang) = 2
  AND (regexp_matches(text, 'fast[a-z ]*merge') OR source LIKE '%1')
"""


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle > 30 min.  All integer nanos arithmetic + rank windows."""
    gap_ns = 30 * 60 * 1_000_000_000
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    sess = (
        ev.withColumn("__prev", F.lag("ts").over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull() | ((F.col("ts") - F.col("__prev")) > gap_ns)).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


_EVENTS_SESSIONIZE_SQL = """
WITH s AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER w AS prev_ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
t AS (
  SELECT user_id,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM s
)
SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
FROM t GROUP BY user_id ORDER BY user_id
"""


def _filter_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$all / $elemMatch / $contains on an array column (tokens derived
    from text — the testdata has no native array columns)."""
    from needle_spark.filters import compile_filter
    from needle_spark.functions.text import tokenize_expr

    docs = _t(spark, sf_dir, "documents").withColumn(
        "tokens", tokenize_expr("text", stop_words=None, min_len=1)
    )
    flt = {
        "$and": [
            {"tokens": {"$all": ["merge", "sort"]}},
            {"tokens": {"$elemMatch": {"$startsWith": "wind"}}},
            {"tokens": {"$contains": "fast"}},
        ]
    }
    return docs.filter(compile_filter(flt, df=docs)).select("doc_id", "lang")


_FILTER_ARRAY_OPS_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> length(t) >= 1) AS tokens
  FROM documents
)
SELECT doc_id, lang FROM d
WHERE list_contains(tokens, 'merge') AND list_contains(tokens, 'sort')
  AND len(list_filter(tokens, t -> starts_with(t, 'wind'))) > 0
  AND list_contains(tokens, 'fast')
"""


def _filter_json_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless-metadata path: events.props is a JSON string; parse to
    map<string,string> and filter through the compiler's dynamic map
    fallback (numeric literal vs string value -> numeric compare)."""
    from needle_spark.filters import compile_filter

    ev = _t(spark, sf_dir, "events").withColumn(
        "meta", F.from_json("props", "map<string,string>")
    )
    flt = {"k": {"$gt": 50, "$lte": 90}}
    return ev.filter(compile_filter(flt, df=ev, meta_col="meta")).select(
        "event_id", "event_type"
    )


_FILTER_JSON_META_SQL = """
SELECT event_id, event_type FROM events
WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 90
"""


# ------------------------------------------- join & OLAP analytics ---

def _revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table star join: nation <- customer <- orders <- lineitem.
    nation/customer broadcast; lineitem (the fact table) never shuffles
    for the joins — only the final small aggregation exchanges."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev_cents = F.round(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * 100
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum(rev_cents).cast("double") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
        .orderBy("n_name")
    )


_REVENUE_PER_NATION_SQL = """
SELECT n_name,
       CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue,
       count(*) AS line_cnt
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def _distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (free in Spark; SURVEY §2.4 notes absent in
    the reference)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("supp_card"),
            F.countDistinct("l_partkey").alias("part_card"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


_DISTINCT_AGG_SQL = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS supp_card,
       count(DISTINCT l_partkey) AS part_card, count(*) AS cnt
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — grouping-set extension."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), sum_fixed("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_ROLLUP_AGG_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def _ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall harness (recall_benchmark.rs): recall@10 of IVF(nprobe=8/16)
    vs the exact oracle for 5 queries.  Rows-only check (KMeans has no
    SQL twin); correctness asserted in tests via bounds."""
    from needle_spark.plans.ivf import IvfIndex

    emb = _t(spark, sf_dir, "embeddings")
    ivf = IvfIndex.fit(emb, nlist=16, vector_col="embedding", id_col="vec_id")
    indexed = ivf.assign(emb).cache()
    out = []
    queries = emb.orderBy("vec_id").limit(5).collect()
    for r in queries:
        qv = [float(x) for x in r["embedding"]]
        exact = {
            x["vec_id"]
            for x in knn(emb, qv, k=10, vector_col="embedding", id_col="vec_id").collect()
        }
        approx = {
            x["vec_id"] for x in ivf.search(indexed, qv, k=10, nprobe=8).collect()
        }
        out.append((r["vec_id"], len(exact & approx) / 10.0))
    indexed.unpersist()
    return spark.createDataFrame(out, "query_id bigint, recall double")


# ------------------------------- cross-collection / graph / rerank ---

def _knn_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination: page 2 of size 5 == rows 6..10 of the global
    ordering (cursor from page 1's last row)."""
    from needle_spark.operators.knn import knn_after

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    page1 = knn(emb, qv, k=5, vector_col="embedding", id_col="vec_id").collect()
    cursor = (page1[-1]["distance"], page1[-1]["vec_id"])
    return knn_after(
        emb, qv, cursor, k=5, vector_col="embedding", id_col="vec_id"
    ).select("vec_id", "label", "distance")


def _knn_page2_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return (
        f"SELECT vec_id, label, distance FROM ("
        f"SELECT vec_id, label, {d} AS distance FROM embeddings "
        f"ORDER BY distance ASC, vec_id ASC LIMIT 10) "
        f"ORDER BY distance ASC, vec_id ASC OFFSET 5"
    )


def _cross_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.cross_collection import cross_collection_knn

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    colls = {
        "even": emb.filter(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vector")),
        "odd": emb.filter(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vector")),
    }
    return cross_collection_knn(colls, qv, k=10, per_collection_k=8)


def _cross_collection_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH e AS (SELECT 'even' AS collection, CAST(vec_id AS VARCHAR) AS id, {d} AS distance
           FROM embeddings WHERE vec_id % 2 = 0
           ORDER BY distance ASC, vec_id ASC LIMIT 8),
o AS (SELECT 'odd' AS collection, CAST(vec_id AS VARCHAR) AS id, {d} AS distance
      FROM embeddings WHERE vec_id % 2 = 1
      ORDER BY distance ASC, vec_id ASC LIMIT 8),
u AS (SELECT *, 1.0 / (1.0 + distance) AS s FROM (SELECT * FROM e UNION ALL SELECT * FROM o)),
n AS (
  SELECT collection, id, distance,
         CASE WHEN max(s) OVER w = min(s) OVER w THEN 1.0
              ELSE (s - min(s) OVER w) / (max(s) OVER w - min(s) OVER w) END AS score
  FROM u WINDOW w AS (PARTITION BY collection)
)
SELECT collection, id, distance, score FROM n
ORDER BY score DESC, collection ASC, id ASC LIMIT 10
"""


def _graph_traverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> customer -> nation as a 2-hop typed edge graph."""
    from needle_spark.operators.graph import traverse

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    e1 = orders.filter(F.col("o_orderkey") <= 40).select(
        F.concat(F.lit("order_"), "o_orderkey").alias("src"),
        F.concat(F.lit("cust_"), "o_custkey").alias("dst"),
        F.lit("placed_by").alias("edge_type"),
    )
    e2 = customer.select(
        F.concat(F.lit("cust_"), "c_custkey").alias("src"),
        F.concat(F.lit("nation_"), "c_nationkey").alias("dst"),
        F.lit("in_nation").alias("edge_type"),
    )
    edges = e1.unionByName(e2)
    seeds = [f"order_{i}" for i in (1, 2, 3)]
    return traverse(edges, seeds, direction="out", max_hops=2)


_GRAPH_TRAVERSE_SQL = """
WITH seeds(id) AS (VALUES ('order_1'), ('order_2'), ('order_3')),
hop1 AS (
  SELECT DISTINCT 'cust_' || o_custkey AS id FROM orders
  WHERE 'order_' || o_orderkey IN (SELECT id FROM seeds) AND o_orderkey <= 40
),
hop2 AS (
  SELECT DISTINCT 'nation_' || c_nationkey AS id FROM customer
  WHERE 'cust_' || c_custkey IN (SELECT id FROM hop1)
)
SELECT id, 0 AS hop FROM seeds
UNION ALL SELECT id, 1 FROM hop1 WHERE id NOT IN (SELECT id FROM seeds)
UNION ALL SELECT id, 2 FROM hop2
  WHERE id NOT IN (SELECT id FROM seeds) AND id NOT IN (SELECT id FROM hop1)
"""


_TERM_OVERLAP_QUERY = "fast merge sort join"


def _term_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.rerank import term_overlap_scores

    docs = _t(spark, sf_dir, "documents")
    return term_overlap_scores(docs, _TERM_OVERLAP_QUERY, text_col="text").select(
        "doc_id", "rerank_score"
    )


def _term_overlap_sql() -> str:
    from needle_spark.functions.text import duckdb_tokenize_sql, tokenize_py

    terms = sorted(set(tokenize_py(_TERM_OVERLAP_QUERY)))
    qlist = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    toks = duckdb_tokenize_sql("text")
    return f"""
SELECT doc_id,
       CAST(len(list_filter({qlist}, t -> list_contains({toks}, t))) AS DOUBLE)
         / {float(len(terms))!r} AS rerank_score
FROM documents
"""


def _idf_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted term-overlap reranker (reranker.rs
    score_by_term_overlap :415-468) over the documents table."""
    from needle_spark.operators.rerank import term_overlap_idf_scores

    docs = _t(spark, sf_dir, "documents")
    return term_overlap_idf_scores(docs, _TERM_OVERLAP_QUERY, text_col="text").select(
        "doc_id", "rerank_score"
    )


def _idf_overlap_sql() -> str:
    q_terms = [t for t in _TERM_OVERLAP_QUERY.lower().split() if t]
    uniq = list(dict.fromkeys(q_terms))
    df_cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN list_contains(terms, '{t}') THEN 1 ELSE 0 END) OVER () "
        f"AS DOUBLE) AS df_{i}" for i, t in enumerate(uniq)
    )
    score_terms = " + ".join(
        f"CASE WHEN list_contains(terms, '{t}') "
        f"THEN ln((n + 1.0) / (df_{i} + 1.0)) + 1.0 ELSE 0.0 END"
        for i, t in enumerate(uniq)
    )
    return f"""
WITH dt AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   t -> len(t) > 0)) AS terms
  FROM documents
), st AS (
  SELECT doc_id, terms,
         CAST(count(*) OVER () AS DOUBLE) AS n,
         {df_cols}
  FROM dt
)
SELECT doc_id,
       (0.0 + {score_terms})
         / (sqrt(CAST(GREATEST(len(terms), 1) AS DOUBLE)) * {float(len(q_terms))!r})
         AS rerank_score
FROM st
"""


_MULTIQ = {"q0": "fast merge sort", "q1": "window batch", "q2": "query row data"}


def _bm25_search_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query BM25 as ONE explode+join job
    (hybrid.rs:270-430 index lifecycle + the batch search path)."""
    from needle_spark.operators.hybrid import Bm25Index

    docs = _t(spark, sf_dir, "documents")
    idx = Bm25Index(docs, id_col="doc_id", text_col="text")
    return idx.search_many(_MULTIQ, limit=10)


def _bm25_search_many_sql() -> str:
    from needle_spark.operators.hybrid import duckdb_bm25_sql

    parts = []
    for qid, text in sorted(_MULTIQ.items()):
        inner = duckdb_bm25_sql(text, table="documents", id_col="doc_id")
        parts.append(
            f"(SELECT '{qid}' AS query_id, doc_id, score FROM ({inner}) "
            f"ORDER BY round(score, 9) DESC, doc_id ASC LIMIT 10)"
        )
    return "\nUNION ALL\n".join(parts)


def _chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapped text chunking (text_collection.rs
    ChunkingStrategy::FixedSize) exploded to (doc, index, chunk)."""
    from needle_spark.operators.text_collection import chunk_expr

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(chunk_expr(F.col("text"), "fixed", chars=120, overlap=40))
        .alias("chunk_index", "chunk"),
    ).select("doc_id", F.col("chunk_index").cast("long").alias("chunk_index"), "chunk")


_CHUNK_FIXED_SQL = """
WITH starts AS (
  SELECT doc_id, text,
         unnest(range(0, GREATEST(length(text) - 1, 0) + 1, 80)) AS i
  FROM documents
), c AS (
  SELECT doc_id, i, trim(substring(text, CAST(i AS INT) + 1, 120)) AS chunk
  FROM starts
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT)
         AS chunk_index,
       chunk
FROM c WHERE length(chunk) > 0
"""


def _cross_agg_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-collection ScoreAggregation::MinScore
    (cross_collection.rs:56-68): overlapping collections, best match
    per id with the contributing-match count."""
    from needle_spark.operators.cross_collection import (
        aggregate_cross_scores,
        cross_collection_knn,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    a = emb.filter(F.col("vec_id") < 150).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    b = emb.filter(F.col("vec_id") >= 100).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    union = cross_collection_knn({"a": a, "b": b}, qv, k=10, per_collection_k=5)
    return aggregate_cross_scores(union, "min_score").select(
        "id", "distance", "matches")


def _cross_agg_best_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH a AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, {d} AS dist
  FROM embeddings WHERE vec_id < 150
  ORDER BY dist ASC, vec_id ASC LIMIT 5
), b AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, {d} AS dist
  FROM embeddings WHERE vec_id >= 100
  ORDER BY dist ASC, vec_id ASC LIMIT 5
), u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT id, min(dist) AS distance, CAST(count(*) AS BIGINT) AS matches
FROM u GROUP BY id
"""


def _graphrag_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized capitalized sentences per customer (the corpus text
    is all-lowercase, so entity extraction needs these to be
    non-trivial)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return cust.select(
        F.col("c_custkey").alias("doc_id"),
        F.concat(
            F.lit("Report for "), F.col("c_name"),
            F.lit(". Segment "), F.col("c_mktsegment"),
            F.lit(" ranked by Clerk today."),
        ).alias("text"),
    )


_GRAPHRAG_DOCS_SQL = """
SELECT c_custkey AS doc_id,
       'Report for ' || c_name || '. Segment ' || c_mktsegment ||
       ' ranked by Clerk today.' AS text
FROM customer WHERE c_custkey <= 200
"""


def _graphrag_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity extraction (graphrag.rs:188-218) as pure expressions."""
    from needle_spark.operators.graphrag import extract_entities

    return extract_entities(_graphrag_docs(spark, sf_dir))


def _graphrag_entities_sql() -> str:
    return f"""
WITH d AS ({_GRAPHRAG_DOCS_SQL}),
s AS (SELECT doc_id, unnest(string_split(text, '. ')) AS sent FROM d),
w AS (SELECT doc_id, unnest((string_split_regex(sent, '\\s+'))[2:]) AS word FROM s),
c AS (SELECT doc_id,
             regexp_replace(word, '^[^A-Za-z0-9]+|[^A-Za-z0-9]+$', '', 'g') AS name
      FROM w WHERE length(word) >= 2)
SELECT DISTINCT doc_id, 'entity_' || lower(name) AS entity_id, name
FROM c WHERE length(name) > 0 AND regexp_matches(name, '^[A-Z]')
"""


def _graphrag_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence relationship extraction (graphrag.rs:222-244)."""
    from needle_spark.operators.graphrag import (
        entity_cooccurrences,
        extract_entities,
    )

    ents = extract_entities(_graphrag_docs(spark, sf_dir))
    return entity_cooccurrences(ents)


def _graphrag_cooccur_sql() -> str:
    return f"""
WITH e AS ({_graphrag_entities_sql()})
SELECT a.entity_id AS src, b.entity_id AS dst,
       CAST(count(*) AS BIGINT) AS weight
FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.entity_id < b.entity_id
GROUP BY a.entity_id, b.entity_id
"""


_PR_SCALE = 10**15  # fixed-point 1.0 (graphrag.pagerank_fixed)


def _graphrag_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-reproducible PageRank over the co-occurrence graph
    (graphrag.rs compute_importance:686-723) — fixed-point integer
    arithmetic, so the distributed result is order-independent and
    oracle-checkable to the last bit."""
    from needle_spark.operators.graphrag import (
        entity_cooccurrences,
        extract_entities,
        pagerank_fixed,
    )

    ents = extract_entities(_graphrag_docs(spark, sf_dir))
    return pagerank_fixed(entity_cooccurrences(ents), iterations=10,
                          scale=_PR_SCALE)


def _graphrag_pagerank_sql(iterations: int = 10) -> str:
    """Unrolled fixed-point PageRank: one CTE per iteration, integer
    shares (`//`), damped as contrib*17//20 — mirrors pagerank_fixed
    exactly (order-independent BIGINT sums on both engines)."""
    pre = (_PR_SCALE * 3) // 20  # scale*(1-d) with d = 17/20
    parts = [f"""
WITH e AS ({_graphrag_cooccur_sql()}),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
adj AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d ON e.src = d.src),
pr0 AS (SELECT id, {_PR_SCALE} // nn.n AS imp FROM nodes CROSS JOIN nn)"""]
    for i in range(1, iterations + 1):
        parts.append(f""",
c{i} AS (SELECT a.dst AS id, CAST(sum(p.imp // a.deg) AS BIGINT) AS contrib
         FROM adj a JOIN pr{i - 1} p ON p.id = a.src GROUP BY a.dst),
pr{i} AS (SELECT nodes.id,
                 {pre} // nn.n + coalesce(c.contrib, 0) * 17 // 20 AS imp
          FROM nodes CROSS JOIN nn LEFT JOIN c{i} c ON nodes.id = c.id)""")
    parts.append(f"""
SELECT id, CAST(imp AS DOUBLE) / CAST({_PR_SCALE} AS DOUBLE) AS importance
FROM pr{iterations}""")
    return "".join(parts)


_GRAPH_WEIGHTED_START = "entity_building"
_GRAPH_WEIGHTED_HOPS = 3
_GRAPH_WEIGHTED_K = 10


def _graph_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-accumulated-weight BFS over the co-occurrence graph
    (graphrag.rs:625-686); path emitted as a '->' string so the oracle
    hash compares scalars."""
    from needle_spark.operators.graphrag import (
        entity_cooccurrences,
        extract_entities,
        weighted_traversal,
    )

    ents = extract_entities(_graphrag_docs(spark, sf_dir))
    edges = entity_cooccurrences(ents)
    out = weighted_traversal(edges, _GRAPH_WEIGHTED_START,
                             max_hops=_GRAPH_WEIGHTED_HOPS,
                             k=_GRAPH_WEIGHTED_K)
    return out.withColumn("path", F.array_join("path", "->"))


def _graph_weighted_sql() -> str:
    """Unrolled weighted traversal: per-hop frontier dedup (best acc,
    lexicographically-smallest path) + strictly-better-than-best
    visited check, scored acc/(1+hop) — mirrors weighted_traversal.
    All accs are products of BIGINT weights held in doubles, so every
    comparison is exact on both engines."""
    start, hops, k = (_GRAPH_WEIGHTED_START, _GRAPH_WEIGHTED_HOPS,
                      _GRAPH_WEIGHTED_K)
    parts = [f"""
WITH e AS ({_graphrag_cooccur_sql()}),
f0 AS (SELECT '{start}' AS id, CAST(1 AS DOUBLE) AS acc,
              ['{start}'] AS path),
b0 AS (SELECT id, acc FROM f0)"""]
    for h in range(1, hops + 1):
        p = h - 1
        parts.append(f""",
n{h} AS (SELECT e.dst AS id, f.acc * e.weight AS acc,
                list_append(f.path, e.dst) AS path
         FROM e JOIN f{p} f ON e.src = f.id),
n{h}b AS (SELECT id, acc, path FROM
          (SELECT id, acc, path, row_number() OVER
             (PARTITION BY id ORDER BY acc DESC, path ASC) AS rn
           FROM n{h}) WHERE rn = 1),
f{h} AS (SELECT n.id, n.acc, n.path
         FROM n{h}b n LEFT JOIN b{p} prev ON n.id = prev.id
         WHERE prev.acc IS NULL OR n.acc > prev.acc),
b{h} AS (SELECT id, max(acc) AS acc FROM
         (SELECT id, acc FROM b{p} UNION ALL
          SELECT id, acc FROM f{h}) GROUP BY id),
s{h} AS (SELECT id, acc / CAST({h + 1} AS DOUBLE) AS graph_score,
                CAST({h} AS INTEGER) AS hop, path FROM f{h})""")
    reached = " UNION ALL ".join(
        f"SELECT * FROM s{h}" for h in range(1, hops + 1))
    parts.append(f""",
r AS ({reached}),
rb AS (SELECT id, graph_score, hop, path, row_number() OVER
         (PARTITION BY id ORDER BY graph_score DESC, hop ASC) AS rn
       FROM r)
SELECT id, graph_score, hop, array_to_string(path, '->') AS path
FROM rb WHERE rn = 1
ORDER BY graph_score DESC, id ASC LIMIT {k}""")
    return "".join(parts)


def _collection_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-level VCS diff (vcs.snapshot_diff) between the embeddings
    table and a deterministically mutated twin: vec_id%13 deleted,
    vec_id%7 vector-shifted, vec_id%11 re-inserted under +100000."""
    from needle_spark.vcs import snapshot_diff

    base = _t(spark, sf_dir, "embeddings")
    shifted = F.transform(
        "embedding", lambda x: (x.cast("double") + 1.0).cast("float")
    )
    target = (
        base.filter(F.col("vec_id") % 13 != 0)
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") % 7 == 0, shifted)
            .otherwise(F.col("embedding")),
        )
        .unionByName(
            base.filter(F.col("vec_id") % 11 == 0)
            .withColumn("vec_id", F.col("vec_id") + 100000)
        )
    )
    return snapshot_diff(base, target, id_col="vec_id",
                         vector_col="embedding")


def _collection_diff_sql() -> str:
    sim = duckdb_distance_sql("cosine", "b.embedding", "t.embedding")
    return f"""
WITH tgt AS (
  SELECT vec_id,
         CASE WHEN vec_id % 7 = 0
              THEN list_transform(embedding,
                                  x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))
              ELSE embedding END AS embedding,
         label
  FROM embeddings WHERE vec_id % 13 <> 0
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding, label
  FROM embeddings WHERE vec_id % 11 = 0
)
SELECT CAST(COALESCE(b.vec_id, t.vec_id) AS VARCHAR) AS vector_id,
       CASE WHEN b.vec_id IS NULL THEN 'added'
            WHEN t.vec_id IS NULL THEN 'deleted'
            ELSE 'modified' END AS change_type,
       CASE WHEN b.vec_id IS NOT NULL AND t.vec_id IS NOT NULL
            THEN 1.0 - ({sim}) END AS similarity
FROM embeddings b FULL OUTER JOIN tgt t ON b.vec_id = t.vec_id
WHERE b.vec_id IS NULL OR t.vec_id IS NULL
   OR b.embedding <> t.embedding OR b.label <> t.label
"""


def _lineage_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic CDC log over embeddings: every id
    inserted, vec_id%7 upserted later, vec_id%13 deleted last —
    disjoint sequence ranges exactly like the catalog's composite
    per-op sequencing."""
    ids = _t(spark, sf_dir, "embeddings").select("vec_id")

    def ev(df, seq_base, ts_base, etype):
        return df.select(
            (F.lit(seq_base) + F.col("vec_id")).cast("long").alias("sequence"),
            (F.lit(ts_base) + F.col("vec_id")).cast("long").alias("timestamp_ms"),
            F.lit(etype).alias("event_type"),
            F.col("vec_id").cast("string").alias("vector_id"),
            F.lit(None).cast("string").alias("metadata"),
        )

    return (
        ev(ids, 0, 1000, "insert")
        .unionByName(ev(ids.filter(F.col("vec_id") % 7 == 0),
                        100000, 2000000, "upsert"))
        .unionByName(ev(ids.filter(F.col("vec_id") % 13 == 0),
                        200000, 3000000, "delete"))
    )


def _vector_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.lineage import lineage_from_cdc

    return lineage_from_cdc(_lineage_events(spark, sf_dir))


def _vector_lineage_sql() -> str:
    from needle_spark.operators.lineage import duckdb_lineage_sql

    ev = """(
  SELECT CAST(vec_id AS BIGINT) AS sequence,
         CAST(1000 + vec_id AS BIGINT) AS timestamp_ms,
         'insert' AS event_type, CAST(vec_id AS VARCHAR) AS vector_id
  FROM embeddings
  UNION ALL
  SELECT CAST(100000 + vec_id AS BIGINT), CAST(2000000 + vec_id AS BIGINT),
         'upsert', CAST(vec_id AS VARCHAR)
  FROM embeddings WHERE vec_id % 7 = 0
  UNION ALL
  SELECT CAST(200000 + vec_id AS BIGINT), CAST(3000000 + vec_id AS BIGINT),
         'delete', CAST(vec_id AS VARCHAR)
  FROM embeddings WHERE vec_id % 13 = 0
) ev"""
    return duckdb_lineage_sql(ev)


def _lineage_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage-graph impact: transitive descendants (with hop depth) of
    vector '1' over a deterministic derived-from DAG (every vec_id
    derives from vec_id DIV 2 — a binary tree over embeddings)."""
    from needle_spark.operators.lineage import lineage_descendants

    edges = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= 1)
        .select(
            F.col("vec_id").cast("string").alias("child"),
            F.expr("CAST(vec_id DIV 2 AS STRING)").alias("parent"),
        )
    )
    return lineage_descendants(edges, "1", max_depth=10)


def _lineage_impact_sql() -> str:
    from needle_spark.operators.lineage import duckdb_descendants_sql

    edges = ("(SELECT CAST(vec_id AS VARCHAR) AS child, "
             "CAST(vec_id // 2 AS VARCHAR) AS parent "
             "FROM embeddings WHERE vec_id >= 1)")
    return duckdb_descendants_sql(edges, "1", max_depth=10)


def _numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over orders.o_totalprice (the planner's
    selectivity statistics, plans/planner.py numeric_histogram)."""
    from needle_spark.plans.planner import numeric_histogram

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("price"))
    lo, hi, counts = numeric_histogram(orders, "price", buckets=10)
    return spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(counts)],
        "bucket int, cnt long",
    )


def _numeric_histogram_sql() -> str:
    return """
WITH b AS (SELECT min(CAST(o_totalprice AS DOUBLE)) AS lo,
                  max(CAST(o_totalprice AS DOUBLE)) AS hi FROM orders),
assigned AS (
  SELECT CAST(least(floor((CAST(o_totalprice AS DOUBLE) - b.lo)
                          / ((b.hi - b.lo) / 10)), 9) AS INT) AS bucket
  FROM orders, b
),
counts AS (SELECT bucket, count(*) AS cnt FROM assigned GROUP BY bucket)
SELECT CAST(r.i AS INT) AS bucket,
       CAST(COALESCE(counts.cnt, 0) AS BIGINT) AS cnt
FROM (SELECT unnest(range(10)) AS i) r LEFT JOIN counts ON counts.bucket = r.i
"""


def _score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three score-normalization modes (min_max / z_score /
    softmax, collection/search.rs:94-122) over the BM25 result set."""
    from needle_spark.operators.hybrid import bm25_scores, normalize_scores

    docs = _t(spark, sf_dir, "documents")
    s = bm25_scores(docs, _BM25_QUERY, id_col="doc_id", text_col="text")
    s = normalize_scores(s, "min_max", out_col="score_minmax")
    s = normalize_scores(s, "z_score", out_col="score_z")
    s = normalize_scores(s, "softmax", out_col="score_softmax")
    return s.select("doc_id", "score_minmax", "score_z", "score_softmax")


def _score_normalize_sql() -> str:
    from needle_spark.operators.hybrid import duckdb_bm25_sql

    base = duckdb_bm25_sql(_BM25_QUERY, table="documents", id_col="doc_id")
    return f"""
WITH s AS ({base}),
st AS (SELECT min(score) AS mn, max(score) AS mx,
              avg(score) AS mu, stddev_pop(score) AS sd FROM s),
sm AS (SELECT sum(exp(score - st.mx)) AS se FROM s, st)
SELECT doc_id,
       CASE WHEN st.mx = st.mn THEN 1.0
            ELSE (score - st.mn) / (st.mx - st.mn) END AS score_minmax,
       CASE WHEN st.sd = 0.0 THEN 0.0
            ELSE (score - st.mu) / st.sd END AS score_z,
       exp(score - st.mx) / sm.se AS score_softmax
FROM s, st, sm
"""


def _drift_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the two halves of the embeddings
    table: centroid cosine shift, total-variance ratio, exact
    two-sample KS over magnitudes (observe/drift.rs semantics)."""
    from needle_spark.operators.drift import drift_metrics_df

    emb = _t(spark, sf_dir, "embeddings")
    return drift_metrics_df(
        emb.filter(F.col("vec_id") < 250),
        emb.filter(F.col("vec_id") >= 250),
        vector_col="embedding",
    )


def _drift_metrics_sql() -> str:
    mag = ("sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
           "list_transform(embedding, x -> CAST(x AS DOUBLE) * "
           "CAST(x AS DOUBLE))), (acc, x) -> acc + x))")
    return f"""
WITH e AS (
  SELECT CASE WHEN vec_id < 250 THEN 'b' ELSE 'c' END AS side, embedding
  FROM embeddings
),
n AS (
  SELECT CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS nc
  FROM e
),
idx AS (
  SELECT unnest(range((SELECT max(len(embedding)) FROM embeddings))) AS i
),
dims AS (
  SELECT side, idx.i AS dim,
         avg(CAST(embedding[idx.i + 1] AS DOUBLE)) AS m,
         var_samp(CAST(embedding[idx.i + 1] AS DOUBLE)) AS v
  FROM e, idx
  GROUP BY side, idx.i
),
cen AS (
  SELECT sum(b.m * c.m) AS dot,
         sqrt(sum(b.m * b.m)) AS normb, sqrt(sum(c.m * c.m)) AS normc,
         sum(b.v) AS vb, sum(c.v) AS vc
  FROM (SELECT * FROM dims WHERE side = 'b') b
  JOIN (SELECT * FROM dims WHERE side = 'c') c USING (dim)
),
mags AS (SELECT side, {mag} AS mag FROM e),
grouped AS (
  SELECT mag,
         sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb,
         sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc
  FROM mags GROUP BY mag
),
cdf AS (
  SELECT abs(sum(cb) OVER w / (SELECT CAST(nb AS DOUBLE) FROM n)
           - sum(cc) OVER w / (SELECT CAST(nc AS DOUBLE) FROM n)) AS d
  FROM grouped
  WINDOW w AS (ORDER BY mag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CASE WHEN cen.normb = 0 OR cen.normc = 0 THEN 1.0
       ELSE 1.0 - cen.dot / (cen.normb * cen.normc) END AS centroid_shift,
       CASE WHEN cen.vb > 0 THEN cen.vc / cen.vb ELSE 1.0 END AS variance_ratio,
       (SELECT max(d) FROM cdf) AS ks_statistic,
       n.nb AS n_baseline, n.nc AS n_current
FROM cen, n
"""


def _knn_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-based outlier scores: every vector's average cosine
    distance to its 5 nearest neighbors (observe/anomaly.rs
    DistanceOutlierDetector)."""
    from needle_spark.operators.anomaly import avg_knn_distance

    emb = _t(spark, sf_dir, "embeddings")
    return avg_knn_distance(emb, k=5, metric="cosine",
                            vector_col="embedding", id_col="vec_id")


def _knn_outlier_scores_sql() -> str:
    dist = duckdb_distance_sql("cosine", "a.embedding", "b.embedding")
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, {dist} AS distance
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qid, distance,
         row_number() OVER (PARTITION BY qid ORDER BY distance, nid) AS rn
  FROM pairs
)
SELECT qid AS vec_id, avg(distance) AS avg_knn_distance
FROM ranked WHERE rn <= 5 GROUP BY qid
"""


def _schema_adapted_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution end-to-end: embeddings land in a real collection,
    the registry applies add_field + widen_field + change_dimension
    (truncate 64 -> 16), and the adapted read reshapes rows written
    under the ORIGINAL schema — all scan expressions."""
    import tempfile

    from needle_spark.catalog import Collection

    path = tempfile.mkdtemp(prefix="needle_schema_q_") + "/emb"
    coll = Collection.create(
        spark, path, dims=64, id_col="vec_id", vector_col="embedding",
        schema="vec_id bigint, embedding array<float>, label int",
    )
    coll.insert(_t(spark, sf_dir, "embeddings"), now_ms=1000)
    reg = coll.schema_registry()
    reg.apply_change({"kind": "add_field", "name": "quality",
                      "dtype": "double", "default": 0.5})
    reg.apply_change({"kind": "widen_field", "name": "label",
                      "to_dtype": "bigint"})
    reg.apply_change({"kind": "change_dimension", "to": 16,
                      "strategy": "truncate"})
    adapted = reg.adapted_df()
    return adapted.select(
        "vec_id", _fx6_join(F.col("embedding")).alias("embedding_fx6"),
        "label", "quality")


def _schema_adapted_read_sql() -> str:
    return f"""
SELECT vec_id,
       {_fx6_join_sql("embedding[1:16]")} AS embedding_fx6,
       CAST(label AS BIGINT) AS label,
       CAST(0.5 AS DOUBLE) AS quality
FROM embeddings
"""


# ---------------------------------------------------------------- RAG --
# The synthetic docs corpus has no punctuation, so the sentence/paragraph
# chunking queries derive a deterministically punctuated twin of each
# document (8-word sentences joined by '. ' / blank lines) with the SAME
# list expressions in both engines, then exercise the real operator.

def _ptext_expr(sep: str) -> F.Column:
    words = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    starts = F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(8))
    sents8 = F.transform(
        starts, lambda i: F.array_join(F.slice(words, i + 1, 8), " "))
    return F.array_join(sents8, sep)


def _chunk_semantic_fused_udf():
    """ONE Arrow-batched kernel fusing the 8-word regroup (_ptext_expr)
    with the semantic greedy pack at (200, 50) — r12.  The previous
    shape ran TWO interpreted Catalyst stages per row (regexp + HOF
    slice/join regroup, then the per-sentence left fold that
    re-concatenates the running chunk); both are loops Python runs once
    per row with C regex scans.  Parity is pinned three ways: re.ASCII
    makes Python's \\S identical to Java's default ([^ \\t\\n\\x0B\\f\\r]);
    the sentence regex and ASCII-space trim parity are proven by the
    chunk_semantic_arrow tests; and tests/test_entry_chunk_semantic.py
    asserts exceptAll == 0 against the old expression pipeline on the
    full corpus.  Measured at sf0.1: 0.95 s -> 0.39 s."""
    import re

    wpat = re.compile(r"\S+", re.ASCII)
    spat = re.compile(r"[^.!?]+[.!?]?")

    @F.pandas_udf("array<string>")
    def _fused(col: pd.Series) -> pd.Series:
        out = []
        for t in col:
            if t is None:
                out.append(None)
                continue
            words = wpat.findall(t)
            groups = [" ".join(words[i:i + 8])
                      for i in range(0, max(len(words) - 1, 0) + 1, 8)]
            p = ". ".join(groups) + "."
            chunks: list[str] = []
            cur = ""
            for s in spat.findall(p):
                s = s.strip(" ")
                if not s:
                    continue
                if len(cur) + len(s) > 200 and len(cur) >= 50:
                    chunks.append(cur.strip(" "))
                    cur = s
                else:
                    cur = cur + " " + s if cur else s
            tail = cur.strip(" ")
            if tail:
                chunks.append(tail)
            out.append(chunks)
        return pd.Series(out)

    return _fused


def _chunk_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic sentence-boundary chunking (rag/pipeline.rs:379-419),
    map-only: one fused Arrow kernel (see _chunk_semantic_fused_udf)."""
    docs = _t(spark, sf_dir, "documents")
    fused = _chunk_semantic_fused_udf()
    return (docs.select("doc_id",
                        F.posexplode(fused(F.col("text")))
                        .alias("chunk_index", "chunk"))
            .select("doc_id",
                    F.col("chunk_index").cast("long").alias("chunk_index"),
                    "chunk"))


_CHUNK_SEMANTIC_SQL = r"""
WITH RECURSIVE
w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents),
p AS (SELECT doc_id,
        array_to_string(
          list_transform(range(0, greatest(len(words)-1, 0)+1, 8),
                         s -> array_to_string(words[s+1:s+8], ' ')),
          '. ') || '.' AS ptext
      FROM w),
sl AS (SELECT doc_id,
         list_filter(list_transform(regexp_extract_all(ptext, '[^.!?]+[.!?]?'),
                                    x -> trim(x)),
                     x -> length(x) > 0) AS sents
       FROM p),
sents AS (SELECT doc_id, i, sents[i] AS sent
          FROM sl, unnest(range(1, len(sents)+1)) AS t(i)),
rec AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS i, '' AS cur, NULL::VARCHAR AS emitted
  FROM (SELECT DISTINCT doc_id FROM sents)
  UNION ALL
  SELECT r.doc_id, r.i + 1,
    CASE WHEN length(r.cur) + length(s.sent) > 200 AND length(r.cur) >= 50
         THEN s.sent
         WHEN length(r.cur) = 0 THEN s.sent
         ELSE r.cur || ' ' || s.sent END,
    CASE WHEN length(r.cur) + length(s.sent) > 200 AND length(r.cur) >= 50
         THEN trim(r.cur) END
  FROM rec r JOIN sents s ON s.doc_id = r.doc_id AND s.i = r.i + 1
),
mx AS (SELECT doc_id, max(i) AS n FROM rec GROUP BY doc_id),
chunks AS (
  SELECT doc_id, i AS ord, emitted AS chunk FROM rec WHERE emitted IS NOT NULL
  UNION ALL
  SELECT r.doc_id, r.i + 1000000000, trim(r.cur)
  FROM rec r JOIN mx ON mx.doc_id = r.doc_id AND r.i = mx.n
  WHERE length(trim(r.cur)) > 0
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS BIGINT)
         AS chunk_index,
       chunk
FROM chunks
"""


def _chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-count sliding window (rag/pipeline.rs:347-377)."""
    from needle_spark.operators.rag import chunk_sliding_expr

    docs = _t(spark, sf_dir, "documents")
    return (docs.select(
        "doc_id",
        F.posexplode(chunk_sliding_expr(F.col("text"), 16, 8))
         .alias("chunk_index", "chunk"))
        .select("doc_id",
                F.col("chunk_index").cast("long").alias("chunk_index"),
                "chunk"))


_CHUNK_SLIDING_SQL = r"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words
           FROM documents WHERE length(trim(text)) > 0),
st AS (SELECT doc_id, words,
         list_filter(range(0, greatest(len(words)-1, 0)+1, 8),
                     i -> i = 0 OR i - 8 + 16 < len(words)) AS starts
       FROM w),
c AS (SELECT doc_id, s, array_to_string(words[s+1:s+16], ' ') AS chunk
      FROM st, unnest(starts) AS t(s))
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS BIGINT)
         AS chunk_index,
       chunk
FROM c
"""


def _chunk_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-group chunking (rag/pipeline.rs:428-441)."""
    from needle_spark.operators.rag import chunk_paragraphs_expr

    docs = _t(spark, sf_dir, "documents")
    return (docs.withColumn("__p", _ptext_expr("\n\n"))
            .select("doc_id",
                    F.posexplode(chunk_paragraphs_expr(F.col("__p"), 3))
                    .alias("chunk_index", "chunk"))
            .select("doc_id",
                    F.col("chunk_index").cast("long").alias("chunk_index"),
                    "chunk"))


_CHUNK_PARAGRAPHS_SQL = r"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS words FROM documents),
p AS (SELECT doc_id,
        list_transform(range(0, greatest(len(words)-1, 0)+1, 8),
                       s -> array_to_string(words[s+1:s+8], ' ')) AS paras
      FROM w),
g AS (SELECT doc_id, s,
        array_to_string(paras[s+1:s+3], chr(10) || chr(10)) AS chunk
      FROM p, unnest(range(0, greatest(len(paras)-1, 0)+1, 3)) AS t(s))
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS BIGINT)
         AS chunk_index,
       chunk
FROM g WHERE length(trim(chunk)) > 0
"""


def _markdown_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown document loading (rag/chunking.rs:43-79): heading strip,
    title + headings extraction over a derived markdown corpus."""
    from needle_spark.operators.rag import load_markdown

    docs = _t(spark, sf_dir, "documents")
    md = F.concat(F.lit("# Doc "), F.col("doc_id").cast("string"),
                  F.lit("\n## "), F.col("source"), F.lit("\n"), F.col("text"))
    return load_markdown(docs.select("doc_id", md.alias("text"))).select(
        "doc_id", "title",
        F.array_join(F.col("headings"), "\x1f").alias("headings"), "text")


_MARKDOWN_LOAD_SQL = r"""
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(31) || source AS headings,
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || source || chr(10) || text
         AS text
FROM documents
"""


def _rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ScorePriority context selection (rag/pipeline.rs:603-624): the
    greedy budget cut is a window cumulative-sum prefix."""
    from needle_spark.operators.rag import select_context_chunks

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    qv = _query_vec(spark, sf_dir, 0)
    hits = knn(emb.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("vector")), qv, k=9)
    joined = hits.join(docs, hits["id"] == docs["doc_id"]).select(
        F.col("id"), F.col("text").alias("chunk"),
        (F.lit(1.0) - F.col("distance")).alias("score"))
    sel = select_context_chunks(joined, max_context_tokens=150)
    return sel.select("id",
                      F.col("display_idx").cast("long").alias("display_idx"),
                      F.col("cum_chars").cast("long").alias("cum_chars"),
                      "score")


def _rag_context_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH hits AS (
  SELECT vec_id AS id, {d} AS dist
  FROM embeddings ORDER BY dist ASC, vec_id ASC LIMIT 9),
j AS (SELECT h.id, dd.text AS chunk, 1.0 - h.dist AS score
      FROM hits h JOIN documents dd ON dd.doc_id = h.id),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS BIGINT)
        AS display_idx FROM j),
c AS (SELECT *, CAST(sum(length(chunk) + length(CAST(display_idx AS VARCHAR)) + 5)
        OVER (ORDER BY display_idx ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS cum_chars
      FROM r)
SELECT id, display_idx, cum_chars, score
FROM c WHERE display_idx = 1 OR cum_chars <= 600
"""


def _multiquery_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query RRF fusion (rag/mod.rs:308-316, pipeline.rs:840-907):
    all expansions ride one fused batch-kNN broadcast join."""
    from needle_spark.operators.rag import multi_query_search

    emb = _t(spark, sf_dir, "embeddings")
    vecs = [_query_vec(spark, sf_dir, i) for i in range(3)]
    return multi_query_search(
        emb.select(F.col("vec_id").alias("id"),
                   F.col("embedding").alias("vector")),
        vecs, k=10, merge="rrf")


def _multiquery_rrf_sql() -> str:
    parts = []
    for i in range(3):
        di = duckdb_distance_sql(
            "cosine", "embedding",
            f"(SELECT embedding FROM embeddings WHERE vec_id = {i})")
        parts.append(f"""
q{i} AS (SELECT vec_id AS id, {di} AS dist,
         CAST(row_number() OVER (ORDER BY {di} ASC, vec_id ASC) AS BIGINT)
           AS rank
       FROM embeddings ORDER BY dist ASC, vec_id ASC LIMIT 10)""")
    return "WITH " + ",".join(parts) + """
, u AS (SELECT * FROM q0 UNION ALL SELECT * FROM q1 UNION ALL SELECT * FROM q2)
SELECT id, sum(1.0 / (60.0 + rank)) AS rrf_score, min(dist) AS best_distance
FROM u GROUP BY id
ORDER BY rrf_score DESC, id ASC LIMIT 10
"""


def _audio_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio codec proof: PCM16 RIFF/WAV blobs built
    from document text bytes, decoded by the stdlib wave codec inside
    the Arrow pass, per-clip sample stats out.  The DuckDB twin
    reconstructs the little-endian signed samples from the same bytes
    and folds RMS/peak arithmetically."""
    import struct as _struct

    from needle_spark.operators.multimodal import audio_features

    data_len = 128  # 64 samples x int16
    hdr = (b"RIFF" + _struct.pack("<I", 36 + data_len) + b"WAVE" +
           b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16) +
           b"data" + _struct.pack("<I", data_len))
    docs = _t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 128)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("audio/wav").alias("mime"),
        F.concat(F.lit(hdr),
                 F.substring(F.col("text"), 1, 128).cast("binary"))
        .alias("data"))
    feats = audio_features(media)
    return feats.select(F.col("media_id").cast("long").alias("doc_id"),
                        "n_samples", "rms", "peak")


_AUDIO_WAV_STATS_SQL = """
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, 64), i ->
           (CASE WHEN ascii(substr(text, 2*i + 2, 1)) >= 128
                 THEN ascii(substr(text, 2*i + 1, 1))
                      + 256 * ascii(substr(text, 2*i + 2, 1)) - 65536
                 ELSE ascii(substr(text, 2*i + 1, 1))
                      + 256 * ascii(substr(text, 2*i + 2, 1)) END)
           / 32768.0) AS x
  FROM documents WHERE n_chars >= 128
)
SELECT doc_id,
       CAST(64 AS BIGINT) AS n_samples,
       sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(x, v -> v * v)), (a, b) -> a + b) / 64.0) AS rms,
       list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(x, v -> abs(v))),
            (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS peak
FROM s
"""


def _image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image codec proof: P5 netpbm blobs constructed
    from document text bytes, decoded by the stdlib codec, 8x8
    average-hashed (operators/multimodal.py).  The DuckDB twin computes
    the identical hash arithmetically from the same bytes — decode +
    resize + threshold + bit packing all verified."""
    from needle_spark.operators.multimodal import image_transform_features

    docs = _t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 64)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image/x-portable-graymap").alias("mime"),
        F.concat(F.lit(b"P5 8 8 255\n"),
                 F.substring(F.col("text"), 1, 64).cast("binary"))
        .alias("data"))
    feats = image_transform_features(media, resize_to=(8, 8), embed_size=8)
    return feats.select(F.col("media_id").cast("long").alias("doc_id"),
                        "ahash", "resized_mean")


_IMAGE_AHASH_SQL = """
WITH px AS (
  SELECT doc_id,
         list_transform(range(1, 65),
                        i -> CAST(ascii(substr(text, i, 1)) AS DOUBLE)) AS p
  FROM documents WHERE n_chars >= 64
), m AS (
  SELECT doc_id, p,
         list_reduce(list_prepend(0.0::DOUBLE, p), (a, b) -> a + b) / 64.0
           AS mean_px
  FROM px
), bits AS (
  SELECT doc_id, mean_px,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
           list_transform(range(1, 65),
             i -> CASE WHEN p[i] > mean_px
                  THEN CAST(1 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)),
           (acc, b) -> acc * 2 + b) AS uhash
  FROM m
)
SELECT doc_id,
       CAST(CASE WHEN uhash >= CAST('9223372036854775808' AS HUGEINT)
                 THEN uhash - CAST('18446744073709551616' AS HUGEINT)
                 ELSE uhash END AS BIGINT) AS ahash,
       mean_px AS resized_mean
FROM bits
"""


def _dashboard_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-pattern rollup (experimental/analytics.rs:178-230,
    :591-610): events map to (collection, operation, filter-shape)
    pattern keys; occurrences + latency stats aggregate per pattern."""
    from needle_spark.plans.analytics_dashboard import (
        AnalyticsConfig,
        AnalyticsDashboard,
    )

    ev = _t(spark, sf_dir, "events")
    frame = ev.select(
        F.col("event_type").alias("collection"),
        F.when(F.col("event_type").isin("click", "view"), "search")
         .otherwise("insert").alias("operation"),
        (F.col("value") * 10.0).alias("latency_ms"),
        F.lit(1).alias("result_count"), F.lit(5).alias("k"),
        (F.col("user_id") % 2 == 0).alias("has_filter"),
        F.lit(None).cast("int").alias("filter_complexity"),
        F.lit(0).cast("long").alias("ts"))
    dash = AnalyticsDashboard(spark, AnalyticsConfig())
    return dash._patterns(frame).select(
        "pattern_id", F.col("occurrences").cast("long").alias("occurrences"),
        "avg_latency_ms", "max_latency_ms", "avg_results")


_DASHBOARD_PATTERNS_SQL = """
WITH frame AS (
  SELECT event_type AS collection,
         CASE WHEN event_type IN ('click','view') THEN 'search'
              ELSE 'insert' END AS operation,
         value * 10.0 AS latency_ms,
         CASE WHEN user_id % 2 = 0 THEN 'filtered' ELSE 'plain' END AS fshape
  FROM events
)
SELECT collection || '|' || operation || '|' || fshape AS pattern_id,
       CAST(count(*) AS BIGINT) AS occurrences,
       avg(latency_ms) AS avg_latency_ms,
       max(latency_ms) AS max_latency_ms,
       avg(1.0) AS avg_results
FROM frame GROUP BY 1
"""


def _kg_context_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knowledge-graph context-boosted search
    (knowledge_graph.rs:388-438): cosine similarity blended with a
    graph score — 1.0 for entities reachable from the anchor within 2
    hops (broadcast-frontier BFS; recursive-CTE twin), degree
    centrality otherwise.  Edges derived deterministically: chains
    i -> i+1 -> i+2 from every fifth id."""
    from needle_spark.operators.knowledge_graph import KnowledgeGraph

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    ents = emb.select(F.col("vec_id").cast("string").alias("id"),
                      F.concat(F.lit("l"), F.col("label").cast("string"))
                      .alias("entity_type"),
                      F.col("embedding").alias("vector"))
    base = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    rels = (base.select(F.col("vec_id").cast("string").alias("src"),
                        (F.col("vec_id") + 1).cast("string").alias("dst"),
                        F.lit("next").alias("edge_type"))
            .unionByName(base.select(
                (F.col("vec_id") + 1).cast("string").alias("src"),
                (F.col("vec_id") + 2).cast("string").alias("dst"),
                F.lit("next").alias("edge_type"))))
    kg = KnowledgeGraph(ents, rels)
    got = kg.search_with_context(qv, k=15, anchors=["0"])
    return got.select(F.col("id").cast("long").alias("id"), "similarity",
                      "graph_score", "combined_score")


def _kg_context_search_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH RECURSIVE
edges AS (
  SELECT CAST(vec_id AS VARCHAR) AS src,
         CAST(vec_id + 1 AS VARCHAR) AS dst
  FROM embeddings WHERE vec_id % 5 = 0
  UNION ALL
  SELECT CAST(vec_id + 1 AS VARCHAR), CAST(vec_id + 2 AS VARCHAR)
  FROM embeddings WHERE vec_id % 5 = 0
), und AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst, src FROM edges
), reach AS (
  SELECT '0' AS nid, 0 AS hop
  UNION ALL
  SELECT u.b, r.hop + 1 FROM reach r JOIN und u ON u.a = r.nid
  WHERE r.hop < 2
), reachable AS (SELECT DISTINCT nid FROM reach),
deg AS (
  SELECT nid, CAST(count(*) AS DOUBLE) /
         (SELECT count(*) FROM embeddings) AS degree
  FROM (SELECT a AS nid FROM und) GROUP BY nid
),
scored AS (
  SELECT CAST(e.vec_id AS VARCHAR) AS id,
         1.0 - ({d}) AS similarity,
         CASE WHEN rch.nid IS NOT NULL THEN 1.0
              ELSE least(coalesce(deg.degree, 0.0), 1.0) END AS graph_score
  FROM embeddings e
  LEFT JOIN reachable rch ON rch.nid = CAST(e.vec_id AS VARCHAR)
  LEFT JOIN deg ON deg.nid = CAST(e.vec_id AS VARCHAR)
)
SELECT CAST(id AS BIGINT) AS id, similarity, graph_score,
       0.7 * similarity + 0.3 * graph_score AS combined_score
FROM scored
ORDER BY combined_score DESC, CAST(id AS VARCHAR) ASC LIMIT 15
"""


def _mm_fusion_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late multi-modal fusion (multimodal_fusion.rs:173-186
    WeightedSum): per-modality distances and the fused score compute in
    ONE scan expression; missing modalities renormalize over the
    present weights.  Modalities derived deterministically: the
    embedding plus its reverse (odd ids lack the second modality)."""
    from needle_spark.operators.namespaces import (
        NamespaceSchema,
        VectorFieldDef,
        multimodal_fusion_search,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    docs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("text_vec"),
        F.when(F.col("vec_id") % 2 == 0, F.reverse(F.col("embedding")))
         .alias("image_vec"))
    schema = (NamespaceSchema("mm")
              .add_field(VectorFieldDef("text_vec", 64, "cosine"))
              .add_field(VectorFieldDef("image_vec", 64, "cosine")))
    got = multimodal_fusion_search(
        docs, schema,
        [("text_vec", qv, 2.0), ("image_vec", list(reversed(qv)), 1.0)],
        k=15, strategy="weighted_sum")
    return got.select(
        "id", "score",
        F.array_join(F.col("modalities_present"), ",")
        .alias("modalities_present"))


def _mm_fusion_weighted_sql() -> str:
    d_text = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    d_img = duckdb_distance_sql(
        "cosine", "list_reverse(embedding)",
        "(SELECT list_reverse(embedding) FROM embeddings WHERE vec_id = 0)")
    return f"""
WITH scored AS (
  SELECT vec_id AS id,
         {d_text} AS dt,
         CASE WHEN vec_id % 2 = 0 THEN {d_img} END AS di
  FROM embeddings
), fused AS (
  SELECT id,
         CASE WHEN di IS NULL THEN dt
              ELSE (2.0 * dt + 1.0 * di) / 3.0 END AS score,
         CASE WHEN di IS NULL THEN 'text_vec'
              ELSE 'text_vec,image_vec' END AS modalities_present
  FROM scored
)
SELECT id, score, modalities_present
FROM fused ORDER BY score ASC, id ASC LIMIT 15
"""


_MEM_NOW = 720_000_000  # fixed epoch seconds for deterministic ages


def _memory_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agentic memory recall scoring (agentic_memory.rs:452-523):
    relevance = 0.7*similarity + 0.3*decayed importance.  Memories are
    derived deterministically from embeddings (importance from vec_id,
    integer ages); power-law decay keeps every weight an exact
    rational, so the blend is bit-reproducible across engines."""
    from needle_spark.operators.agent_memory import recall_scores

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    mems = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"),
        (((F.col("vec_id") % 10) + 1) / 10.0).alias("importance"),
        (F.lit(_MEM_NOW) - (F.col("vec_id") % 200) * 3600)
        .cast("long").alias("created_at"))
    scored = recall_scores(mems, qv, _MEM_NOW, decay="power_law",
                           decay_params={"exponent": 1.0},
                           recall_threshold=-1.0)
    return (scored.select("id", "similarity", "effective_importance",
                          "relevance")
            .orderBy(F.col("relevance").desc(), F.col("id").asc())
            .limit(20))


def _memory_recall_sql() -> str:
    d = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return f"""
WITH mems AS (
  SELECT vec_id AS id,
         ((vec_id % 10) + 1) / 10.0 AS importance,
         CAST(vec_id % 200 AS DOUBLE) AS age_hours,
         1.0 - ({d}) AS similarity
  FROM embeddings
)
SELECT id, similarity,
       importance / (1.0 + age_hours) AS effective_importance,
       0.7 * similarity + 0.3 * (importance / (1.0 + age_hours))
         AS relevance
FROM mems
ORDER BY relevance DESC, id ASC LIMIT 20
"""


def _relevance_adjustments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decay-weighted relevance feedback -> parameter adjustment
    (relevance_feedback.rs:293-343).  temporal_decay pinned to 0.5 so
    the hourly weights are exact powers of two (bit-reproducible)."""
    from needle_spark.operators.relevance_feedback import (
        FeedbackConfig,
        compute_adjustments,
    )

    ev = _t(spark, sf_dir, "events")
    sig = (F.when(F.col("event_type") == "click", "click")
           .when(F.col("event_type") == "purchase", "thumbs_up")
           .when(F.col("event_type") == "error", "skip")
           .when(F.col("event_type") == "view", "dwell"))
    fb = ev.select(sig.alias("signal"), "value", "ts").filter(
        F.col("signal").isNotNull())
    now = fb.agg(F.max("ts")).first()[0]
    return compute_adjustments(fb, now, FeedbackConfig(temporal_decay=0.5))


_RELEVANCE_ADJUSTMENTS_SQL = """
WITH fb AS (
  SELECT CASE event_type
           WHEN 'click' THEN 0.5
           WHEN 'purchase' THEN 1.0
           WHEN 'error' THEN -0.3
           WHEN 'view' THEN greatest(least((value - 3.0)/5.0, 1.0), -1.0)
         END AS s,
         power(0.5, greatest(CAST(floor(
           ((SELECT max(epoch_ns(ts)) FROM events
             WHERE event_type IN ('click','purchase','error','view'))
            - epoch_ns(ts)) / 3600000000000.0) AS BIGINT), 0)) AS w
  FROM events
  WHERE event_type IN ('click','purchase','error','view')
), agg AS (
  SELECT CAST(sum(CAST(round(s * w * 1000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000.0 AS wr,
         CAST(sum(CAST(round(w * 1000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000.0 AS tw,
         sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS pos,
         count(*) AS n
  FROM fb
)
SELECT greatest(least(1.0 + 0.01 * (1.0 - wr / tw), 2.0), 0.5)
         AS ef_search_factor,
       CAST(pos AS DOUBLE) / n AS rerank_weight,
       wr / tw AS avg_relevance,
       CAST(n AS BIGINT) AS event_count,
       least(CAST(n AS DOUBLE) / 100.0, 1.0) AS confidence
FROM agg WHERE n >= 10 AND tw > 1e-10
"""


def _sequence_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence trend vectors (temporal_sequences.rs:152-177):
    centroid(last window) - centroid(first window) over every sequence
    in one rank-window + fixed-point aggregation pass."""
    from needle_spark.operators.temporal_vectors import sequence_trends

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label").alias("seq_id"), F.col("vec_id").alias("ts"),
        F.col("embedding").alias("vector"))
    return sequence_trends(emb, window_size=10).select(
        F.col("seq").cast("int").alias("seq"),
        _fx6_join(F.col("trend")).alias("trend_fx6"))


_SEQUENCE_TREND_SQL = """
WITH ranked AS (
  SELECT label, vec_id, embedding,
         row_number() OVER (PARTITION BY label ORDER BY vec_id ASC) AS ra,
         row_number() OVER (PARTITION BY label ORDER BY vec_id DESC) AS rd,
         count(*) OVER (PARTITION BY label) AS n
  FROM embeddings
), ends AS (
  SELECT label, CASE WHEN ra <= 10 THEN 'first' ELSE 'last' END AS side,
         embedding
  FROM ranked WHERE n >= 20 AND (ra <= 10 OR rd <= 10)
), per AS (
  SELECT label, side, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM ends, unnest(range(1, len(embedding)+1)) AS t(i)
), dim AS (
  SELECT label, side, pos,
         CAST(sum(CAST(round(x * 1000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000.0 / count(*) AS v
  FROM per GROUP BY 1, 2, 3
), piv AS (
  SELECT label, pos,
         max(CASE WHEN side = 'first' THEN v END) AS fv,
         max(CASE WHEN side = 'last' THEN v END) AS lv
  FROM dim GROUP BY 1, 2
)
SELECT label AS seq,
       {fx} AS trend_fx6
FROM piv GROUP BY label
""".format(fx=_fx6_join_sql("list(lv - fv ORDER BY pos)"))


def _vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group vector aggregation (vector_aggregation.rs
    compute_centroid/compute_spread): exact fixed-point centroid +
    member count + mean squared centroid distance per label."""
    from needle_spark.operators.vector_agg import group_centroids, group_spread

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label"), F.col("embedding").alias("vector"))
    # cents feeds both the spread join and the output join; without
    # materialization the whole posexplode+aggregate centroid subtree
    # executed twice (it is one tiny row per label).  materialize()
    # honors the spark.needle.checkpoint.mode reliability knob.
    from needle_spark.session import materialize

    cents = materialize(group_centroids(emb, "label", "vector"))
    spread = group_spread(emb, "label", "vector", centroids=cents)
    return (cents.join(spread.select("group", "spread"), "group")
            .select(F.col("group").cast("int").alias("label"),
                    _fx6_join(F.col("centroid")).alias("centroid_fx6"),
                    "count", "spread"))


_VECTOR_CENTROIDS_SQL = """
WITH per AS (
  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)
), dim AS (
  SELECT label, pos,
         CAST(sum(CAST(round(x * 1000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000.0 / count(*) AS v,
         count(*) AS n
  FROM per GROUP BY label, pos
), cents AS (
  SELECT label, list(v ORDER BY pos) AS centroid,
         CAST(max(n) AS BIGINT) AS cnt
  FROM dim GROUP BY label
), d2 AS (
  SELECT e.label,
         CAST(round(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(list_zip(e.embedding, c.centroid),
             z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))),
           (acc, t) -> acc + t) * 1000000.0) AS BIGINT) AS d2fx
  FROM embeddings e JOIN cents c ON c.label = e.label
), sp AS (
  SELECT label, CAST(sum(d2fx) AS DOUBLE) / 1000000.0 / count(*) AS spread
  FROM d2 GROUP BY label
)
SELECT c.label,
       {fx} AS centroid_fx6,
       c.cnt AS count, sp.spread
FROM cents c JOIN sp ON sp.label = c.label
""".format(fx=_fx6_join_sql("c.centroid"))


# ----------------------------------------------- collaborative filtering --

_CF_WEIGHTS_SQL = ("CASE event_type WHEN 'click' THEN 1.0 "
                   "WHEN 'purchase' THEN 5.0 WHEN 'view' THEN 0.5 "
                   "ELSE 0.0 END")
_CF_INTER_SQL = f"""
inter AS (
  SELECT user_id AS usr,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         sum({_CF_WEIGHTS_SQL}) AS weight
  FROM events WHERE {_CF_WEIGHTS_SQL} > 0
  GROUP BY 1, 2
), norms AS (
  SELECT item, sqrt(sum(weight * weight)) AS norm FROM inter GROUP BY item
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         sum(a.weight * b.weight) AS dot,
         CAST(count(*) AS BIGINT) AS common_users
  FROM inter a JOIN inter b ON a.usr = b.usr AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 3
)"""


def _cf_inter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from needle_spark.operators.collab_filter import interaction_matrix

    ev = _t(spark, sf_dir, "events").withColumn(
        "item_id", F.get_json_object("props", "$.k").cast("long"))
    return interaction_matrix(ev, item_col="item_id")


def _cf_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine CF (collaborative_filtering.rs train/recommend
    family; deterministic item-kNN variant — see operators/collab_filter)."""
    from needle_spark.operators.collab_filter import item_similarity

    sims = item_similarity(_cf_inter(spark, sf_dir), min_common=3)
    return (sims.orderBy(F.col("similarity").desc(), F.col("item_a").asc(),
                         F.col("item_b").asc()).limit(50)
            .select("item_a", "item_b",
                    F.col("common_users").cast("long").alias("common_users"),
                    "similarity"))


_CF_ITEM_SIM_SQL = f"""
WITH {_CF_INTER_SQL}
SELECT p.item_a, p.item_b, p.common_users,
       p.dot / (na.norm * nb.norm) AS similarity
FROM pairs p JOIN norms na ON na.item = p.item_a
             JOIN norms nb ON nb.item = p.item_b
ORDER BY similarity DESC, item_a ASC, item_b ASC LIMIT 50
"""


def _cf_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based CF recommendation for one user: sum of neighbor
    similarities weighted by the user's own interaction strengths,
    seen items excluded."""
    from needle_spark.operators.collab_filter import (
        item_similarity,
        recommend_itemknn,
    )

    inter = _cf_inter(spark, sf_dir)
    sims = item_similarity(inter, min_common=3)
    rec = recommend_itemknn(inter, sims, 0, limit=10)
    return rec.select(F.col("item").cast("long").alias("item"), "cf_score")


_CF_RECOMMEND_SQL = f"""
WITH {_CF_INTER_SQL},
tri AS (
  SELECT p.item_a, p.item_b, p.dot / (na.norm * nb.norm) AS similarity
  FROM pairs p JOIN norms na ON na.item = p.item_a
               JOIN norms nb ON nb.item = p.item_b
), sym AS (
  SELECT item_a, item_b, similarity FROM tri
  UNION ALL
  SELECT item_b, item_a, similarity FROM tri
), mine AS (
  SELECT item AS item_a, weight FROM inter WHERE usr = 0
)
SELECT s.item_b AS item, sum(s.similarity * m.weight) AS cf_score
FROM mine m JOIN sym s ON s.item_a = m.item_a
WHERE s.item_b NOT IN (SELECT item_a FROM mine)
GROUP BY s.item_b
ORDER BY cf_score DESC, item ASC LIMIT 10
"""


def _data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide half of DataProfiler.profile (tuning.rs:1122-1311)
    as ONE order-exact aggregation: magnitudes, sparsity, normalization
    flag.  Fixed-point sums make the result partition-invariant."""
    from needle_spark.plans.tuning import profile_stats_df

    emb = _t(spark, sf_dir, "embeddings")
    return profile_stats_df(emb.select(F.col("embedding").alias("vector")))


def _data_profile_sql() -> str:
    mag = ("sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
           "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
           "(acc, x) -> acc + x))")
    nz = ("list_reduce(list_prepend(0, list_transform(embedding, "
          "x -> CASE WHEN abs(x) < 0.001 THEN 1 ELSE 0 END)), (a, b) -> a + b)")
    mean = "sum_m / CAST(sample_size AS DOUBLE)"
    std = (f"sqrt(greatest(sum_m2 / CAST(sample_size AS DOUBLE) "
           f"- ({mean}) * ({mean}), 0.0))")
    return f"""
WITH per AS (
  SELECT len(embedding) AS d,
         CAST(round({mag} * 1000000.0) AS BIGINT) AS m_fx,
         CAST(round({mag} * {mag} * 1000000.0) AS BIGINT) AS m2_fx,
         {nz} AS nz
  FROM embeddings
), agg AS (
  SELECT CAST(max(d) AS INT) AS dimensions,
         count(*) AS sample_size,
         CAST(sum(m_fx) AS DOUBLE) / 1000000.0 AS sum_m,
         CAST(sum(m2_fx) AS DOUBLE) / 1000000.0 AS sum_m2,
         CAST(sum(nz) AS DOUBLE) AS nz_total,
         CAST(sum(d) AS DOUBLE) AS values_total
  FROM per
)
SELECT dimensions, sample_size,
       {mean} AS mean_magnitude,
       {std} AS std_magnitude,
       nz_total / values_total AS sparsity_ratio,
       (abs({mean} - 1.0) < 0.1 AND {std} < 0.1) AS appears_normalized
FROM agg
"""


def _tuner_arm_rewards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-tuner warm start: the per-arm UCB1 reward aggregation
    (learned_tuning.rs:556-575) computed distributed from an
    events-derived feedback log.  Rewards are fixed-point encoded
    before summing so Spark and DuckDB agree bit-for-bit regardless of
    accumulation order."""
    ev = _t(spark, sf_dir, "events")
    fb = ev.select(
        (F.lit(50) + (F.col("event_id") % 4) * 50).cast("int")
        .alias("ef_search"),
        F.col("value").alias("latency_ms"),
        F.least(F.lit(1.0), F.col("value") / 10.0).alias("estimated_recall"),
        (F.col("event_type") != "error").alias("satisfied"))
    reward = (F.col("estimated_recall") * 0.6
              + F.lit(0.3) / (F.lit(1.0) + F.col("latency_ms") * 0.1)
              + F.when(F.col("satisfied"), 0.2).otherwise(0.0))
    fx = F.round(reward * 1000000.0).cast("long")
    return (fb.groupBy("ef_search")
            .agg(F.count(F.lit(1)).alias("pulls"),
                 (F.sum(fx).cast("double") / 1000000.0)
                 .alias("total_reward"))
            .withColumn("avg_reward",
                        F.col("total_reward") / F.col("pulls"))
            .orderBy("ef_search"))


_TUNER_ARM_REWARDS_SQL = """
WITH fb AS (
  SELECT CAST(50 + (event_id % 4) * 50 AS INT) AS ef_search,
         value AS latency_ms,
         least(1.0, value / 10.0) AS estimated_recall,
         event_type <> 'error' AS satisfied
  FROM events
),
fx AS (
  SELECT ef_search,
         CAST(round((estimated_recall * 0.6
                     + 0.3 / (1.0 + latency_ms * 0.1)
                     + CASE WHEN satisfied THEN 0.2 ELSE 0.0 END)
                    * 1000000.0) AS BIGINT) AS r_fx
  FROM fb
)
SELECT ef_search, count(*) AS pulls,
       CAST(sum(r_fx) AS DOUBLE) / 1000000.0 AS total_reward,
       (CAST(sum(r_fx) AS DOUBLE) / 1000000.0) / count(*) AS avg_reward
FROM fx
GROUP BY ef_search
ORDER BY ef_search
"""


def _rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-growth migration plan (rebalance.rs:482-521): per
    (source, target) mover counts when growing 4 -> 5 shards, computed
    as one scan + one aggregation.  Routing uses a Knuth
    multiplicative hash so the DuckDB twin evaluates the identical
    expression."""
    from needle_spark.plans.rebalance import plan_add_shard

    def route(id_col, n):
        h = F.pmod(F.col(id_col).cast("long") * F.lit(2654435761),
                   F.lit(4294967296))
        return F.pmod(h, F.lit(int(n))).cast("int")

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"))
    plan = plan_add_shard(emb, old_shards=4, new_shards=5, route=route)
    return plan.tasks          # (source_shard, target_shard, n_vectors)


_REBALANCE_PLAN_SQL = """
WITH r AS (
  SELECT (vec_id * 2654435761) % 4294967296 % 4 AS source_shard,
         (vec_id * 2654435761) % 4294967296 % 5 AS target_shard
  FROM embeddings
)
SELECT CAST(source_shard AS INT) AS source_shard,
       CAST(target_shard AS INT) AS target_shard,
       count(*) AS n_vectors
FROM r
WHERE source_shard <> target_shard
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _coaccess_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-access pair counting for locality compaction
    (locality_compaction.rs:80-124): each (user, hour) of the events
    stream is one access event whose distinct event_types are the ids
    returned together; pairs canonicalized a < b and counted in one
    aggregation."""
    from needle_spark.plans.locality import co_access_pairs

    ev = _t(spark, sf_dir, "events")
    log = (ev.groupBy("user_id",
                      F.expr("ts div 3600000000000").alias("bk"))
           .agg(F.collect_set("event_type").alias("result_ids")))
    return (co_access_pairs(log)
            .orderBy(F.col("n_co").desc(), "id_a", "id_b"))


_COACCESS_PAIRS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 3600000 AS bk, event_type
  FROM events
)
SELECT a.event_type AS id_a, b.event_type AS id_b, count(*) AS n_co
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.bk = b.bk AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY n_co DESC, id_a, id_b
"""


def _temporal_search_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time temporal search (temporal.rs:328-374): a version
    history is derived deterministically from embeddings (every 3rd id
    gets a v2 update with the reversed vector, every 7th a later
    delete); state at ts=3500 reconstructs per-id winners and excludes
    deleted ids, then exact kNN."""
    from needle_spark.operators.temporal_index import search_at

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("vec_id").alias("version"),
        (F.lit(1000) + F.col("vec_id") % 100).cast("long").alias("timestamp"),
        F.col("embedding").alias("vector"),
        F.lit(None).cast("string").alias("metadata"),
        F.lit("insert").alias("change_type"))
    updates = emb.filter(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").cast("string").alias("id"),
        (F.col("vec_id") + 1000000).alias("version"),
        (F.lit(2000) + F.col("vec_id") % 100).cast("long").alias("timestamp"),
        F.reverse(F.col("embedding")).alias("vector"),
        F.lit(None).cast("string").alias("metadata"),
        F.lit("update").alias("change_type"))
    deletes = emb.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").cast("string").alias("id"),
        (F.col("vec_id") + 2000000).alias("version"),
        F.lit(3000).cast("long").alias("timestamp"),
        F.lit(None).cast("array<float>").alias("vector"),
        F.lit(None).cast("string").alias("metadata"),
        F.lit("delete").alias("change_type"))
    history = base.unionByName(updates).unionByName(deletes)
    qv = _query_vec(spark, sf_dir, 0)
    return (search_at(history, qv, k=10, as_of=3500, metric="cosine")
            .select("id", "version", "timestamp", "distance"))


def _temporal_search_at_sql() -> str:
    d = duckdb_distance_sql("cosine", "vector", _Q_SQL)
    return f"""
WITH hist AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, vec_id AS version,
         1000 + vec_id % 100 AS timestamp, embedding AS vector,
         'insert' AS change_type
  FROM embeddings
  UNION ALL
  SELECT CAST(vec_id AS VARCHAR), vec_id + 1000000,
         2000 + vec_id % 100, list_reverse(embedding), 'update'
  FROM embeddings WHERE vec_id % 3 = 0
  UNION ALL
  SELECT CAST(vec_id AS VARCHAR), vec_id + 2000000, 3000, NULL, 'delete'
  FROM embeddings WHERE vec_id % 7 = 0
),
cur AS (
  SELECT id, version, timestamp, vector, change_type,
         row_number() OVER (PARTITION BY id ORDER BY version DESC) AS rn
  FROM hist WHERE timestamp <= 3500
)
SELECT id, version, timestamp, {d} AS distance
FROM cur
WHERE rn = 1 AND change_type <> 'delete'
ORDER BY distance ASC, id ASC
LIMIT 10
"""


def _llm_cache_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LLM-cache batch lookup (llm_cache.rs get_semantic
    :342-420 as one zero-shuffle scan): cache entries = every 5th
    embedding row, incoming prompts = 100 other rows; per prompt the
    arg-max-similarity cache entry at or above 0.8 cosine, else miss."""
    from needle_spark.operators.llm_response_cache import cache_lookup_batch

    emb = _t(spark, sf_dir, "embeddings")
    cache = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.concat(F.lit("q"), F.col("vec_id").cast("string"))
        .alias("cached_query"),
        F.col("embedding"),
        F.concat(F.lit("r"), F.col("vec_id").cast("string")).alias("response"))
    batch = emb.filter((F.col("vec_id") % 5 != 0) & (F.col("vec_id") < 500)) \
        .select(F.col("vec_id").alias("query_id"),
                F.concat(F.lit("p"), F.col("vec_id").cast("string"))
                .alias("query"),
                F.col("embedding"))
    out = cache_lookup_batch(batch, cache, threshold=0.8, metric="cosine")
    return (out.select("query_id", "hit_type", "cached_query", "response",
                       "similarity")
            .orderBy("query_id"))


_LLM_CACHE_BATCH_SQL = f"""
WITH b AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  WHERE vec_id % 5 <> 0 AND vec_id < 500
), c AS (
  SELECT 'q' || CAST(vec_id AS VARCHAR) AS cached_query, embedding,
         'r' || CAST(vec_id AS VARCHAR) AS response
  FROM embeddings WHERE vec_id % 5 = 0
),
scored AS (
  SELECT b.query_id, c.cached_query, c.response,
         1.0 - ({duckdb_distance_sql("cosine", "b.embedding", "c.embedding")})
           AS similarity,
         row_number() OVER (
           PARTITION BY b.query_id
           ORDER BY 1.0 - ({duckdb_distance_sql("cosine", "b.embedding",
                                                "c.embedding")}) DESC,
                    c.cached_query ASC) AS rn
  FROM b, c
  WHERE 1.0 - ({duckdb_distance_sql("cosine", "b.embedding", "c.embedding")})
        >= 0.8
)
SELECT b.query_id,
       CASE WHEN s.cached_query IS NULL THEN NULL
            ELSE 'semantic' END AS hit_type,
       s.cached_query, s.response, s.similarity
FROM b LEFT JOIN (SELECT * FROM scored WHERE rn = 1) s USING (query_id)
ORDER BY b.query_id
"""


def _crdt_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-replica CRDT merge to the LWW fixpoint (crdt.rs:294-541).
    Two replica op logs are derived deterministically from the events
    table (replica = event_id parity, HLC = (epoch-ms ts, event_id,
    replica), 'error' events = deletes, everything else = adds); the
    converged state is one distributed arg-max per id — newest
    add/update wins unless an even newer delete tombstones the row."""
    from needle_spark.crdt import crdt_state, merge_op_logs

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("id"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("add").alias("op"),
        F.when(F.col("event_type") != "error",
               F.array(F.col("value").cast("float"),
                       (F.col("user_id") % 7).cast("float"))).alias("vector"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("string").alias("meta_key"),
        F.lit(None).cast("string").alias("meta_value"),
        F.expr("ts div 1000000").alias("physical"),  # _t yields epoch-ns longs
        F.col("event_id").cast("int").alias("logical"),
        ((F.col("event_id") % 2) + 1).cast("long").alias("replica"),
    )
    r1 = log.filter(F.col("replica") == 1)
    r2 = log.filter(F.col("replica") == 2)
    st = crdt_state(merge_op_logs(r1, r2))
    return (st.select(
        "id",
        F.col("vector")[0].cast("double").alias("x0"),
        F.col("vector")[1].cast("double").alias("x1"),
        "updated_physical", "updated_logical", "updated_replica")
        .orderBy("id"))


_CRDT_MERGE_SQL = """
WITH log AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'add' END AS op,
         CAST(value AS REAL) AS x0,
         CAST(user_id % 7 AS REAL) AS x1,
         epoch_ms(ts) AS physical,
         CAST(event_id AS INT) AS logical,
         CAST(event_id % 2 + 1 AS BIGINT) AS replica
  FROM events
),
val AS (
  SELECT id, x0, x1, physical, logical, replica,
         row_number() OVER (PARTITION BY id
                            ORDER BY physical DESC, logical DESC,
                                     replica DESC) AS rn
  FROM log WHERE op = 'add'
),
del AS (
  SELECT id, max(struct_pack(physical := physical, logical := logical,
                             replica := replica)) AS d
  FROM log WHERE op = 'delete' GROUP BY id
)
SELECT v.id,
       CAST(v.x0 AS DOUBLE) AS x0,
       CAST(v.x1 AS DOUBLE) AS x1,
       v.physical AS updated_physical,
       v.logical  AS updated_logical,
       v.replica  AS updated_replica
FROM val v LEFT JOIN del ON v.id = del.id
WHERE v.rn = 1
  AND (del.d IS NULL
       OR struct_pack(physical := v.physical, logical := v.logical,
                      replica := v.replica) > del.d)
ORDER BY v.id
"""


_ENC_CFG = None


def _enc_cfg():
    global _ENC_CFG
    if _ENC_CFG is None:
        from needle_spark.operators.encrypted_search import EncryptionConfig
        _ENC_CFG = EncryptionConfig(dimensions=64, hash_bits=32, num_tables=2,
                                    seed=42)
    return _ENC_CFG


def _encrypted_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving search (encrypted_search.rs:111-127): encrypt
    the collection into sign-LSH codes (map-only Arrow kernel — raw
    vectors never reach the serving scan), then top-10 by Hamming
    distance computed JVM-side as bit_count(code XOR query_code);
    plans as TakeOrderedAndProject over the narrow coded table."""
    from needle_spark.operators.encrypted_search import (
        encrypt_vectors, encrypted_search)
    emb = _t(spark, sf_dir, "embeddings")
    cfg = _enc_cfg()
    enc = encrypt_vectors(emb, cfg, id_col="vec_id", vector_col="embedding")
    qv = _query_vec(spark, sf_dir, 0)
    return encrypted_search(enc, qv, cfg, k=10).select(
        F.col("id").alias("vec_id"), "hamming_distance", "estimated_similarity")


def _encrypted_knn_sql() -> str:
    from needle_spark.operators.encrypted_search import (
        duckdb_encrypted_search_sql)
    sql = duckdb_encrypted_search_sql(
        "embeddings", "vec_id", "embedding", _Q_SQL.strip("()"), _enc_cfg(), k=10)
    return sql.replace("SELECT id,", "SELECT id AS vec_id,", 1)


def _acl_engine_ctx():
    from needle_spark.operators.acl import (
        SEARCH, AclEngine, AclPolicy, RequestContext, any_principal,
        attribute, metadata_field, role, vector_id)
    eng = AclEngine()  # deny-by-default (vector_acl.rs:205-213)
    eng.add_policy(AclPolicy(
        id="deny-archive", principal=any_principal(),
        resource=vector_id("1*"), effect="deny", actions=(SEARCH,),
        priority=10))
    eng.add_policy(AclPolicy(
        id="team-en", principal=attribute("team", "nlp"),
        resource=metadata_field("lang", "en"), effect="allow",
        actions=(SEARCH,)))
    eng.add_policy(AclPolicy(
        id="reader-fr", principal=role("reader"),
        resource=metadata_field("lang", "fr"), effect="allow",
        actions=(SEARCH,)))
    ctx = RequestContext("alice", roles=("reader",),
                         attributes={"team": "nlp"})
    return eng, ctx, SEARCH


def _acl_rowlevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security decisions (vector_acl.rs:258-335): the whole
    priority-ordered policy set compiles driver-side into ONE `when`
    cascade — per-row allow/deny + deciding policy are scan
    projections (zero joins, zero shuffles, zero Python)."""
    eng, ctx, action = _acl_engine_ctx()
    docs = _t(spark, sf_dir, "documents")
    return (
        eng.evaluate_rows(docs, ctx, action, id_col="doc_id")
        .select("doc_id", "lang", "allowed", "policy_id")
        .orderBy("doc_id")
    )


def _acl_rowlevel_sql() -> str:
    eng, ctx, action = _acl_engine_ctx()
    allowed_sql, policy_sql = eng.decision_sql(ctx, action, "doc_id")
    return (
        f"SELECT doc_id, lang, {allowed_sql} AS allowed, "
        f"{policy_sql} AS policy_id FROM documents ORDER BY doc_id"
    )


_LIFECYCLE_NOW_MS = 1706745600000  # 2024-02-01T00:00Z, after the events span


def _lifecycle_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle rule ladder (persistence/lifecycle.rs:75-155) compiled
    to ONE when-cascade scan expression: compress@7d / archive@14d /
    delete@25d on event age, last-match-wins."""
    from needle_spark.lifecycle import LifecyclePolicy
    ev = _t(spark, sf_dir, "events")
    pol = LifecyclePolicy.tiered("ladder", 7, 14, 25)
    df = ev.withColumn(
        "inserted_at", (F.col("ts") / F.lit(1_000_000)).cast("long"))
    return (df.withColumn("lifecycle_action",
                          pol.action_column(_LIFECYCLE_NOW_MS))
            .select("event_id", "lifecycle_action").orderBy("event_id"))


_LIFECYCLE_CLASSIFY_SQL = f"""
SELECT event_id,
       CASE WHEN age_s >= 25 * 86400 THEN 'delete'
            WHEN age_s >= 14 * 86400 THEN 'archive'
            WHEN age_s >= 7 * 86400 THEN 'compress'
            ELSE 'none' END AS lifecycle_action
FROM (SELECT event_id,
             ({_LIFECYCLE_NOW_MS} - epoch_ns(ts) // 1000000) / 1000.0 AS age_s
      FROM events)
ORDER BY event_id
"""


def _anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outliers: rows where ANY embedding dimension's
    z-score (population std) exceeds 2.5 (anomaly.rs zscore_outliers
    :571-589)."""
    from needle_spark.operators.anomaly import zscore_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return zscore_outliers(emb, vector_col="embedding", threshold=2.5,
                           id_col="vec_id").orderBy("vec_id")


_ANOMALY_ZSCORE_SQL = """
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
stats AS (
  SELECT dim, avg(x) AS m, var_pop(x) AS v FROM ex GROUP BY dim
)
SELECT DISTINCT ex.vec_id
FROM ex JOIN stats USING (dim)
WHERE stats.v > 0 AND abs((ex.x - stats.m) / sqrt(stats.v)) > 2.5
ORDER BY vec_id
"""


def _anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-fence outliers: rows where any dimension leaves
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR], quartiles as the reference's
    0-indexed order statistics values[n/4], values[3n/4]
    (anomaly.rs iqr_outliers :591-606)."""
    from needle_spark.operators.anomaly import iqr_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return iqr_outliers(emb, vector_col="embedding", multiplier=1.5,
                        id_col="vec_id").orderBy("vec_id")


# the Spark side interpolates F.percentile at fraction idx/(n-1),
# which lands EXACTLY on the 0-indexed order statistic values[idx]
# (h = p*(n-1) = idx is an integer) — so the twin selects the order
# statistic directly via row_number, no interpolation needed
_ANOMALY_IQR_SQL = """
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
n AS (SELECT count(*) AS n FROM embeddings),
ranked AS (
  SELECT vec_id, dim, x,
         row_number() OVER (PARTITION BY dim ORDER BY x) AS rn
  FROM ex
),
q AS (
  SELECT dim,
         max(CASE WHEN rn = (SELECT n // 4 + 1 FROM n) THEN x END) AS q1,
         max(CASE WHEN rn = (SELECT (3 * n) // 4 + 1 FROM n) THEN x END) AS q3
  FROM ranked GROUP BY dim
)
SELECT DISTINCT ex.vec_id
FROM ex JOIN q USING (dim)
WHERE ex.x < q.q1 - 1.5 * (q.q3 - q.q1)
   OR ex.x > q.q3 + 1.5 * (q.q3 - q.q1)
ORDER BY vec_id
"""


def _knn_sq8_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-refine serving tier (plans/ivf.py refine=True): SQ8 codes
    answer the scan, and the quantized survivors are re-ranked by exact
    float64 distance against the pinned float32 sidecar — the
    reference's coarse-then-exact-rerank shape
    (src/collection/search_methods.rs:146-177 — k*oversample coarse
    candidates, then "Phase 2: Re-rank with full dimensions"),
    FAISS's IndexRefineFlat posture.  At full probe with a cell-sized
    overfetch the refined top-k provably equals the brute-force result,
    which is what the DuckDB oracle checks; euclidean keeps the sidecar
    rows bit-identical to the parquet floats (no normalization step)."""
    import numpy as np
    import pandas as pd

    from needle_spark.plans.ivf import IvfBatchKnnIndex

    emb = _t(spark, sf_dir, "embeddings")
    idx = IvfBatchKnnIndex(emb, nlist=16, vector_col="embedding",
                           id_col="vec_id", metric="euclidean", seed=42,
                           code_dtype="sq8", refine=True,
                           refine_factor=1_000_000)
    idx.pin_segments()
    try:
        q = np.asarray(_query_vec(spark, sf_dir, 0), dtype=np.float64)
        pdf = idx.search_many_local(([0], q.reshape(1, -1)), k=10,
                                    nprobe=idx.nlist)
    finally:
        idx.unpersist()
    out = pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                        "distance": pdf["distance"].astype("float64")})
    return spark.createDataFrame(out, "vec_id bigint, distance double")


def _knn_sq8_refine_sql() -> str:
    d = duckdb_distance_sql("euclidean", "embedding", _Q_SQL)
    return (f"SELECT vec_id, {d} AS distance FROM embeddings "
            f"ORDER BY distance ASC, vec_id ASC LIMIT 10")


def _knn_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IvfPQ + exact refine (plans/ivf.py code_dtype='pq'): product-
    quantized residual codes (quantization.rs PQ) answer the scan via
    per-query ADC lookup tables; the float32 sidecar re-ranks the
    survivors exactly (search_methods.rs:146-177 coarse-then-rerank).
    Full probe with a cell-sized overfetch == brute force — the same
    invariant the DuckDB oracle checks for the SQ8 tier."""
    import numpy as np
    import pandas as pd

    from needle_spark.plans.ivf import IvfBatchKnnIndex

    emb = _t(spark, sf_dir, "embeddings")
    idx = IvfBatchKnnIndex(emb, nlist=16, vector_col="embedding",
                           id_col="vec_id", metric="euclidean", seed=42,
                           code_dtype="pq", refine=True,
                           refine_factor=1_000_000)
    idx.pin_segments()
    try:
        q = np.asarray(_query_vec(spark, sf_dir, 0), dtype=np.float64)
        pdf = idx.search_many_local(([0], q.reshape(1, -1)), k=10,
                                    nprobe=idx.nlist)
    finally:
        idx.unpersist()
    out = pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                        "distance": pdf["distance"].astype("float64")})
    return spark.createDataFrame(out, "vec_id bigint, distance double")


def _sq8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization fidelity: encode embeddings to int8
    codes (round((x-lo)/scale)-128 over the collection-global [lo,hi]),
    dequantize, and report each vector's max absolute reconstruction
    error (quantization.rs Scalar variant)."""
    from needle_spark.plans.quantization import SQ8

    emb = _t(spark, sf_dir, "embeddings")
    sq = SQ8.fit(emb, vector_col="embedding")
    enc = sq.encode(emb)
    err = F.array_max(F.zip_with(
        F.col("embedding").cast("array<double>"), sq.dequantize_expr(),
        lambda x, d: F.abs(x - d)))
    return (enc.select("vec_id", err.alias("max_abs_err"))
            .orderBy("vec_id"))


_SQ8_ROUNDTRIP_SQL = """
WITH bounds AS (
  SELECT CAST(min(list_min(embedding)) AS DOUBLE) AS lo,
         (CAST(max(list_max(embedding)) AS DOUBLE)
          - CAST(min(list_min(embedding)) AS DOUBLE)) / 255.0 AS s
  FROM embeddings
)
SELECT vec_id,
       list_max(list_transform(
         embedding,
         x -> abs(CAST(x AS DOUBLE)
                  - ((round((CAST(x AS DOUBLE) - lo) / s) - 128 + 128.0)
                     * s + lo)))) AS max_abs_err
FROM embeddings, bounds
ORDER BY vec_id
"""


def _binq_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization coarse search (quantization.rs Binary
    variant): sign bits packed into bigint words JVM-side, Hamming =
    sum(bit_count(word XOR query_word)) — the 32x-compressed sketch
    tier.  The oracle computes the same count as per-dim sign
    mismatches (packing is an encoding detail, not semantics)."""
    from needle_spark.plans.quantization import BinaryQuantizer

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    bq = BinaryQuantizer(vector_col="embedding")
    enc = bq.encode(emb)
    return (enc.withColumn("hamming", bq.hamming_expr(qv))
            .select("vec_id", "hamming")
            .orderBy(F.col("hamming").asc(), F.col("vec_id").asc())
            .limit(50))


_BINQ_HAMMING_SQL = f"""
WITH q AS (SELECT ({_Q_SQL})::DOUBLE[] AS qv),
ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)
SELECT vec_id,
       SUM(CASE WHEN (x > 0) <> (qv[i] > 0) THEN 1 ELSE 0 END)::BIGINT
         AS hamming
FROM ex, q
GROUP BY vec_id
ORDER BY hamming ASC, vec_id ASC LIMIT 50
"""


def _queries_canonical() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_cosine": _mk_knn("cosine"),
        "knn_euclidean": _mk_knn("euclidean"),
        "knn_dot": _mk_knn("dot"),
        "knn_manhattan": _mk_knn("manhattan"),
        "knn_chebyshev": _mk_knn("chebyshev"),
        "knn_cosine_normalized": _knn_cosine_normalized,
        "knn_hamming": _knn_hamming,
        "federated_routed": _federated_routed,
        "matryoshka_knn": _matryoshka_knn,
        "random_projection_2d": _random_projection_2d,
        "knn_prefilter": _knn_prefilter,
        "knn_postfilter": _knn_postfilter,
        "radius_search": _radius,
        "batch_knn": _batch_knn,
        "recommend": _recommend_knn,
        "agg_lineitem": _agg_lineitem,
        "having_order": _having_order,
        "filter_compound": _filter_compound,
        "filtered_count": _filtered_count,
        "group_docs_lang": _group_docs_lang,
        "topk_per_group": _topk_per_group,
        "events_by_type": _events_by_type,
        "bm25_scores": _bm25,
        "hybrid_rrf": _hybrid_rrf,
        "rerank_by_field": _rerank_by_field,
        "dedup_events_exact": _dedup_events_exact,
        "ngram_jaccard_pairs": _ngram_jaccard,
        "minhash_lsh_dedup": _minhash_lsh,
        "neardup_components": _neardup_components,
        "neardup_dedup_keep": _neardup_dedup_keep,
        "simhash_candidates": _simhash,
        "simhash_md5_pairs": _simhash_md5,
        "embedding_neardup": _embedding_neardup,
        "embedding_neardup_dot": _embedding_neardup_dot,
        "decontaminate": _decontaminate,
        "gopher_quality": _gopher_quality,
        "stratified_sample": _stratified_sample,
        "pii_redact": _pii_redact,
        "dedup_lines": _dedup_lines,
        "text_profile": _text_profile,
        "time_decay_knn": _time_decay_knn,
        "asof_knn": _asof_knn,
        "maxsim": _maxsim,
        "sparse_dot": _sparse_dot,
        "field_stats_orders": _field_stats_orders,
        "events_hourly_window": _events_hourly,
        "filter_ops_text": _filter_ops_text,
        "filter_array_ops": _filter_array_ops,
        "filter_json_meta": _filter_json_meta,
        "events_sessionize": _events_sessionize,
        "revenue_per_nation": _revenue_per_nation,
        "distinct_agg": _distinct_agg,
        "rollup_agg": _rollup_agg,
        "ivf_recall": _ivf_recall,
        "knn_page2": _knn_page2,
        "cross_collection": _cross_collection,
        "graph_traverse": _graph_traverse,
        "term_overlap_rerank": _term_overlap,
        "idf_overlap_rerank": _idf_overlap,
        "bm25_search_many": _bm25_search_many,
        "chunk_fixed": _chunk_fixed,
        "cross_agg_best": _cross_agg_best,
        "graphrag_entities": _graphrag_entities,
        "graphrag_cooccur": _graphrag_cooccur,
        "graphrag_pagerank": _graphrag_pagerank,
        "graph_weighted": _graph_weighted,
        "collection_diff": _collection_diff,
        "vector_lineage": _vector_lineage,
        "lineage_impact": _lineage_impact,
        "schema_adapted_read": _schema_adapted_read,
        "drift_metrics": _drift_metrics,
        "knn_outlier_scores": _knn_outlier_scores,
        "numeric_histogram": _numeric_histogram,
        "score_normalize": _score_normalize,
        "chunk_semantic": _chunk_semantic,
        "chunk_sliding": _chunk_sliding,
        "chunk_paragraphs": _chunk_paragraphs,
        "markdown_load": _markdown_load,
        "rag_context": _rag_context,
        "multiquery_rrf": _multiquery_rrf,
        "data_profile": _data_profile,
        "cf_item_similarity": _cf_item_similarity,
        "cf_recommend_itemknn": _cf_recommend,
        "vector_centroids": _vector_centroids,
        "sequence_trend": _sequence_trend,
        "relevance_adjustments": _relevance_adjustments,
        "memory_recall": _memory_recall,
        "mm_fusion_weighted": _mm_fusion_weighted,
        "kg_context_search": _kg_context_search,
        "dashboard_patterns": _dashboard_patterns,
        "image_ahash": _image_ahash,
        "audio_wav_stats": _audio_wav_stats,
        "crdt_merge": _crdt_merge,
        "llm_cache_batch": _llm_cache_batch,
        "temporal_search_at": _temporal_search_at,
        "coaccess_pairs": _coaccess_pairs,
        "rebalance_plan": _rebalance_plan,
        "tuner_arm_rewards": _tuner_arm_rewards,
        "encrypted_knn": _encrypted_knn,
        "acl_rowlevel": _acl_rowlevel,
        "lifecycle_classify": _lifecycle_classify,
        "anomaly_zscore": _anomaly_zscore,
        "anomaly_iqr": _anomaly_iqr,
        "sq8_roundtrip": _sq8_roundtrip,
        "binq_hamming": _binq_hamming,
        "knn_sq8_refine": _knn_sq8_refine,
        "knn_pq_refine": _knn_pq_refine,
        "insert_dedup_reject": _insert_dedup_reject,
        "insert_dedup_version": _insert_dedup_version,
        "incremental_dedup_keep": _incremental_dedup_keep,
    }


# The driver's per-round correctness gate checks the FIRST 50 keys of
# queries().  Rounds 1-6 always presented the same canonical head (all 50
# green in CORRECTNESS_r06).  Round 7 rotated the 53-key tail in: 45 of
# its 50 slots went green; 5 errored on the driver canonicalizer's
# unhashable-list limitation (fixed in r8 by projecting array columns to
# scalars, see _fx6_join) and 2 oracle-backed tail keys (sq8_roundtrip,
# binq_hamming) never fit in a slice.  Round 8 head = those 7 priority
# keys + 43 of the r1-r6 canonical head, so after r8 every oracle-backed
# query has been driver-green in some CORRECTNESS_r*.json.  Round 9 head =
# the two r8-new refine-tier oracle rows (knn_sq8_refine, knn_pq_refine)
# + 48 of the r1-r6 canonical head.  Round 10 head (VERDICT r9 #6) =
# the r10-NEW oracle row (insert_dedup_reject) + the 7 keys the r9 head
# displaced (all with prior green driver rows, returned for per-key
# freshness) + the r9 priorities + 40 of the canonical head.  Per-key
# round map: README.md "Driver correctness rotation".  `ivf_recall`
# (the single structural no-oracle row) stays pinned last so it never
# consumes a gated slot.
_R6_HEAD_COUNT = 50  # keys 1..50 of the canonical order = the r1-r6 slice

# r11 rotation (VERDICT r10 ask #5): head = the two insert-dedup keys
# (never driver-green — the r10 numpy crash, fixed this round) + the
# r11-new incremental_dedup_keep + the 47 OLDEST keys by last
# driver-green round (4 from r6, 43 from r7; computed from the
# committed CORRECTNESS_r* artifacts) = exactly the driver's 50-slot
# gate.  tuner_arm_rewards + vector_lineage (r7) spill to head r12.
_R11_PRIORITY = [
    "insert_dedup_reject", "insert_dedup_version",
    "incremental_dedup_keep",
    # last green in r6
    "distinct_agg", "events_sessionize", "filter_json_meta",
    "revenue_per_nation",
    # last green in r7
    "acl_rowlevel", "anomaly_iqr", "anomaly_zscore", "audio_wav_stats",
    "bm25_search_many", "cf_item_similarity", "cf_recommend_itemknn",
    "chunk_fixed", "chunk_paragraphs", "chunk_semantic",
    "chunk_sliding", "coaccess_pairs", "collection_diff", "crdt_merge",
    "cross_agg_best", "cross_collection", "dashboard_patterns",
    "data_profile", "drift_metrics", "encrypted_knn", "graph_traverse",
    "graph_weighted", "graphrag_cooccur", "graphrag_entities",
    "graphrag_pagerank", "idf_overlap_rerank", "image_ahash",
    "kg_context_search", "knn_outlier_scores", "knn_page2",
    "lifecycle_classify", "lineage_impact", "llm_cache_batch",
    "memory_recall", "multiquery_rrf", "numeric_histogram",
    "rag_context", "rebalance_plan", "relevance_adjustments",
    "rollup_agg", "score_normalize", "temporal_search_at",
    "term_overlap_rerank",
]


def _rotated_keys(canonical: list[str]) -> list[str]:
    pri = [k for k in _R11_PRIORITY if k in canonical]
    head = [k for k in canonical[:_R6_HEAD_COUNT]
            if k not in pri and k != "ivf_recall"]
    tail = [k for k in canonical[_R6_HEAD_COUNT:]
            if k not in pri and k != "ivf_recall"]
    return pri + head + tail + ["ivf_recall"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    canon = _queries_canonical()
    return {k: canon[k] for k in _rotated_keys(list(canon))}


def oracle_sql() -> dict[str, str]:
    post = duckdb_distance_sql("cosine", "embedding", _Q_SQL)
    return {
        "knn_cosine": _knn_oracle("cosine"),
        "knn_euclidean": _knn_oracle("euclidean"),
        "knn_dot": _knn_oracle("dot"),
        "knn_manhattan": _knn_oracle("manhattan"),
        "knn_chebyshev": _knn_oracle("chebyshev"),
        "knn_cosine_normalized": _knn_cosine_normalized_sql(),
        "knn_hamming": _knn_hamming_sql(),
        "federated_routed": _federated_routed_sql(),
        "matryoshka_knn": _matryoshka_sql(),
        "random_projection_2d": _random_projection_sql(),
        "knn_prefilter": _knn_oracle("cosine", where="WHERE label IN (1, 2, 3)"),
        "knn_postfilter": (
            f"SELECT vec_id, label, distance FROM ("
            f"SELECT vec_id, label, {post} AS distance FROM embeddings "
            f"ORDER BY distance ASC, vec_id ASC LIMIT 30"
            f") WHERE label <= 4 ORDER BY distance ASC, vec_id ASC LIMIT 10"
        ),
        "radius_search": (
            f"SELECT vec_id, label, {post} AS distance FROM embeddings "
            f"WHERE {post} <= 0.7 ORDER BY distance ASC, vec_id ASC LIMIT 200"
        ),
        "batch_knn": _BATCH_KNN_SQL,
        "recommend": _RECOMMEND_SQL,
        "agg_lineitem": _AGG_LINEITEM_SQL,
        "having_order": _HAVING_ORDER_SQL,
        "filter_compound": _FILTER_COMPOUND_SQL,
        "filtered_count": _FILTERED_COUNT_SQL,
        "group_docs_lang": _GROUP_DOCS_LANG_SQL,
        "topk_per_group": _TOPK_PER_GROUP_SQL,
        "events_by_type": _EVENTS_BY_TYPE_SQL,
        "bm25_scores": __import__("needle_spark.operators.hybrid", fromlist=["duckdb_bm25_sql"]).duckdb_bm25_sql(
            _BM25_QUERY, table="documents", id_col="doc_id"
        ),
        "hybrid_rrf": _hybrid_rrf_sql(),
        "rerank_by_field": _rerank_by_field_sql(),
        "dedup_events_exact": _DEDUP_EVENTS_SQL,
        "ngram_jaccard_pairs": _jaccard_oracle_sql(0.6),
        # MinHash-LSH with exact-Jaccard verification provably equals the
        # exact pair set unless a banding miss occurs (p ~ 1e-22 at the
        # planted pairs' j~0.99) — same oracle.
        "minhash_lsh_dedup": _jaccard_oracle_sql(0.6),
        # connected components over the same exact pair graph (DuckDB
        # recursive-CTE reachability = the hash-min fixpoint)
        "neardup_components": _neardup_components_sql(),
        "neardup_dedup_keep": _neardup_dedup_keep_sql(),
        # simhash now registers the md5-derived hash family (round 6),
        # which DuckDB reproduces bit-identically — full oracle row;
        # the xxhash64 perf family stays pytest-pinned in the library
        "simhash_candidates": _SIMHASH_MD5_SQL,
        "simhash_md5_pairs": _SIMHASH_MD5_SQL,
        "embedding_neardup": _embedding_neardup_sql(),
        "embedding_neardup_dot": _embedding_neardup_dot_sql(),
        "decontaminate": __import__(
            "needle_spark.operators.llm_hygiene", fromlist=["decontaminate_sql"]
        ).decontaminate_sql(n=8),
        "gopher_quality": __import__(
            "needle_spark.operators.llm_hygiene", fromlist=["gopher_quality_sql"]
        ).gopher_quality_sql(),
        "stratified_sample": __import__(
            "needle_spark.operators.llm_hygiene", fromlist=["stratified_sample_sql"]
        ).stratified_sample_sql(
            "documents", "source", _MIX_FRACTIONS, key_col="doc_id", seed="mix0",
            default_fraction=0.05, select="doc_id, source",
        ),
        "pii_redact": _pii_redact_sql(),
        "dedup_lines": _dedup_lines_sql(),
        "text_profile": _text_profile_sql(),
        "time_decay_knn": _time_decay_knn_sql(),
        "asof_knn": _knn_oracle("cosine", where="WHERE vec_id * 10 <= 2000"),
        "maxsim": _maxsim_sql(),
        "sparse_dot": _sparse_dot_sql(),
        "field_stats_orders": _FIELD_STATS_SQL,
        "events_hourly_window": _EVENTS_HOURLY_SQL,
        "filter_ops_text": _FILTER_OPS_TEXT_SQL,
        "filter_array_ops": _FILTER_ARRAY_OPS_SQL,
        "filter_json_meta": _FILTER_JSON_META_SQL,
        "events_sessionize": _EVENTS_SESSIONIZE_SQL,
        "revenue_per_nation": _REVENUE_PER_NATION_SQL,
        "distinct_agg": _DISTINCT_AGG_SQL,
        "rollup_agg": _ROLLUP_AGG_SQL,
        # ivf_recall: no oracle (KMeans centroids aren't SQL-expressible)
        "knn_page2": _knn_page2_sql(),
        "cross_collection": _cross_collection_sql(),
        "graph_traverse": _GRAPH_TRAVERSE_SQL,
        "term_overlap_rerank": _term_overlap_sql(),
        "idf_overlap_rerank": _idf_overlap_sql(),
        "bm25_search_many": _bm25_search_many_sql(),
        "chunk_fixed": _CHUNK_FIXED_SQL,
        "cross_agg_best": _cross_agg_best_sql(),
        "graphrag_entities": _graphrag_entities_sql(),
        "graphrag_cooccur": _graphrag_cooccur_sql(),
        "graphrag_pagerank": _graphrag_pagerank_sql(),
        "graph_weighted": _graph_weighted_sql(),
        "collection_diff": _collection_diff_sql(),
        "vector_lineage": _vector_lineage_sql(),
        "lineage_impact": _lineage_impact_sql(),
        "schema_adapted_read": _schema_adapted_read_sql(),
        "drift_metrics": _drift_metrics_sql(),
        "knn_outlier_scores": _knn_outlier_scores_sql(),
        "numeric_histogram": _numeric_histogram_sql(),
        "score_normalize": _score_normalize_sql(),
        "chunk_semantic": _CHUNK_SEMANTIC_SQL,
        "chunk_sliding": _CHUNK_SLIDING_SQL,
        "chunk_paragraphs": _CHUNK_PARAGRAPHS_SQL,
        "markdown_load": _MARKDOWN_LOAD_SQL,
        "rag_context": _rag_context_sql(),
        "multiquery_rrf": _multiquery_rrf_sql(),
        "data_profile": _data_profile_sql(),
        "cf_item_similarity": _CF_ITEM_SIM_SQL,
        "cf_recommend_itemknn": _CF_RECOMMEND_SQL,
        "vector_centroids": _VECTOR_CENTROIDS_SQL,
        "sequence_trend": _SEQUENCE_TREND_SQL,
        "relevance_adjustments": _RELEVANCE_ADJUSTMENTS_SQL,
        "memory_recall": _memory_recall_sql(),
        "mm_fusion_weighted": _mm_fusion_weighted_sql(),
        "kg_context_search": _kg_context_search_sql(),
        "dashboard_patterns": _DASHBOARD_PATTERNS_SQL,
        "image_ahash": _IMAGE_AHASH_SQL,
        "audio_wav_stats": _AUDIO_WAV_STATS_SQL,
        "crdt_merge": _CRDT_MERGE_SQL,
        "llm_cache_batch": _LLM_CACHE_BATCH_SQL,
        "temporal_search_at": _temporal_search_at_sql(),
        "coaccess_pairs": _COACCESS_PAIRS_SQL,
        "rebalance_plan": _REBALANCE_PLAN_SQL,
        "tuner_arm_rewards": _TUNER_ARM_REWARDS_SQL,
        "encrypted_knn": _encrypted_knn_sql(),
        "acl_rowlevel": _acl_rowlevel_sql(),
        "lifecycle_classify": _LIFECYCLE_CLASSIFY_SQL,
        "anomaly_zscore": _ANOMALY_ZSCORE_SQL,
        "anomaly_iqr": _ANOMALY_IQR_SQL,
        "sq8_roundtrip": _SQ8_ROUNDTRIP_SQL,
        "binq_hamming": _BINQ_HAMMING_SQL,
        "knn_sq8_refine": _knn_sq8_refine_sql(),
        "knn_pq_refine": _knn_sq8_refine_sql(),
        "insert_dedup_reject": _insert_dedup_reject_sql(),
        "insert_dedup_version": _insert_dedup_version_sql(),
        "incremental_dedup_keep": _incremental_dedup_keep_sql(),
    }
