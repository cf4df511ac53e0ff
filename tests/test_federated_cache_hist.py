"""Federation routing, embedding provider UDF, exact query cache,
numeric histograms."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.federated import (
    FederationConfig,
    RoutingRule,
    embedding_provider_udf,
    federated_knn,
    hash_embedding,
)
from needle_spark.operators.semantic_cache import ExactQueryCache
from needle_spark.plans.planner import histogram_selectivity, numeric_histogram


@pytest.fixture(scope="module")
def members(embeddings):
    mk = lambda pred: embeddings.filter(pred).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    return {"low": mk("label < 5"), "high": mk("label >= 5")}


def test_federated_routing(spark, embeddings, members):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    cfg = FederationConfig(
        members=members,
        weights={"high": 2.0},
        rules=[RoutingRule("low-only", lambda a: a.get("tier") == "low", ["low"])],
    )
    # rule fires -> only 'low'
    rows = federated_knn(cfg, qv, k=5, query_attrs={"tier": "low"}).collect()
    assert {r["collection"] for r in rows} == {"low"}
    # no rule -> all members, weighted scores
    rows = federated_knn(cfg, qv, k=10).collect()
    assert {r["collection"] for r in rows} <= {"low", "high"}
    with pytest.raises(KeyError):
        FederationConfig(
            members=members,
            rules=[RoutingRule("bad", lambda a: True, ["nope"])],
        ).route({})


def test_embedding_provider(spark):
    df = spark.createDataFrame(
        [("a", "spark shuffles data"), ("b", "spark shuffles data"), ("c", "different words")],
        "id string, text string",
    )
    emb = embedding_provider_udf(hash_embedding(16))
    out = {r["id"]: list(r["vec"]) for r in
           df.withColumn("vec", emb(F.col("text"))).collect()}
    assert out["a"] == out["b"]       # deterministic
    assert out["a"] != out["c"]
    assert len(out["a"]) == 16
    norm = sum(x * x for x in out["a"]) ** 0.5
    assert abs(norm - 1.0) < 1e-6     # provider normalizes


def test_exact_query_cache():
    c = ExactQueryCache(max_entries=2)
    qv = [0.1, 0.2]
    assert c.get(qv, 10) is None
    c.put(["r1"], qv, 10)
    assert c.get(qv, 10) == ["r1"]
    # same vector but different k / filter / version miss
    assert c.get(qv, 5) is None
    assert c.get(qv, 10, filter_doc={"a": 1}) is None
    assert c.get(qv, 10, version=1) is None
    # tiny float noise under the rounding grid still hits
    assert c.get([0.1 + 1e-12, 0.2], 10) == ["r1"]
    c.put(["r2"], qv, 5)
    c.put(["r3"], qv, 3)  # evicts the oldest
    assert c.stats()["entries"] == 2


def test_numeric_histogram(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    hist = numeric_histogram(df, "x", buckets=10)
    lo, hi, counts = hist
    assert (lo, hi) == (0.0, 99.0)
    assert sum(counts) == 100
    assert all(c > 0 for c in counts)
    # range selectivity ~ covered fraction
    sel = histogram_selectivity(hist, 0.0, 49.5)
    assert 0.45 <= sel <= 0.55
    assert histogram_selectivity(hist, -10, 1000) == pytest.approx(1.0)
    assert histogram_selectivity(hist, 200, 300) == 0.0
