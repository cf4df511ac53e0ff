"""LLM semantic response cache: driver cache semantics, adaptive
threshold, CachedLlm wrapper, and the distributed batch lookup
(reference llm_cache.rs)."""

import math

import pytest

from pyspark.sql import functions as F

from needle_spark.operators.llm_response_cache import (
    AdaptiveThresholdConfig,
    CachedLlm,
    EnhancedLlmCache,
    LlmCache,
    LlmCacheConfig,
    cache_lookup_batch,
    normalize_query,
)


def _cfg(**kw):
    base = dict(dimensions=3, max_entries=100,
                similarity_threshold=0.9, ttl_seconds=100.0)
    base.update(kw)
    return LlmCacheConfig(**base)


def test_normalize_and_exact_hit():
    c = LlmCache(_cfg())
    c.put("What is  the Capital of France?", [1, 0, 0], "Paris", now_s=0)
    hit = c.get_exact("what is the capital of FRANCE?", now_s=10)
    assert hit is not None and hit.response == "Paris"
    assert hit.similarity == 1.0 and hit.age_seconds == 10
    assert normalize_query("  A  b\tC ") == "a b c"
    assert c.get_exact("unknown", now_s=10) is None
    s = c.stats
    assert (s.hits, s.misses, s.exact_matches) == (1, 1, 1)


def test_semantic_hit_threshold_and_ttl():
    c = LlmCache(_cfg())
    c.put("q1", [1.0, 0.0, 0.0], "r1", now_s=0)
    c.put("q2", [0.0, 1.0, 0.0], "r2", now_s=0)
    # close to q1 (cos ~0.995) -> semantic hit on q1
    hit = c.get_semantic("other words", [0.995, 0.1, 0.0], now_s=1)
    assert hit is not None and hit.response == "r1"
    assert 0.9 <= hit.similarity < 1.0
    # orthogonal-ish -> miss
    assert c.get_semantic("x", [0.5, 0.5, 0.70], now_s=1) is None
    # expired entries never match
    assert c.get_semantic("y", [1.0, 0.0, 0.0], now_s=500) is None
    assert c.clear_expired(now_s=500) == 2 and len(c) == 0


def test_put_updates_in_place_and_lru_eviction():
    c = LlmCache(_cfg(max_entries=2))
    c.put("a", [1, 0, 0], "va", now_s=0)
    c.put("A ", [1, 0, 0], "va2", now_s=1)     # same normalized key
    assert len(c) == 1
    assert c.get_exact("a", now_s=2).response == "va2"
    c.put("b", [0, 1, 0], "vb", now_s=3)
    c.put("c", [0, 0, 1], "vc", now_s=4)       # evicts oldest ("a")
    assert len(c) == 2 and c.stats.evictions == 1
    assert c.get_exact("a", now_s=5) is None
    assert c.get_exact("c", now_s=5).response == "vc"


def test_find_similar_ranking():
    c = LlmCache(_cfg())
    c.put("near", [1, 0, 0], "x", now_s=0)
    c.put("far", [0, 1, 0], "y", now_s=0)
    ranked = c.find_similar([1, 0.05, 0], limit=2)
    assert [q for q, _ in ranked] == ["near", "far"]


def test_adaptive_threshold_moves_toward_target():
    a = AdaptiveThresholdConfig(initial_threshold=0.95, min_threshold=0.8,
                                max_threshold=0.99, target_hit_rate=0.5,
                                adjustment_step=0.01, window_size=20)
    c = EnhancedLlmCache(_cfg(), adaptive=a)
    c.put("seed", [1, 0, 0], "resp", now_s=0)
    # all misses -> threshold relaxes downward
    for i in range(15):
        c.get(f"miss {i}", [0, 1, 0], now_s=1)
    assert c.current_threshold < 0.95
    # all hits -> threshold tightens back up (clamped at max)
    for i in range(40):
        c.get("seed", [1, 0, 0], now_s=1)
    assert c.current_threshold <= a.max_threshold
    assert c.popular_queries(min_access_count=5)[0][0] == "seed"


def test_cached_llm_saves_calls():
    calls = []

    def llm(prompt):
        calls.append(prompt)
        return f"answer:{prompt}"

    def embed(prompt):
        # deterministic 3-dim embedding: same first word -> same vector
        h = hash(prompt.split()[0]) % 97
        return [math.cos(h), math.sin(h), 0.0]

    wrapper = CachedLlm(_cfg(similarity_threshold=0.99), llm, embed)
    r1 = wrapper.query("hello world", now_s=0)
    r2 = wrapper.query("hello again", now_s=1)    # same first word -> hit
    assert r1 == r2 == "answer:hello world"
    assert wrapper.llm_calls == 1
    wrapper.query("different prompt", now_s=2)
    assert wrapper.llm_calls == 2


@pytest.fixture(scope="module")
def cache_df(spark):
    rows = [
        ("what is spark", [1.0, 0.0, 0.0], "a distributed engine", 0.0, 0),
        ("define parquet", [0.0, 1.0, 0.0], "a columnar format", 0.0, 0),
        ("old entry", [0.0, 0.0, 1.0], "stale", -1000.0, 0),
    ]
    return spark.createDataFrame(
        rows, "cached_query string, embedding array<float>, response string, "
              "created_at double, access_count long")


def test_batch_lookup_exact_semantic_miss(spark, cache_df):
    batch = spark.createDataFrame(
        [(1, "  What is  SPARK ", [0.9, 0.1, 0.0]),
         (2, "parquet format?", [0.05, 0.995, 0.0]),
         (3, "unrelated", [0.577, 0.577, 0.577])],
        "query_id long, query string, embedding array<float>")
    out = {r["query_id"]: r for r in cache_lookup_batch(
        batch, cache_df, threshold=0.9).collect()}
    assert out[1]["hit_type"] == "exact" and out[1]["similarity"] == 1.0
    assert out[1]["response"] == "a distributed engine"
    assert out[2]["hit_type"] == "semantic"
    assert out[2]["response"] == "a columnar format"
    assert 0.9 <= out[2]["similarity"] < 1.0
    assert out[3]["hit_type"] is None and out[3]["response"] is None


def test_batch_lookup_ttl_filters_cache(spark, cache_df):
    batch = spark.createDataFrame(
        [(1, "q", [0.0, 0.0, 1.0])],
        "query_id long, query string, embedding array<float>")
    live = cache_lookup_batch(batch, cache_df, threshold=0.9).collect()[0]
    assert live["hit_type"] == "semantic" and live["response"] == "stale"
    # with TTL enforcement at now=0, the -1000-created entry is gone
    dead = cache_lookup_batch(batch, cache_df, threshold=0.9,
                              now_s=0.0, ttl_seconds=100.0).collect()[0]
    assert dead["hit_type"] is None


def test_batch_lookup_plan_has_no_shuffle_on_batch(spark, cache_df):
    batch = spark.range(50).select(
        F.col("id").alias("query_id"),
        F.concat(F.lit("prompt "), F.col("id")).alias("query"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)).cast("array<float>")
        .alias("embedding"))
    plan = cache_lookup_batch(batch, cache_df, threshold=0.99) \
        ._jdf.queryExecution().executedPlan().toString()
    # the union arms join broadcast sides only — no hash exchange of the batch
    assert "Exchange hashpartitioning" not in plan


def test_batch_lookup_duckdb_parity(spark, cache_df):
    import duckdb

    from needle_spark.functions.distance import duckdb_distance_sql
    from needle_spark.operators.llm_response_cache import (
        duckdb_cache_lookup_sql,
    )

    batch = spark.createDataFrame(
        [(1, "zz1", [0.9, 0.1, 0.0]), (2, "zz2", [0.05, 0.995, 0.0]),
         (3, "zz3", [0.6, 0.6, 0.52])],
        "query_id long, query string, embedding array<float>")
    spark_rows = sorted(
        (r["query_id"], r["hit_type"], r["cached_query"],
         None if r["similarity"] is None else round(r["similarity"], 6))
        for r in cache_lookup_batch(batch, cache_df, threshold=0.9).collect())
    con = duckdb.connect()
    con.register("batch_pdf", batch.toPandas())
    con.register("cache_pdf", cache_df.toPandas())
    sql = duckdb_cache_lookup_sql(
        "SELECT query_id, embedding FROM batch_pdf",
        "SELECT cached_query, embedding, response FROM cache_pdf",
        0.9, lambda a, b: duckdb_distance_sql("cosine", a, b))
    oracle = sorted(
        (r[0], r[1], r[2], None if r[4] is None else round(r[4], 6))
        for r in con.execute(sql).fetchall())
    assert spark_rows == oracle
