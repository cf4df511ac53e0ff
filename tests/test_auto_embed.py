"""Auto-embedding: model catalog, backends, caching embedder, batch
dedup, distributed embed stage (reference auto_embed.rs /
model_registry.rs)."""

import math

import pytest

from pyspark.sql import functions as F

from needle_spark.operators.auto_embed import (
    AutoEmbedConfig,
    AutoEmbedder,
    DEFAULT_REGISTRY,
    EmbeddingBackend,
    ModelRegistry,
    embed_text_column,
    mock_embedding,
)


def test_registry_lookup_aliases_and_tiers():
    r = DEFAULT_REGISTRY
    assert r.from_name("minilm").name == "all-MiniLM-L6-v2"
    assert r.from_name("BGE-LARGE").dimensions == 1024
    assert r.from_name("nope") is None
    assert {m.quality_tier for m in r.list_by_tier("fast")} == {"fast"}
    assert all(m.dimensions == 768 for m in r.list_by_dimensions(768))
    assert len(r.list_models()) == 11


def test_recommend_model_smallest_meeting_constraints():
    r = DEFAULT_REGISTRY
    # smallest fast 384-dim model is gte-small (70 MB)
    assert r.recommend_model(dimensions=384, tier="fast").name == "gte-small"
    assert r.recommend_model(dimensions=1024,
                             max_size_mb=1000) is None   # both too large
    assert r.recommend_model().size_mb == 70             # global smallest


def test_backend_factories():
    b = EmbeddingBackend.from_registry("e5-base")
    assert b.kind == "registry" and b.dimensions == 768
    with pytest.raises(ValueError, match="unknown registry model"):
        EmbeddingBackend.from_registry("made-up")
    assert EmbeddingBackend.mock(64).dimensions == 64
    o = EmbeddingBackend.openai("k", "text-embedding-3-small", 1536)
    assert o.kind == "openai" and o.dimensions == 1536


def test_mock_embedding_deterministic_and_normalized():
    a = mock_embedding("hello world", 32)
    b = mock_embedding("hello world", 32)
    c = mock_embedding("other text", 32)
    assert a == b and a != c and len(a) == 32
    assert sum(x * x for x in a) == pytest.approx(1.0, abs=1e-6)
    raw = mock_embedding("hello world", 32, normalize=False)
    assert all(-1.0 <= x <= 1.0 for x in raw)


def test_embedder_cache_hits_and_ttl():
    e = AutoEmbedder(AutoEmbedConfig.mock(16))
    v1 = e.embed("alpha", now_s=0)
    v2 = e.embed("alpha", now_s=1)
    assert v1 == v2
    assert e.stats.cache_hits == 1 and e.stats.embeddings_generated == 1
    # TTL expiry forces regeneration
    e2 = AutoEmbedder(AutoEmbedConfig(
        EmbeddingBackend.mock(16), cache_ttl_seconds=10))
    e2.embed("x", now_s=0)
    e2.embed("x", now_s=20)
    assert e2.stats.embeddings_generated == 2
    assert e2.stats.cache_hit_ratio == 0.0


def test_embedder_cache_eviction_bounded():
    e = AutoEmbedder(AutoEmbedConfig(
        EmbeddingBackend.mock(8), cache_size=3))
    for i in range(10):
        e.embed(f"t{i}", now_s=i)
    assert e.cache_stats()[0] <= 3


def test_embed_batch_chunks_through_transport():
    calls = []

    def transport(texts):
        calls.append(list(texts))
        return [[float(len(t)), 0.0] for t in texts]

    e = AutoEmbedder(
        AutoEmbedConfig(EmbeddingBackend.openai("k", "m", 2), batch_size=2),
        transport=transport)
    out = e.embed_batch(["a", "bb", "ccc", "bb", "dddd"], now_s=0)
    # "bb" deduplicates via the cache inside the same call? No — cache
    # fills after generation; duplicates in one batch both generate
    # unless previously cached. First occurrence generates, the second
    # was checked before generation -> also generated.
    assert out[1] == out[3] == [2.0, 0.0]
    assert all(len(c) <= 2 for c in calls)        # batch_size respected
    # a second batch is served fully from cache
    calls.clear()
    e.embed_batch(["a", "bb"], now_s=1)
    assert calls == []


def test_transport_required_for_api_backends():
    e = AutoEmbedder(AutoEmbedConfig(EmbeddingBackend.openai("k", "m", 4)))
    with pytest.raises(RuntimeError, match="transport"):
        e.embed("x")
    bad = AutoEmbedder(
        AutoEmbedConfig(EmbeddingBackend.openai("k", "m", 4)),
        transport=lambda ts: [[1.0]] * len(ts))
    with pytest.raises(ValueError, match="dim"):
        bad.embed("x")


def test_embed_text_column_distributed(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "other text"), (3, "hello world"),
         (4, None)],
        "id long, body string")
    out = {r["id"]: r["embedding"]
           for r in embed_text_column(
               df, "body", AutoEmbedConfig.mock(16)).collect()}
    assert out[1] == out[3]                      # deterministic
    assert out[1] != out[2]
    expected = mock_embedding("hello world", 16)
    assert out[1] == pytest.approx(expected, abs=1e-6)
    assert len(out[4]) == 16                     # null -> "" embedding
