"""Semantic cache depth (semantic_cache.rs): TTL + sweep, eviction
policies, threshold override, drift invalidation, warm-up, analytics."""

import pytest

from needle_spark.operators.semantic_cache import CacheHit, SemanticCache


def test_ttl_expiry_on_touch_and_sweep():
    c = SemanticCache(similarity_threshold=0.9, default_ttl_seconds=100)
    c.store([1.0, 0.0], "resp-a", now=1000)
    assert c.lookup([1.0, 0.0], now=1050) == "resp-a"
    # expired entry is removed ON TOUCH and counts as an expiration
    assert c.lookup([1.0, 0.0], now=1200) is None
    assert c.analytics.total_expirations == 1
    assert len(c.entries) == 0

    c.store([0.0, 1.0], "resp-b", now=1000, ttl_seconds=10)  # override default
    c.store([1.0, 1.0], "resp-c", now=1000, ttl_seconds=10_000)
    assert c.sweep_expired(now=2000) == 1  # only b expired
    assert len(c.entries) == 1


def test_eviction_policies():
    # LFU: the never-hit entry goes first
    c = SemanticCache(similarity_threshold=0.999, max_entries=2,
                      eviction_policy="lfu")
    c.store([1.0, 0.0], "a", now=1)
    c.store([0.0, 1.0], "b", now=2)
    assert c.lookup([1.0, 0.0], now=3) == "a"  # a gains a hit
    c.store([1.0, 1.0], "c", now=4)            # evicts b (0 hits)
    assert c.lookup([0.0, 1.0], now=5) is None
    assert c.lookup([1.0, 0.0], now=6) == "a"

    # LRU: the least-recently-touched goes first
    c = SemanticCache(similarity_threshold=0.999, max_entries=2,
                      eviction_policy="lru")
    c.store([1.0, 0.0], "a", now=1)
    c.store([0.0, 1.0], "b", now=2)
    assert c.lookup([1.0, 0.0], now=3) == "a"  # refreshes a
    c.store([1.0, 1.0], "c", now=4)            # evicts b (older access)
    assert c.lookup([0.0, 1.0], now=5) is None

    # FIFO: insertion order wins regardless of hits
    c = SemanticCache(similarity_threshold=0.999, max_entries=2,
                      eviction_policy="fifo")
    c.store([1.0, 0.0], "a", now=1)
    c.store([0.0, 1.0], "b", now=2)
    c.lookup([1.0, 0.0], now=3)
    c.store([1.0, 1.0], "c", now=4)            # evicts a despite its hit
    assert c.lookup([1.0, 0.0], now=5) is None

    with pytest.raises(ValueError, match="eviction"):
        SemanticCache(eviction_policy="random")


def test_threshold_override_and_detailed_hit():
    c = SemanticCache(similarity_threshold=0.999)
    c.store([1.0, 0.0], "resp", query_text="orig query", model="m1", now=1)
    near = [0.95, 0.05]
    assert c.lookup(near, now=2) is None           # strict default
    hit = c.lookup(near, now=3, threshold_override=0.9, detailed=True)
    assert isinstance(hit, CacheHit)
    assert hit.response == "resp" and hit.cached_query == "orig query"
    assert hit.model == "m1" and 0.0 < hit.distance < 0.1


def test_invalidate_drifted_and_warmup():
    c = SemanticCache(similarity_threshold=0.9)
    n = c.warm_up([([1.0, 0.0], "a"), ([0.0, 1.0], "b")], now=1)
    assert n == 2 and len(c.entries) == 2
    # reference embeddings near [1,0] only: the [0,1] entry drifted away
    dropped = c.invalidate_drifted([[0.99, 0.01]], drift_threshold=0.5)
    assert dropped == 1
    assert c.lookup([1.0, 0.0], now=2) == "a"
    assert c.lookup([0.0, 1.0], now=3) is None


def test_analytics_summary():
    c = SemanticCache(similarity_threshold=0.9)
    c.store([1.0, 0.0], "a", now=1)
    c.lookup([1.0, 0.0], now=2)      # hit, distance 0
    c.lookup([0.0, 1.0], now=3)      # miss
    s = c.stats_summary()
    assert s["total_lookups"] == 2 and s["total_hits"] == 1
    assert s["hit_rate"] == 0.5
    assert s["avg_hit_distance"] < 1e-9
    assert c.analytics.estimated_savings_usd(0.01) == 0.01
    eid = next(iter(c.entries))
    assert c.invalidate(eid) and not c.invalidate(eid)
    c.clear()
    assert len(c.entries) == 0
