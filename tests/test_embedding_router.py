"""Embedding provider routing (reference:
src/services/embedding/embedding_router.rs): strategies, health
tracking, pins, and batch failover."""

import pytest

from needle_spark.operators.embedding_router import (
    EmbeddingRouter,
    ProviderEntry,
    RouterConfig,
)


def _router(strategy="priority_chain", max_failures=2):
    r = EmbeddingRouter(RouterConfig(max_failures=max_failures,
                                     strategy=strategy))
    r.register(ProviderEntry("alpha", 16, cost_per_token=2.0,
                             embed_fn=lambda t: [1.0] * 16))
    r.register(ProviderEntry("beta", 16, cost_per_token=0.5,
                             embed_fn=lambda t: [2.0] * 16))
    return r


def test_strategies():
    assert _router("priority_chain").route() == "alpha"
    assert _router("lowest_cost").route() == "beta"
    rr = _router("round_robin")
    assert [rr.route(), rr.route(), rr.route()] == ["alpha", "beta", "alpha"]
    lat = _router("lowest_latency")
    lat.record_success("alpha", 50.0)
    lat.record_success("beta", 5.0)
    assert lat.route() == "beta"
    with pytest.raises(ValueError):
        RouterConfig(strategy="random")


def test_health_and_failover_routing():
    r = _router(max_failures=2)
    r.record_failure("alpha")
    assert r.route() == "alpha"  # one failure: still healthy
    r.record_failure("alpha")
    assert r.route() == "beta"   # marked unhealthy
    r.record_success("alpha", 10.0)  # recovery re-marks healthy
    assert r.route() == "alpha"
    st = {s["name"]: s for s in r.stats()}
    assert st["alpha"]["total_calls"] == 3


def test_pins_fall_through_when_unhealthy():
    r = _router(max_failures=1)
    r.pin_collection("docs", "beta")
    assert r.route("docs") == "beta"
    r.record_failure("beta")
    assert r.route("docs") == "alpha"  # pin unhealthy -> strategy
    r.unpin_collection("docs")
    assert r.route("docs") == "alpha"


def test_embed_with_fallback():
    calls = []

    def flaky(t):
        calls.append(t)
        raise TimeoutError("api down")

    r = EmbeddingRouter(RouterConfig(max_failures=1))
    r.register(ProviderEntry("flaky", 2, 1.0, embed_fn=flaky))
    r.register(ProviderEntry("solid", 2, 2.0, embed_fn=lambda t: [0.1, 0.2]))
    vecs, used = r.embed_with_fallback(["a", "b"])
    assert used == "solid" and vecs == [[0.1, 0.2], [0.1, 0.2]]
    assert not r.get("flaky").healthy
    # everything down -> explicit error
    r.record_failure("solid")
    with pytest.raises(RuntimeError, match="no healthy|all providers"):
        r.embed_with_fallback(["x"])


def test_embed_udf_bridges_to_spark(spark):
    r = _router("lowest_cost")
    udf, name = r.embed_udf()
    assert name == "beta"
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("hello",)], "text string")
    row = df.select(udf(F.col("text")).alias("v")).first()
    assert row["v"] == [2.0] * 16


def test_failover_on_first_transient_failure():
    """A single transient failure of the routed provider fails over to
    the next healthy provider within the SAME batch, even though the
    failing provider stays globally healthy (max_failures not reached)."""
    r = EmbeddingRouter(RouterConfig(max_failures=3))
    calls = {"a": 0}

    def flaky_once(t):
        calls["a"] += 1
        raise TimeoutError("blip")

    r.register(ProviderEntry("alpha", 2, 1.0, embed_fn=flaky_once))
    r.register(ProviderEntry("beta", 2, 2.0, embed_fn=lambda t: [9.0, 9.0]))
    vecs, used = r.embed_with_fallback(["x"])
    assert used == "beta" and vecs == [[9.0, 9.0]]
    assert r.get("alpha").healthy  # one failure < max_failures
