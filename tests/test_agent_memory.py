"""Agentic memory (reference: src/experimental/agentic_memory.rs):
decay functions, relevance-scored recall, consolidation, expiry."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.operators.agent_memory import (
    AgentMemory,
    MemoryConfig,
    decay_factor_expr,
    recall_scores,
)

HOUR = 3600


def _eval(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def test_decay_functions(spark):
    age = F.lit(168.0)
    assert _eval(spark, decay_factor_expr("none", age)) == 1.0
    assert _eval(spark, decay_factor_expr(
        "exponential", age, half_life_hours=168.0)) == pytest.approx(0.5)
    assert _eval(spark, decay_factor_expr(
        "linear", age, decay_rate_per_hour=0.01)) == pytest.approx(0.0)
    assert _eval(spark, decay_factor_expr(
        "step", F.lit(49.0), interval_hours=24.0,
        decay_per_step=0.2)) == pytest.approx(0.6)
    assert _eval(spark, decay_factor_expr(
        "power_law", F.lit(9.0), exponent=1.0)) == pytest.approx(0.1)
    with pytest.raises(ValueError):
        decay_factor_expr("cliff", age)


def test_recall_scores_blend(spark):
    now = 1000 * HOUR
    mems = spark.createDataFrame(
        [("m1", [1.0, 0.0], 1.0, now),           # similar + fresh
         ("m2", [0.0, 1.0], 1.0, now),           # dissimilar + fresh
         ("m3", [1.0, 0.0], 1.0, now - 168 * HOUR)],  # similar + decayed
        "id string, vector array<float>, importance double, created_at long")
    scored = {r["id"]: r for r in recall_scores(
        mems, [1.0, 0.0], now).collect()}
    assert scored["m1"]["relevance"] == pytest.approx(0.7 + 0.3)
    assert scored["m2"]["relevance"] == pytest.approx(0.3)  # importance only
    assert scored["m3"]["relevance"] == pytest.approx(0.7 + 0.15)
    # threshold filters dissimilar memories out
    kept = recall_scores(mems, [1.0, 0.0], now,
                         recall_threshold=0.5).collect()
    assert {r["id"] for r in kept} == {"m1", "m3"}


@pytest.fixture()
def am(spark, tmp_path):
    db = Database(spark, str(tmp_path / "memdb"))
    return AgentMemory(db, MemoryConfig(dimensions=2,
                                        consolidation_threshold=0.6,
                                        short_term_ttl_secs=HOUR))


def test_remember_recall_accessed(am):
    now = 1000 * HOUR
    m1 = am.remember("spark is lazy", [1.0, 0.0], "semantic",
                     importance=0.9, now=now)
    am.remember("unrelated", [0.0, 1.0], "episodic", importance=0.9, now=now)
    got = am.recall([1.0, 0.0], limit=1, now=now)
    assert got[0]["id"] == m1
    assert got[0]["content"] == "spark is lazy"
    # access marking bumped the counter via upsert
    row = am.collection.df().filter(F.col("id") == m1).first()
    assert row["access_count"] == 1
    # type-filtered recall
    epi = am.recall([1.0, 0.0], limit=5, memory_types=["episodic"], now=now)
    assert all(r["memory_type"] == "episodic" for r in epi)
    st = am.stats()
    assert st["total_memories"] == 2 and st["total_recalls"] == 2


def test_consolidate_and_expire(am):
    now = 1000 * HOUR
    keep = am.remember("important", [1.0, 0.0], "short_term",
                       importance=0.9, now=now - HOUR)
    am.remember("trivial", [0.0, 1.0], "short_term",
                importance=0.1, now=now - HOUR)
    stale = am.remember("old", [0.5, 0.5], "short_term",
                        importance=0.1, now=now - 10 * HOUR)
    n = am.consolidate(now=now)
    assert n == 1  # only the important one clears 0.6 after decay
    row = am.collection.df().filter(F.col("id") == keep).first()
    assert row["memory_type"] == "long_term"

    cleared = am.clear_expired(now=now)
    assert cleared >= 1  # the stale short-term memory (and maybe trivial)
    left = {r["id"] for r in am.collection.df().select("id").collect()}
    assert stale not in left and keep in left


def test_forget_and_working(am):
    now = 1000 * HOUR
    wid = am.remember("context", [1.0, 0.0], "working", now=now)
    assert [m["id"] for m in am.working_memory()] == [wid]
    assert am.forget(wid) is True
    assert am.forget(wid) is False
    with pytest.raises(ValueError):
        am.remember("x", [1.0, 0.0], "eidetic")
