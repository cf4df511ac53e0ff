"""Lifecycle policies — lifecycle.rs parity: rule builders, last-match
evaluation, metadata filters, engine scoping/stats, and distributed
classification + execution against the catalog."""

import os

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Collection
from needle_spark.lifecycle import (
    ARCHIVE,
    COMPRESS,
    DELETE,
    NONE,
    LifecycleError,
    LifecyclePolicy,
    LifecyclePolicyEngine,
    LifecycleRule,
)

DAY_MS = 86400 * 1000


def test_rule_builders():
    r = LifecycleRule.ttl_days("t", 30)
    assert (r.action, r.age_seconds) == (DELETE, 30 * 86400)
    assert LifecycleRule.archive_days("a", 7).action == ARCHIVE
    assert LifecycleRule.compress_days("c", 1).action == COMPRESS
    with pytest.raises(LifecycleError):
        LifecycleRule("bad", "explode", 1)


def test_last_matching_rule_wins():
    # lifecycle.rs:125-155 — the tiered ladder: compress@1d,
    # archive@7d, delete@30d; an old row matches ALL, delete wins.
    p = LifecyclePolicy.tiered("ladder", 1, 7, 30)
    assert p.evaluate(0) == NONE
    assert p.evaluate(2 * 86400) == COMPRESS
    assert p.evaluate(10 * 86400) == ARCHIVE
    assert p.evaluate(40 * 86400) == DELETE
    p.enabled = False
    assert p.evaluate(40 * 86400) == NONE


def test_metadata_filter_and_disabled_rules():
    rule = LifecycleRule("logs-only", DELETE, 86400,
                         metadata_filter={"kind": "log"})
    p = LifecyclePolicy("p").with_rule(rule)
    assert p.evaluate(2 * 86400, {"kind": "log"}) == DELETE
    assert p.evaluate(2 * 86400, {"kind": "doc"}) == NONE
    assert p.evaluate(2 * 86400, None) == NONE
    rule.enabled = False
    assert p.evaluate(2 * 86400, {"kind": "log"}) == NONE


def test_engine_scoping_and_stats():
    eng = LifecyclePolicyEngine()
    eng.add_policy(LifecyclePolicy.ttl_only("docs-ttl", 1)
                   .for_collection("docs"))
    eng.add_policy(LifecyclePolicy.ttl_only("global-ttl", 10))
    # scoped policy wins for its collection; unscoped covers the rest
    assert eng.evaluate("docs", 2 * 86400) == DELETE
    assert eng.evaluate("other", 2 * 86400) == NONE  # below global 10d
    assert eng.evaluate("other", 20 * 86400) == DELETE
    assert eng.stats.evaluations == 3
    assert eng.stats.actions_taken[DELETE] == 2
    assert eng.remove_policy("global-ttl") is True
    assert eng.policy_for("other") is None


@pytest.fixture()
def aged_coll(spark, tmp_path):
    coll = Collection.create(
        spark, str(tmp_path / "aged"), dims=2,
        schema="id string, vector array<float>, kind string")
    now = 100 * DAY_MS
    rows = [
        ("fresh", [1.0, 0.0], "doc", now - 1 * DAY_MS // 2),
        ("warm", [1.0, 0.0], "doc", now - 2 * DAY_MS),
        ("old", [1.0, 0.0], "doc", now - 10 * DAY_MS),
        ("ancient", [1.0, 0.0], "log", now - 40 * DAY_MS),
    ]
    df = spark.createDataFrame(
        rows, "id string, vector array<float>, kind string, inserted_at long")
    # insert stamps inserted_at; overwrite with our ages via upsert rows
    for rid, vec, kind, ts in rows:
        coll.insert(spark.createDataFrame(
            [(rid, vec, kind)], "id string, vector array<float>, kind string"),
            now_ms=ts)
    return coll, now


def test_distributed_classification(spark, aged_coll):
    coll, now = aged_coll
    eng = LifecyclePolicyEngine()
    eng.add_policy(LifecyclePolicy.tiered("ladder", 1, 7, 30))
    got = {r["id"]: r["lifecycle_action"]
           for r in eng.classify(coll, now_ms=now).collect()}
    assert got == {"fresh": NONE, "warm": COMPRESS, "old": ARCHIVE,
                   "ancient": DELETE}
    # classification adds only the CDC age join (this fixture's schema
    # has no inserted_at column) — never Python, never a sort-merge join
    plan = eng.classify(coll, now_ms=now)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "SortMergeJoin" not in plan
    # with a native inserted_at column the action is a pure scan
    # expression: no joins at all
    aged_df = coll.df().withColumn("inserted_at", F.lit(now - 2 * DAY_MS))
    pol = eng.policy_for("aged")
    pure = aged_df.withColumn("lifecycle_action", pol.action_column(now))
    pplan = pure._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in pplan and "BatchEvalPython" not in pplan


def test_apply_executes_setwise(spark, aged_coll, tmp_path):
    coll, now = aged_coll
    eng = LifecyclePolicyEngine()
    eng.add_policy(LifecyclePolicy.tiered("ladder", 1, 7, 30))
    arch = str(tmp_path / "archive")
    counts = eng.apply(coll, archive_dir=arch, now_ms=now)
    assert counts == {DELETE: 1, ARCHIVE: 1, COMPRESS: 1, NONE: 1}
    left = sorted(r["id"] for r in coll.df().select("id").collect())
    assert left == ["fresh", "warm"]  # old archived, ancient deleted
    # the archived row landed in real parquet
    archived = spark.read.parquet(os.path.join(arch, "aged"))
    assert [r["id"] for r in archived.collect()] == ["old"]
    assert eng.stats.actions_taken == {DELETE: 1, ARCHIVE: 1, COMPRESS: 1}


def test_apply_requires_archive_dir(spark, aged_coll):
    coll, now = aged_coll
    eng = LifecyclePolicyEngine()
    eng.add_policy(LifecyclePolicy("p").with_rule(
        LifecycleRule.archive_days("a", 7)))
    with pytest.raises(LifecycleError, match="archive_dir"):
        eng.apply(coll, now_ms=now)


def test_metadata_filter_distributed(spark, aged_coll):
    coll, now = aged_coll
    eng = LifecyclePolicyEngine()
    eng.add_policy(LifecyclePolicy("logs").with_rule(LifecycleRule(
        "logs-del", DELETE, 30 * 86400, metadata_filter={"kind": "log"})))
    got = {r["id"]: r["lifecycle_action"]
           for r in eng.classify(coll, now_ms=now).collect()}
    assert got["ancient"] == DELETE  # 40d old log
    assert all(v == NONE for k, v in got.items() if k != "ancient")
