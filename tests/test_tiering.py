"""Tiered storage (reference:
src/services/storage/tiered_service.rs): insert-starts-hot, age-based
demotion, access-based promotion, capacity eviction, cross-tier
search."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.plans.tiering import TieredCollection, TierPolicy

HOUR = 3600
NOW = 1_000_000_000


@pytest.fixture()
def tc(spark, tmp_path):
    db = Database(spark, str(tmp_path / "tierdb"))
    return TieredCollection(
        db, TierPolicy(warm_after_secs=HOUR, cold_after_secs=24 * HOUR,
                       promotion_threshold=2, hot_capacity=10),
        dims=4)


def _rows(spark, items):
    return spark.createDataFrame(
        [(i, v) for i, v in items], "id string, vector array<float>")


def test_insert_starts_hot_and_search(spark, tc):
    tc.insert(_rows(spark, [("a", [1.0, 0.0, 0.0, 0.0]), ("b", [0.0, 1.0, 0.0, 0.0])]),
              now=NOW)
    assert tc.get_tier("a") == "hot"
    got = tc.search([1.0, 0.0, 0.0, 0.0], k=1, record=False).collect()
    assert got[0]["id"] == "a" and got[0]["tier"] == "hot"
    assert tc.tier_stats() == {"hot": 2, "warm": 0, "cold": 0}


def test_maintenance_demotes_by_age(spark, tc):
    tc.insert(_rows(spark, [("fresh", [1.0, 0.0, 0.0, 0.0])]), now=NOW)
    tc.insert(_rows(spark, [("stale", [0.0, 1.0, 0.0, 0.0])]), now=NOW - 2 * HOUR)
    tc.insert(_rows(spark, [("ancient", [0.0, 0.0, 1.0, 0.0])]),
              now=NOW - 48 * HOUR)
    rep = tc.run_maintenance(now=NOW)
    assert rep.demoted_to_warm == 1 and rep.demoted_to_cold == 1
    assert tc.get_tier("fresh") == "hot"
    assert tc.get_tier("stale") == "warm"
    assert tc.get_tier("ancient") == "cold"
    # cross-tier search still finds everything, tagged by serving tier
    got = {r["id"]: r["tier"] for r in
           tc.search([0.0, 0.0, 1.0, 0.0], k=3, record=False).collect()}
    assert got["ancient"] == "cold" and got["fresh"] == "hot"


def test_access_promotes_back(spark, tc):
    tc.insert(_rows(spark, [("w", [1.0, 0.0, 0.0, 0.0])]), now=NOW - 2 * HOUR)
    tc.run_maintenance(now=NOW)
    assert tc.get_tier("w") == "warm"
    # two recent accesses clear the promotion threshold
    tc.record_access(["w"], now=NOW)
    tc.record_access(["w"], now=NOW)
    rep = tc.run_maintenance(now=NOW)
    assert rep.promoted_to_hot == 1
    assert tc.get_tier("w") == "hot"


def test_capacity_eviction(spark, tmp_path):
    db = Database(spark, str(tmp_path / "capdb"))
    tc = TieredCollection(db, TierPolicy(hot_capacity=2,
                                         warm_after_secs=10 * HOUR,
                                         cold_after_secs=100 * HOUR),
                          dims=2)
    tc.insert(_rows(spark, [("a", [1.0, 0.0])]), now=NOW - 30)
    tc.insert(_rows(spark, [("b", [0.0, 1.0])]), now=NOW - 20)
    tc.insert(_rows(spark, [("c", [0.5, 0.5])]), now=NOW - 10)
    rep = tc.run_maintenance(now=NOW)
    assert rep.capacity_evictions == 1
    stats = tc.tier_stats()
    assert stats["hot"] == 2 and stats["warm"] == 1
    assert tc.get_tier("a") == "warm"  # least recently touched evicts


def test_manual_promote_demote(spark, tc):
    tc.insert(_rows(spark, [("x", [1.0, 0.0, 0.0, 0.0])]), now=NOW)
    assert tc.demote("x", "cold") is True
    assert tc.get_tier("x") == "cold"
    assert tc.promote("x") is True
    assert tc.get_tier("x") == "hot"
    assert tc.demote("missing") is False
    with pytest.raises(ValueError):
        tc.demote("x", "frozen")


def test_search_records_access(spark, tc):
    tc.insert(_rows(spark, [("a", [1.0, 0.0, 0.0, 0.0])]), now=NOW)
    tc.search([1.0, 0.0, 0.0, 0.0], k=1, record=True)
    row = tc.collection.df().filter(F.col("id") == "a").first()
    assert row["access_count"] == 1
