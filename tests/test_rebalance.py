"""Shard rebalancing: routing, plans, batched transfer, digest
verification (reference rebalance.rs)."""

import pytest

from pyspark.sql import functions as F

from needle_spark.plans.rebalance import (
    apply_rebalance,
    plan_add_shard,
    plan_full_rebalance,
    plan_remove_shard,
    rebalance_stats,
    resume_filter,
    route_expr,
    shard_digests,
    transfer_batches,
    verify_transfer,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(500).select(F.col("id").cast("string").alias("id"))


def test_route_expr_deterministic_and_balanced(ids):
    routed = ids.select("id", route_expr("id", 4).alias("s"))
    again = ids.select("id", route_expr("id", 4).alias("s"))
    assert routed.exceptAll(again).count() == 0
    counts = [r["c"] for r in
              routed.groupBy("s").agg(F.count("*").alias("c")).collect()]
    assert len(counts) == 4
    assert max(counts) < 2.5 * min(counts)   # roughly balanced


def test_plan_add_shard_covers_every_relocation(ids):
    """Growing the topology must move EVERY id whose hash-mod placement
    changed — including ids re-homed between existing shards; dropping
    those leaves them unreachable under route_expr(id, new)."""
    plan = plan_add_shard(ids, old_shards=4, new_shards=5)
    # each mover's target is exactly the new-topology route
    check = plan.movers.withColumn("r", route_expr("id", 5))
    assert check.filter(F.col("r") != F.col("target_shard")).count() == 0
    # reachability: every id is findable at route(id, 5) after the plan
    stay = ids.join(plan.movers.select("id"), "id", "left_anti")
    misplaced = stay.filter(route_expr("id", 5) != route_expr("id", 4))
    assert misplaced.count() == 0
    assert 0 < plan.total() < 500
    assert "Add shards 4->5" in plan.description


def test_plan_remove_shard_distributes_remainder(ids):
    """Removal shrinks the topology: survivors relabel contiguously
    and routing becomes route(id, n-1) — the expression readers use.
    Everything on the removed shard moves, plus any id whose shrunk
    placement differs from its relabeled current shard."""
    plan = plan_remove_shard(ids, shard_to_remove=2, n_shards=4)
    # targets are NEW-topology labels, computed by the shared router
    check = plan.movers.withColumn("r", route_expr("id", 3))
    assert check.filter(F.col("r") != F.col("target_shard")).count() == 0
    assert {r["target_shard"] for r in plan.movers.collect()} <= {0, 1, 2}
    # everything on the removed shard is in the plan
    on_shard = ids.filter(route_expr("id", 4) == 2)
    gone = on_shard.join(plan.movers.select("id"), "id", "left_anti")
    assert gone.count() == 0
    # reachability: non-movers' relabeled shard == route(id, 3)
    old = route_expr("id", 4)
    relabeled = F.when(old > 2, old - 1).otherwise(old)
    stay = ids.join(plan.movers.select("id"), "id", "left_anti")
    assert stay.filter(relabeled != route_expr("id", 3)).count() == 0


def test_plan_full_rebalance_heals_drift(ids, spark):
    # rows currently placed by a WRONG rule (mod 10 of numeric id)
    cur = ids.withColumn("cur", (F.col("id").cast("long") % 4).cast("int"))
    plan = plan_full_rebalance(cur, n_shards=4, current_shard_col="cur")
    # after applying, nothing moves under a second planning pass
    healed = plan.movers.select("id", F.col("target_shard").alias("cur")) \
        .unionByName(
            cur.join(plan.movers.select("id"), "id", "left_anti")
            .select("id", "cur"))
    plan2 = plan_full_rebalance(healed, n_shards=4, current_shard_col="cur")
    assert plan2.total() == 0


def test_transfer_batches_and_resume(ids):
    plan = plan_add_shard(ids, 4, 5)
    batched = transfer_batches(plan.movers, n_batches=8)
    bvals = {r["batch"] for r in batched.select("batch").distinct().collect()}
    assert bvals <= set(range(8)) and len(bvals) > 1
    done = sorted(bvals)[:3]
    rest = resume_filter(batched, done)
    assert rest.count() == batched.filter(~F.col("batch").isin(done)).count()
    assert resume_filter(batched, []).count() == batched.count()


def test_apply_and_verify_roundtrip(ids):
    placed = apply_rebalance(ids, n_shards=4)
    # partitioning is physical: each shard maps to exactly one partition set
    pid = placed.withColumn("p", F.spark_partition_id()) \
        .select("shard", "p").distinct().collect()
    by_shard = {}
    for r in pid:
        by_shard.setdefault(r["shard"], set()).add(r["p"])
    assert all(len(v) == 1 for v in by_shard.values())
    # verification: identical data -> no mismatches
    assert verify_transfer(placed, placed).count() == 0
    # a lost row is caught
    broken = placed.filter(F.col("id") != "7")
    bad = verify_transfer(placed, broken).collect()
    lost_shard = placed.filter(F.col("id") == "7").collect()[0]["shard"]
    assert [r["shard"] for r in bad] == [lost_shard]
    # digest is partition-invariant
    a = {(r["shard"], r["n"], r["digest"])
         for r in shard_digests(placed).collect()}
    b = {(r["shard"], r["n"], r["digest"])
         for r in shard_digests(placed.repartition(3)).collect()}
    assert a == b


def test_rebalance_stats(ids):
    p1 = plan_add_shard(ids, 4, 5)
    p2 = plan_remove_shard(ids, 0, 5)
    st = rebalance_stats([p1, p2])
    assert st["total_migrations"] == 2
    assert st["total_vectors_migrated"] == p1.total() + p2.total()
    assert st["largest_plan_vectors"] == max(p1.total(), p2.total())
