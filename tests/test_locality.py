"""Locality-aware compaction: co-access pair counting, fragmentation,
clustered layout planning (reference locality_compaction.rs)."""

import pytest

from pyspark.sql import functions as F

from needle_spark.plans.locality import (
    CompactionConfig,
    auto_num_clusters,
    co_access_pairs,
    compacted_layout,
    fragmentation_ratio,
    plan_compaction,
    should_compact,
    top_pairs,
    tracked_vectors,
)


@pytest.fixture(scope="module")
def access_log(spark):
    rows = [
        (1, ["v1", "v2", "v3"]),
        (2, ["v1", "v2"]),
        (3, ["v3", "v4"]),
        (4, ["v2", "v1"]),          # order-insensitive canonical pairs
        (5, ["v5", "v5", "v1"]),    # duplicates collapse
    ]
    return spark.createDataFrame(rows, "query_id long, result_ids array<string>")


def test_pair_counts_match_reference_semantics(access_log):
    pairs = {(r["id_a"], r["id_b"]): r["n_co"]
             for r in co_access_pairs(access_log).collect()}
    # locality_compaction.rs test_co_access_tracking
    assert pairs[("v1", "v2")] == 3
    assert pairs[("v1", "v3")] == 1
    assert pairs[("v2", "v3")] == 1
    assert pairs[("v3", "v4")] == 1
    assert pairs[("v1", "v5")] == 1
    assert ("v5", "v5") not in pairs
    assert ("v2", "v1") not in pairs      # canonical a < b only


def test_min_count_and_top_pairs(access_log):
    filtered = co_access_pairs(access_log, min_count=2).collect()
    assert [(r["id_a"], r["id_b"]) for r in filtered] == [("v1", "v2")]
    top = top_pairs(co_access_pairs(access_log), limit=2).collect()
    assert (top[0]["id_a"], top[0]["id_b"], top[0]["n_co"]) == ("v1", "v2", 3)
    tracked = {r["id"] for r in
               tracked_vectors(co_access_pairs(access_log)).collect()}
    assert tracked == {"v1", "v2", "v3", "v4", "v5"}


def test_fragmentation_ratio_bounds(spark, access_log):
    pairs = co_access_pairs(access_log)
    frag = fragmentation_ratio(pairs)
    # 5 pairs, counts [3,1,1,1,1]: 1 - 7/(5*3)
    assert frag == pytest.approx(1.0 - 7.0 / 15.0)
    # uniform counts -> 0 fragmentation
    uniform = spark.createDataFrame(
        [("a", "b", 4), ("c", "d", 4)], "id_a string, id_b string, n_co long")
    assert fragmentation_ratio(uniform) == pytest.approx(0.0)
    empty = uniform.filter(F.lit(False))
    assert fragmentation_ratio(empty) == 0.0
    assert should_compact(pairs, CompactionConfig(fragmentation_threshold=0.3))
    assert not should_compact(uniform)


def test_auto_num_clusters():
    assert auto_num_clusters(2) == 2
    assert auto_num_clusters(200) == 10
    assert auto_num_clusters(3) == 2      # clamped below


def test_plan_and_layout(spark, access_log):
    vecs = spark.createDataFrame(
        [("v1", [1.0, 0.0]), ("v2", [0.9, 0.1]), ("v3", [0.0, 1.0]),
         ("v4", [0.1, 1.1]), ("v5", [0.95, 0.05])],
        "id string, vector array<float>")
    plan = plan_compaction(vecs, co_access_pairs(access_log),
                           CompactionConfig(num_clusters=2))
    assert plan.num_clusters == 2 and plan.vectors_to_relocate == 5
    assert plan.recommended   # frag ~0.53 > 0.3
    assigned = {r["vector_id"]: r["cluster_id"]
                for r in plan.assignments.collect()}
    # the co-accessed near-identical vectors cluster together
    assert assigned["v1"] == assigned["v2"] == assigned["v5"]
    assert assigned["v3"] == assigned["v4"] != assigned["v1"]

    laid = compacted_layout(vecs, plan.assignments)
    rows = laid.select("id", "cluster_id").collect()
    assert {r["id"] for r in rows} == {"v1", "v2", "v3", "v4", "v5"}
    # partition ids: all rows of one cluster share a partition
    parts = (laid.withColumn("pid", F.spark_partition_id())
             .select("cluster_id", "pid").distinct().collect())
    by_cluster = {}
    for r in parts:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["pid"])
    assert all(len(pids) == 1 for pids in by_cluster.values())


def test_plan_empty_input(spark):
    vecs = spark.createDataFrame([], "id string, vector array<float>")
    pairs = spark.createDataFrame([], "id_a string, id_b string, n_co long")
    plan = plan_compaction(vecs, pairs)
    assert plan.num_clusters == 0 and not plan.recommended
    assert plan.assignments.count() == 0
