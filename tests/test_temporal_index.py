"""Temporal vector index: as-of state, decayed search, diffs, time
partitions (reference temporal.rs)."""

import math

import pytest

from pyspark.sql import functions as F

from needle_spark.operators.temporal_index import (
    HISTORY_SCHEMA,
    apply_ttl,
    changes_in_range,
    decay_factor,
    diff_versions,
    expire_before,
    get_history,
    partition_counts,
    prune_history,
    search_at,
    search_in_range,
    search_with_decay,
    state_at,
    temporal_stats,
)


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        # id, version, timestamp, vector, metadata, change_type
        ("a", 1, 100, [1.0, 0.0], '{"t":"x"}', "insert"),
        ("a", 2, 200, [0.9, 0.1], '{"t":"y"}', "update"),
        ("b", 3, 150, [0.0, 1.0], None, "insert"),
        ("c", 4, 120, [0.7, 0.7], None, "insert"),
        ("c", 5, 300, None, None, "delete"),
        ("d", 6, 400, [0.5, 0.5], None, "insert"),
    ]
    return spark.createDataFrame(rows, HISTORY_SCHEMA)


def test_state_at_reconstruction(history):
    # current state: c deleted, a at v2
    cur = {r["id"]: r for r in state_at(history).collect()}
    assert set(cur) == {"a", "b", "d"}
    assert cur["a"]["version"] == 2
    assert cur["a"]["vector"] == pytest.approx([0.9, 0.1])
    # state at ts=250: delete (t=300) and d (t=400) not yet visible
    past = {r["id"]: r for r in state_at(history, as_of=250).collect()}
    assert set(past) == {"a", "b", "c"}
    assert past["c"]["vector"] == pytest.approx([0.7, 0.7])
    # state at ts=110: only a's v1
    early = {r["id"]: r for r in state_at(history, as_of=110).collect()}
    assert set(early) == {"a"} and early["a"]["version"] == 1


def test_search_at_point_in_time(history):
    hits = search_at(history, [1.0, 0.0], k=2, as_of=250).collect()
    assert [h["id"] for h in hits] == ["a", "c"]
    # after the delete, c is gone
    hits2 = search_at(history, [0.7, 0.7], k=4, as_of=500).collect()
    assert "c" not in {h["id"] for h in hits2}


def test_search_with_decay_reorders(history):
    st = state_at(history)
    # without decay, a ([0.9,0.1]) is nearest to [1,0]
    plain = search_with_decay(st, [1.0, 0.0], k=3, now=500).collect()
    assert plain[0]["id"] == "a" and plain[0]["decay_factor"] == 1.0
    # steep exponential decay: newest row (d, t=400) outranks stale a
    decayed = search_with_decay(
        st, [1.0, 0.0], k=3, now=500, decay="exponential",
        half_life_seconds=50).collect()
    assert decayed[0]["id"] == "d"
    row_a = next(r for r in decayed if r["id"] == "a")
    assert row_a["decayed_score"] == pytest.approx(
        row_a["original_score"] * math.exp(-math.log(2.0) / 50 * 300))


def test_search_in_range_filters_on_timestamp(history):
    st = state_at(history)
    hits = search_in_range(st, [1.0, 0.0], k=5, start_ts=100, end_ts=250,
                           now=500).collect()
    assert {h["id"] for h in hits} == {"a", "b"}   # d (t=400) excluded


def test_decay_factor_parity_with_reference_formulas(spark):
    df = spark.createDataFrame([(0,), (50,), (100,), (200,)], "age long")
    out = df.select(
        decay_factor("linear", F.col("age"), max_age_seconds=100).alias("lin"),
        decay_factor("gaussian", F.col("age"), scale_seconds=100).alias("gau"),
        decay_factor("step", F.col("age"), window_seconds=50).alias("stp"),
        decay_factor("none", F.col("age")).alias("non"),
    ).collect()
    ages = [0, 50, 100, 200]
    for r, age in zip(out, ages):
        assert r["lin"] == pytest.approx(max(0.0, 1 - age / 100))
        assert r["gau"] == pytest.approx(math.exp(-((age / 100) ** 2)))
        assert r["stp"] == (1.0 if age <= 50 else 0.0)
        assert r["non"] == 1.0


def test_history_and_diff(history):
    h = get_history(history, "a").collect()
    assert [r["version"] for r in h] == [1, 2]
    d = diff_versions(history, "a", 1, 2).collect()[0]
    exp_sim = (1.0 * 0.9) / (1.0 * math.sqrt(0.9**2 + 0.1**2))
    assert d["vector_similarity"] == pytest.approx(exp_sim, abs=1e-6)
    assert d["metadata_changed"] is True
    assert d["time_diff_seconds"] == 100
    ch = changes_in_range(history, 120, 200).collect()
    assert [(r["id"], r["version"]) for r in ch] == [
        ("c", 4), ("b", 3), ("a", 2)]


def test_prune_and_stats(history):
    pruned = prune_history(history, max_versions=1)
    assert pruned.count() == 4     # one row per id
    assert {r["version"] for r in pruned.filter(F.col("id") == "a")
            .collect()} == {2}
    st = temporal_stats(history).collect()[0]
    assert st["total_vectors"] == 4 and st["total_versions"] == 6
    assert (st["oldest_timestamp"], st["newest_timestamp"]) == (100, 400)
    assert st["avg_versions_per_vector"] == pytest.approx(1.5)


def test_time_partitions_and_ttl(spark):
    # hourly buckets over three hours
    rows = [(i, 3600 * (i % 3) + 10 * i) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, timestamp long")
    pc = partition_counts(df, "hour").collect()
    assert len(pc) >= 3 and sum(r["n_rows"] for r in pc) == 30
    kept = expire_before(df, 3600)
    assert kept.count() == df.filter(F.col("timestamp") >= 3600).count()
    assert apply_ttl(df, ttl_seconds=3600, now=7200).count() == kept.count()
    with pytest.raises(ValueError):
        partition_counts(df, "decade")
