"""Property-based tests for the governance modules.

* Lifecycle: the distributed when-cascade (`action_column`) must agree
  with the driver-side `evaluate` for ANY rule ladder and age — the
  cascade is an algebraic rewrite of last-match-wins.
* Migrations: for any registered set, migrate_up then rolling back
  everything returns to 0.0.0 with an empty net-applied history, and
  migrate_to is idempotent at the target.
* fsck: a collection remains valid under any sequence of catalog
  mutations (insert/delete/snapshot/compact).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from needle_spark.lifecycle import (
    ARCHIVE,
    COMPRESS,
    DELETE,
    NONE,
    LifecyclePolicy,
    LifecycleRule,
)
from needle_spark.migrations import (
    Migration,
    MigrationManager,
    SchemaVersion,
)

# ------------------------------------------------------------ lifecycle

rule_strategy = st.lists(
    st.tuples(
        st.sampled_from([DELETE, ARCHIVE, COMPRESS]),
        st.integers(min_value=0, max_value=40),  # age threshold (days)
        st.booleans(),                           # enabled
    ),
    min_size=0, max_size=5,
)

DAY_MS = 86400 * 1000
NOW_MS = 100 * DAY_MS


@pytest.fixture(scope="module")
def age_rows(spark):
    rows = [(i, NOW_MS - i * DAY_MS - 1) for i in range(0, 45, 3)]
    return spark.createDataFrame(
        rows, "id bigint, inserted_at long").cache()


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(spec=rule_strategy)
def test_cascade_equals_driver_evaluate(spark, age_rows, spec):
    pol = LifecyclePolicy("p")
    for i, (action, days, enabled) in enumerate(spec):
        pol.with_rule(LifecycleRule(f"r{i}", action, days * 86400,
                                    enabled=enabled))
    got = {
        r["id"]: r["act"]
        for r in age_rows.withColumn("act", pol.action_column(NOW_MS))
        .collect()
    }
    for r in age_rows.collect():
        age_s = (NOW_MS - r["inserted_at"]) / 1000.0
        assert got[r["id"]] == pol.evaluate(age_s), (
            spec, r["id"], age_s)


# ------------------------------------------------------------ migrations

migration_set = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),   # minor version
              st.integers(min_value=0, max_value=9)),  # patch
    min_size=1, max_size=5, unique=True,
)


@settings(max_examples=50, deadline=None)
@given(vers=migration_set)
def test_up_then_full_rollback_roundtrips(vers):
    mgr = MigrationManager()
    for i, (minor, patch) in enumerate(vers):
        mgr.register(Migration(
            f"m{i}", SchemaVersion(1, minor, patch), "d",
            lambda c: c.execute("u"), lambda c: c.execute("d")))
    res = mgr.migrate_up(now=1.0)
    assert len(res.applied) == len(vers)
    assert mgr.current_version == max(m.version for m in mgr.migrations)
    for _ in range(len(vers)):
        mgr.rollback(now=2.0)
    assert mgr.current_version == SchemaVersion(0, 0, 0)
    assert mgr.applied() == []
    # idempotence: migrating to the current target applies nothing
    mgr.migrate_up(now=3.0)
    again = mgr.migrate_to(mgr.current_version, now=4.0)
    assert again.applied == []


# ------------------------------------------------------------------ fsck

def test_fsck_valid_under_mutation_sequences(spark, tmp_path):
    import random

    from needle_spark.catalog import Collection
    from needle_spark.fsck import validate_collection

    rng = random.Random(7)
    coll = Collection.create(spark, str(tmp_path / "m"), dims=2)
    live = set()
    for step in range(12):
        op = rng.choice(["insert", "delete", "snapshot", "compact"])
        if op == "insert":
            vid = f"v{step}"
            coll.insert(spark.createDataFrame(
                [(vid, [1.0, 0.0])], "id string, vector array<float>"))
            live.add(vid)
        elif op == "delete" and live:
            vid = live.pop()
            coll.delete(ids=[vid])
        elif op == "snapshot":
            coll.create_snapshot(f"s{step}")
        elif op == "compact":
            coll.compact()
        rep = validate_collection(spark, coll.path)
        assert rep.valid, (step, op, rep.errors)
