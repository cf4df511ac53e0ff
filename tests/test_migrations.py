"""Schema migrations — persistence/migrations.rs parity: semver rules,
up/down walks, rollback, previews, validation, compatibility check,
and the real catalog bridge."""

import pytest

from needle_spark.catalog import Database
from needle_spark.migrations import (
    Migration,
    MigrationContext,
    MigrationError,
    MigrationManager,
    SchemaVersion,
    apply_operations,
    check_compatibility,
)


def v(s):
    return SchemaVersion.parse(s)


def mk_manager(allow_destructive=False):
    mgr = MigrationManager(allow_destructive=allow_destructive)

    def up1(ctx):
        ctx.create_collection("docs", 8)

    def down1(ctx):
        ctx.drop_collection("docs")

    def up2(ctx):
        ctx.rename_collection("docs", "documents")
        ctx.update_config("documents", "metric", "cosine")

    def down2(ctx):
        ctx.rename_collection("documents", "docs")

    mgr.register(Migration("m2", v("1.1.0"), "rename", up2, down2))
    mgr.register(Migration("m1", v("1.0.0"), "create docs", up1, down1))
    return mgr


def test_semver_parse_compare_compat():
    assert v("1.2.3") == SchemaVersion(1, 2, 3)
    assert v("1.2.3") < v("1.10.0") < v("2.0.0")
    assert v("1.9.9").is_compatible(v("1.0.0"))
    assert not v("2.0.0").is_compatible(v("1.9.9"))
    assert v("1.1.0").is_newer_than(v("1.0.9"))
    with pytest.raises(MigrationError):
        v("1.2")


def test_registration_sorted_and_pending():
    mgr = mk_manager()
    assert [m.id for m in mgr.migrations] == ["m1", "m2"]  # sorted
    assert [m.id for m in mgr.pending()] == ["m1", "m2"]
    assert mgr.has_pending


def test_migrate_up_applies_in_order():
    mgr = mk_manager()
    res = mgr.migrate_up(now=100.0)
    assert res.applied == ["m1", "m2"]
    assert res.to_version == v("1.1.0")
    assert mgr.current_version == v("1.1.0")
    assert not mgr.has_pending
    assert [r.id for r in mgr.applied()] == ["m1", "m2"]
    ops = [o["op"] for o in res.operations]
    assert ops == ["create_collection", "rename_collection",
                   "update_config"]


def test_migrate_to_partial_and_down():
    mgr = mk_manager()
    res = mgr.migrate_to(v("1.0.0"), now=1.0)
    assert res.applied == ["m1"] and mgr.current_version == v("1.0.0")
    mgr.migrate_to(v("1.1.0"), now=2.0)
    assert mgr.current_version == v("1.1.0")
    # walk back down: m2.down runs
    down = mgr.migrate_to(v("1.0.0"), now=3.0)
    assert down.applied == ["m2"]
    assert down.operations[0]["op"] == "rename_collection"
    assert mgr.current_version == v("1.0.0")


def test_rollback_and_irreversible():
    mgr = mk_manager()
    mgr.migrate_up(now=1.0)
    res = mgr.rollback(now=2.0)
    assert res.applied == ["m2"] and mgr.current_version == v("1.0.0")
    # one-way migration refuses rollback
    mgr2 = MigrationManager()
    mgr2.register(Migration.one_way(
        "ow", v("1.0.0"), "one way", lambda ctx: ctx.execute("X")))
    mgr2.migrate_up(now=1.0)
    with pytest.raises(MigrationError, match="not reversible"):
        mgr2.rollback()
    empty = MigrationManager()
    with pytest.raises(MigrationError, match="nothing"):
        empty.rollback()


def test_destructive_gate():
    mgr = MigrationManager()
    mgr.register(Migration.one_way(
        "drop", v("1.0.0"), "drops", lambda ctx: ctx.drop_collection("x")))
    with pytest.raises(MigrationError, match="destructive"):
        mgr.migrate_up()
    assert mgr.current_version == v("0.0.0")  # nothing applied
    ok = MigrationManager(allow_destructive=True)
    ok.register(Migration.one_way(
        "drop", v("1.0.0"), "drops", lambda ctx: ctx.drop_collection("x")))
    assert ok.migrate_up().applied == ["drop"]


def test_preview_and_validate():
    mgr = mk_manager()
    prev = mgr.preview()
    assert [p["id"] for p in prev] == ["m1", "m2"]
    assert prev[0]["operations"][0]["op"] == "create_collection"
    assert mgr.current_version == v("0.0.0")  # preview applied nothing
    mgr.register(Migration.one_way(
        "dup", v("1.1.0"), "duplicate version",
        lambda ctx: ctx.drop_index("documents", "ivf")))
    issues = mgr.validate()
    assert any("duplicate version" in i for i in issues)
    assert any("destructive" in i for i in issues)
    assert any("irreversible" in i for i in issues)


def test_compatibility_check():
    # migrations.rs:1000+ — db newer than app = incompatible
    assert check_compatibility(v("2.0.0"), v("1.0.0"))["compatible"] is False
    assert check_compatibility(v("1.0.0"), v("2.0.0"))["compatible"] is False
    ok = check_compatibility(v("1.0.0"), v("1.2.0"))
    assert ok["compatible"] and ok["needs_migration"]
    same = check_compatibility(v("1.2.0"), v("1.2.0"))
    assert same["compatible"] and not same["needs_migration"]


def test_catalog_bridge(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    mgr = mk_manager()
    res = mgr.migrate_up(now=1.0)
    leftover = apply_operations(db, res.operations)
    assert "documents" in db.list_collections()
    assert "docs" not in db.list_collections()
    assert db.collection("documents").dims == 8
    # unsupported ops are returned, not silently dropped
    assert leftover == [{"op": "update_config", "collection": "documents",
                         "key": "metric", "value": "cosine"}]


def test_repeated_rollback_walks_the_stack():
    # review finding: rollback must revert m2 THEN m1, and applied()
    # must drop rolled-back records.  allow_destructive because m1's
    # down-migration drops the collection it created (the gate applies
    # to both directions).
    mgr = mk_manager(allow_destructive=True)
    mgr.migrate_up(now=1.0)
    r1 = mgr.rollback(now=2.0)
    assert r1.applied == ["m2"]
    assert [r.id for r in mgr.applied()] == ["m1"]
    r2 = mgr.rollback(now=3.0)
    assert r2.applied == ["m1"]
    assert mgr.current_version == v("0.0.0")
    assert mgr.applied() == []
    # and migrate_up re-applies cleanly afterwards
    assert mgr.migrate_up(now=4.0).applied == ["m1", "m2"]


def test_rollback_unregistered_migration_raises_cleanly():
    from needle_spark.migrations import MigrationRecord
    mgr = MigrationManager(current=v("1.0.0"))
    mgr.load_history([MigrationRecord("ghost", v("1.0.0"), 1.0, "up")])
    with pytest.raises(MigrationError, match="not registered"):
        mgr.rollback()


def test_validate_covers_non_pending_migrations():
    # review finding: a destructive migration BELOW current_version must
    # still be flagged
    mgr = MigrationManager(current=v("1.1.0"))
    mgr.register(Migration.one_way(
        "old-drop", v("1.0.0"), "drops",
        lambda ctx: ctx.drop_collection("x")))
    issues = mgr.validate()
    assert any("destructive" in i for i in issues)


def test_migrate_down_past_all_floors_at_zero():
    mgr = MigrationManager()
    mgr.register(Migration("m", v("1.0.0"), "d",
                           lambda c: c.execute("u"),
                           lambda c: c.execute("d")))
    mgr.migrate_up(now=1.0)
    mgr.migrate_to(v("0.5.0"), now=2.0)
    assert mgr.current_version == v("0.0.0")  # not the fictitious 0.5.0
