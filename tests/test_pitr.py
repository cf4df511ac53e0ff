"""Point-in-time recovery (pitr_service.rs): checksummed backups,
recovery targets, retention pruning, stats, auto-snapshot cadence."""

import os

import pytest

from needle_spark.catalog import Database
from needle_spark.pitr import PitrConfig, PitrError, PitrService

SCHEMA = "id string, vector array<float>, category string"


@pytest.fixture()
def db(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    c = db.create_collection("docs", dims=2, schema=SCHEMA)
    c.insert(spark.createDataFrame(
        [("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y")], SCHEMA), now_ms=1000)
    return db


def test_snapshot_recover_roundtrip(spark, tmp_path, db):
    svc = PitrService(db, PitrConfig(backup_dir=str(tmp_path / "backups")))
    p1 = svc.create_snapshot("before-disaster", now_ms=10_000)
    assert p1.total_vectors == 2 and p1.collections == ["docs"]
    assert p1.checksum is not None and p1.size_bytes > 0

    # disaster: delete everything, insert junk
    c = db.collection("docs")
    c.delete(ids=["a", "b"], now_ms=11_000)
    c.insert(spark.createDataFrame([("junk", [9.0, 9.0], "z")], SCHEMA),
             now_ms=12_000)
    assert {r["id"] for r in c.df().collect()} == {"junk"}

    res = svc.recover_to("before-disaster", now_ms=13_000)
    assert res.verified and res.vectors_restored == 2
    assert {r["id"] for r in db.collection("docs").df().collect()} == {"a", "b"}
    # recovery committed ONE new version — the junk state is still
    # readable immediately below it (recovery is itself undoable)
    assert "junk" in {r["id"] for r in db.collection("docs").df(
        db.collection("docs").version - 1).collect()}


def test_recovery_targets_and_tamper_detection(spark, tmp_path, db):
    svc = PitrService(db, PitrConfig(backup_dir=str(tmp_path / "b2")))
    svc.create_snapshot("first", now_ms=10_000)
    db.collection("docs").insert(spark.createDataFrame(
        [("c", [1.0, 1.0], "z")], SCHEMA), now_ms=11_000)
    svc.create_snapshot("second", now_ms=20_000)

    # timestamp target resolves to newest point at-or-before
    res = svc.recover_to(15_000, now_ms=30_000)
    assert res.restore_point_id.endswith("first")
    assert db.collection("docs").count() == 2
    res = svc.recover_to("latest", now_ms=31_000)
    assert res.restore_point_id.endswith("second")
    assert db.collection("docs").count() == 3
    with pytest.raises(PitrError, match="at or before"):
        svc.recover_to(5)

    # tampering breaks the checksum and blocks recovery
    pdir = svc._point_dir(svc.list_restore_points()[0].id)
    victim = next(
        os.path.join(dp, f) for dp, _, fs in os.walk(pdir) for f in fs
        if f.endswith(".parquet"))
    with open(victim, "ab") as f:
        f.write(b"corruption")
    assert not svc.verify_snapshot(svc.list_restore_points()[0].id)
    with pytest.raises(PitrError, match="checksum"):
        svc.recover_to("first")


def test_retention_stats_and_auto_cadence(spark, tmp_path, db):
    svc = PitrService(db, PitrConfig(
        backup_dir=str(tmp_path / "b3"), retention_days=1, max_snapshots=2,
        auto_snapshot_interval_secs=60))
    day = 86_400_000
    svc.create_snapshot("old", now_ms=0)
    svc.create_snapshot("mid", now_ms=day)
    svc.create_snapshot("new", now_ms=2 * day)
    st = svc.stats(now_ms=2 * day)
    assert st["total_snapshots"] == 3 and st["expired_count"] == 1
    assert st["oldest_snapshot_ms"] == 0 and st["newest_snapshot_ms"] == 2 * day

    removed = svc.prune(now_ms=2 * day)  # 'old' beyond retention
    assert removed == 1
    labels = [p.label for p in svc.list_restore_points()]
    assert labels == ["mid", "new"]
    assert not os.path.exists(svc._point_dir("rp_0_old"))

    # auto-snapshot cadence
    assert svc.should_auto_snapshot(now_ms=2 * day + 61_000)
    assert not svc.should_auto_snapshot(now_ms=2 * day + 30_000)


def test_recover_atomic_flip_and_extra_collection_policy(spark, tmp_path, db):
    """ADVICE r2: recovery flips each collection's manifest ONCE — no
    intermediate emptied version a crash or concurrent reader could
    observe — and the policy for collections created after the restore
    point is explicit (keep by default, clear on request)."""
    svc = PitrService(db, PitrConfig(backup_dir=str(tmp_path / "b2")))
    svc.create_snapshot("s1", now_ms=10_000)
    late = db.create_collection("late", dims=2, schema=SCHEMA)
    late.insert(spark.createDataFrame([("z", [1.0, 1.0], "w")], SCHEMA),
                now_ms=11_000)
    v_before = db.collection("docs").version

    svc.recover_to("s1", now_ms=12_000)
    c = db.collection("docs")
    assert c.version == v_before + 1  # exactly one new version
    entry = c._manifest["versions"][str(c.version)]
    assert len(entry["segments"]) == 1 and entry["tombstones"] == []
    # every surviving version (crash point) is old state or restored
    # state — never an emptied intermediate (v0 is the pre-data
    # creation state, not a recovery artifact)
    for v in c.versions():
        if v > 0:
            assert c.df(v).count() == 2
    assert db.collection("late").count() == 1  # default: keep

    svc.recover_to("s1", now_ms=13_000, extra_collections="clear")
    assert db.collection("late").count() == 0  # full-state recovery
    with pytest.raises(PitrError, match="policy"):
        svc.recover_to("s1", extra_collections="bogus")


# ===================================================================
# Incremental backup chains (persistence/incremental_backup.rs)
# ===================================================================

def _ibs(spark, tmp_path, name="ibdb"):
    from needle_spark.catalog import Database
    from needle_spark.pitr import IncrementalBackupService

    db = Database(spark, str(tmp_path / name))
    coll = db.create_collection("docs", dims=2)
    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "id string, vector array<float>"), now_ms=1000)
    svc = IncrementalBackupService(db, str(tmp_path / f"{name}_backups"))
    return db, coll, svc


def test_incremental_copies_only_new_objects(spark, tmp_path):
    db, coll, svc = _ibs(spark, tmp_path)
    base = svc.create_base("b0", now_ms=1000)
    assert base.kind == "base" and base.size_bytes > 0

    coll.insert(spark.createDataFrame(
        [("c", [0.5, 0.5])], "id string, vector array<float>"),
        now_ms=2000)
    inc = svc.create_incremental("i1", now_ms=2000)
    assert inc.kind == "incremental" and inc.base_id == base.id
    # the increment carries the new segment + mutable manifests only —
    # strictly smaller than the base
    assert inc.size_bytes < base.size_bytes
    assert any("manifest.json" in f for f in inc.files)
    base_objs = {f for f in base.files if "/seg-" in f or "\\seg-" in f}
    assert not base_objs & set(inc.files)  # immutable objects copy once

    st = svc.chain_stats()
    assert st == {"points": 2, "bases": 1, "incrementals": 1,
                  "total_bytes": base.size_bytes + inc.size_bytes}


def test_chain_recovery_restores_latest_state(spark, tmp_path):
    db, coll, svc = _ibs(spark, tmp_path, "ibdb2")
    base = svc.create_base("b0", now_ms=1000)
    coll.insert(spark.createDataFrame(
        [("c", [0.5, 0.5])], "id string, vector array<float>"),
        now_ms=2000)
    coll.delete(ids=["a"], now_ms=2500)
    inc = svc.create_incremental("i1", now_ms=3000)

    # wreck the live state, then recover the full chain
    coll.clear(now_ms=4000)
    assert coll.count() == 0
    rep = svc.recover(inc.id, now_ms=5000)
    assert rep["chain_length"] == 2
    assert rep["collections"] == {"docs": 2}
    # handles cache their manifest (MVCC): re-fetch to see the restore
    ids = {r["id"] for r in db.collection("docs").df()
           .select("id").collect()}
    assert ids == {"b", "c"}  # post-increment state: a deleted, c added

    # recovering just the base restores the older state
    svc2_rep = svc.recover(base.id, now_ms=6000)
    assert svc2_rep["chain_length"] == 1
    ids0 = {r["id"] for r in db.collection("docs").df()
            .select("id").collect()}
    assert ids0 == {"a", "b"}


def test_chain_verify_and_errors(spark, tmp_path):
    db, coll, svc = _ibs(spark, tmp_path, "ibdb3")
    base = svc.create_base("b0", now_ms=1000)
    assert svc.verify(base.id) is True

    from needle_spark.pitr import PitrError

    with pytest.raises(PitrError):
        svc._chain_to("nope")
    # corrupt a byte -> checksum catches it
    import os

    pdir = os.path.join(svc.backup_dir, base.id)
    victim = None
    for dirpath, _, files in os.walk(pdir):
        for fn in files:
            if fn.endswith(".parquet"):
                victim = os.path.join(dirpath, fn)
                break
        if victim:
            break
    with open(victim, "ab") as f:
        f.write(b"x")
    assert svc.verify(base.id) is False
    with pytest.raises(PitrError, match="checksum"):
        svc.recover(base.id)


# ===================================================================
# Regression: restore's in-lock segment allocation must survive the
# NEXT commit's manifest refresh (outside-lock allocation let a later
# insert reuse — and overwrite — the restored segment)
# ===================================================================

def test_insert_after_recover_keeps_restored_rows(spark, tmp_path, db):
    svc = PitrService(db, PitrConfig(backup_dir=str(tmp_path / "b4")))
    svc.create_snapshot("p", now_ms=10_000)
    c = db.collection("docs")
    c.clear(now_ms=11_000)
    svc.recover_to("p", now_ms=12_000)
    c = db.collection("docs")
    c.insert(spark.createDataFrame([("c", [1.0, 1.0], "z")], SCHEMA),
             now_ms=13_000)
    ids = {r["id"] for r in db.collection("docs").df().select("id").collect()}
    assert ids == {"a", "b", "c"}


def test_insert_after_chain_recover_keeps_restored_rows(spark, tmp_path):
    db, coll, svc = _ibs(spark, tmp_path, "ibdb4")
    base = svc.create_base("b0", now_ms=1000)
    coll.clear(now_ms=2000)
    svc.recover(base.id, now_ms=3000)
    c = db.collection("docs")
    c.insert(spark.createDataFrame(
        [("c", [0.5, 0.5])], "id string, vector array<float>"),
        now_ms=4000)
    ids = {r["id"] for r in c.df().select("id").collect()}
    assert ids == {"a", "b", "c"}
