"""Multi-tenant isolation — tenant_isolation.rs parity + real catalog
integration (namespaced collections, derived usage, bundle export,
purge-on-erasure)."""

import os

import pytest

from needle_spark.catalog import Database
from needle_spark.tenancy import (
    ACTIVE,
    DELETED,
    EXPORT_DATA,
    MANAGE_TENANT,
    PENDING_DELETION,
    SEARCH_VECTOR,
    SUSPENDED,
    QuotaExceeded,
    Tenant,
    TenantConfig,
    TenantError,
    TenantManager,
)


@pytest.fixture()
def db(spark, tmp_path):
    return Database(spark, str(tmp_path / "db"))


def rows(spark, *ids):
    return spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in ids], "id string, vector array<float>")


def test_lifecycle(db):
    mgr = TenantManager(db)
    t = mgr.create_tenant("acme", "Acme Corp", now=100.0)
    assert t.status == ACTIVE and t.created_at == 100.0
    with pytest.raises(TenantError, match="already exists"):
        mgr.create_tenant("acme", "again")
    mgr.suspend_tenant("acme", now=200.0)
    assert mgr.get_tenant("acme").status == SUSPENDED
    mgr.delete_tenant("acme", now=300.0)
    assert mgr.get_tenant("acme").status == PENDING_DELETION
    assert mgr.tenant_count == 1 and len(mgr.list_tenants()) == 1
    assert mgr.get_tenant("nobody") is None
    with pytest.raises(TenantError, match="not found"):
        mgr.suspend_tenant("nobody")


def test_encryption_key_hash_verify(db):
    mgr = TenantManager(db)
    mgr.create_tenant("t", "T")
    assert mgr.verify_encryption_key("t", b"anything") is False
    mgr.set_encryption_key("t", b"secret-key")
    assert mgr.get_tenant("t").encryption_key_hash != "secret-key"  # hashed
    assert mgr.verify_encryption_key("t", b"secret-key") is True
    assert mgr.verify_encryption_key("t", b"wrong") is False


def test_quota_enforcement(db):
    mgr = TenantManager(db)
    mgr.create_tenant("t", "T", TenantConfig(max_vectors=10))
    assert mgr.check_quota("t", 10) is True
    assert mgr.check_quota("t", 11) is False
    mgr.record_usage("t", vectors_added=8)
    mgr.enforce_quota("t", 2)  # exactly at limit: ok
    with pytest.raises(QuotaExceeded, match="exceed limit of 10"):
        mgr.enforce_quota("t", 3)
    mgr.suspend_tenant("t")
    with pytest.raises(TenantError, match="not active"):
        mgr.enforce_quota("t", 1)


def test_namespaced_collections_and_synced_usage(db, spark):
    mgr = TenantManager(db)
    mgr.create_tenant("acme", "Acme", TenantConfig(max_collections=2))
    c1 = mgr.create_collection("acme", "docs", dims=2)
    c1.insert(rows(spark, "a", "b", "c"))
    mgr.create_collection("acme", "imgs", dims=2)
    with pytest.raises(QuotaExceeded, match="collection limit"):
        mgr.create_collection("acme", "more", dims=2)
    # the collection lives under the tenant's namespace dir
    assert os.path.isdir(os.path.join(db.root, "acme", "docs"))
    usage = mgr.sync_usage("acme")
    assert usage["vectors_used"] == 3
    assert usage["storage_used_bytes"] > 0
    assert usage["collections_used"] == 2
    assert usage["utilization_pct"] == pytest.approx(3 / 1_000_000 * 100)
    # foreign collection access rejected
    with pytest.raises(TenantError, match="does not belong"):
        mgr.collection("acme", "other")


def test_access_policies(db):
    mgr = TenantManager(db)
    mgr.create_tenant("t", "T")
    assert mgr.check_permission("t", SEARCH_VECTOR) is False  # no policy
    mgr.set_access_policy("t", "read_only")
    assert mgr.check_permission("t", SEARCH_VECTOR) is True
    assert mgr.check_permission("t", MANAGE_TENANT) is False
    mgr.set_access_policy("t", "admin")
    assert mgr.check_permission("t", MANAGE_TENANT) is True
    mgr.set_access_policy("t", "custom", permissions={EXPORT_DATA})
    assert mgr.check_permission("t", EXPORT_DATA) is True
    assert mgr.check_permission("t", SEARCH_VECTOR) is False
    with pytest.raises(TenantError, match="unknown role"):
        mgr.set_access_policy("t", "superuser")
    with pytest.raises(TenantError, match="unknown permissions"):
        mgr.set_access_policy("t", "custom", permissions={"fly"})


def test_audit_log_bounded(db):
    mgr = TenantManager(db, max_audit_log_size=3)
    mgr.create_tenant("a", "A")
    mgr.create_tenant("b", "B")
    for i in range(5):
        mgr.log_audit("a" if i % 2 == 0 else "b", f"op{i}", "r", True,
                      now=float(i))
    assert len(mgr.audit_log) == 3  # oldest dropped
    a_log = mgr.get_audit_log("a")
    assert [e["action"] for e in a_log] == ["op2", "op4"]


def test_gdpr_export_and_purge(db, spark, tmp_path):
    mgr = TenantManager(db)
    mgr.create_tenant("acme", "Acme")
    coll = mgr.create_collection("acme", "docs", dims=2)
    coll.insert(rows(spark, "x", "y"))
    mgr.sync_usage("acme")

    out = str(tmp_path / "export")
    export = mgr.prepare_gdpr_export("acme", out, now=500.0)
    assert export["collections"] == ["docs"]
    assert export["total_vectors"] == 2
    assert len(export["checksum"]) == 64
    # a real bundle landed on disk and round-trips
    from needle_spark.catalog import Collection
    restored = Collection.import_bundle(
        spark, os.path.join(out, "docs"), str(tmp_path / "restored"))
    assert restored.count() == 2

    mgr.gdpr_delete("acme", purge=True, now=600.0)
    t = mgr.get_tenant("acme")
    assert t.status == DELETED and t.current_vectors == 0
    assert not os.path.isdir(os.path.join(db.root, "acme"))
    assert mgr.get_audit_log("acme")[-1]["action"] == "gdpr_delete"


def test_path_traversal_rejected(db, tmp_path):
    """ADVICE r4 (medium): tenant_id / collection names are filesystem
    components — traversal must be rejected at create time AND at path
    resolution, so gdpr_delete(purge=True) can never rmtree outside
    the database root."""
    mgr = TenantManager(db)
    for bad in ("../victim", "..", "a/b", "/abs", "a\\b", ".hidden", ""):
        with pytest.raises(TenantError, match="invalid tenant_id"):
            mgr.create_tenant(bad, "Evil")
    mgr.create_tenant("acme", "Acme")
    for bad in ("../other", "x/../..", "/etc", ".dot"):
        with pytest.raises(TenantError, match="invalid collection name"):
            mgr.create_collection("acme", bad, dims=2)
    # defense in depth: even a tenant injected past create_tenant
    # cannot resolve an escaped path
    mgr._tenants["../victim"] = mgr._tenants["acme"]
    with pytest.raises(TenantError):
        mgr._tenant_path("../victim")
