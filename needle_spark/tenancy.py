"""Multi-tenant isolation: tenant lifecycle, resource quotas, hashed
encryption-key verification, role-based tenant permissions, audit log,
and GDPR export / right-to-erasure — wired to the real catalog.

Reference: /root/reference/src/enterprise/tenant_isolation.rs —
TenantConfig (:44-64: 1M vectors / 100 collections / 1 GiB / 1k QPS
defaults), TenantStatus (:67-73), Tenant (:77-91), AccessPolicy /
TenantRole / Permission (:94-120), AuditLogEntry (:125-133),
ResourceUsage (:136-148), GdprExport (:151-168), TenantManager
(:171-...): create/get/update/suspend/delete/list (:196-266),
set/verify_encryption_key via SHA-256 hash + constant-time compare
(:14-37, :268-296), check_quota/record_usage/get_usage (:298-348),
set_access_policy/check_permission (:350-378), bounded audit log
(:381-396), prepare_gdpr_export with checksum (:401-415),
gdpr_delete (:417-439), enforce_quota with active-status gate
(:444-470).

Catalog integration (beyond the reference, which only tracks
counters): a tenant's collections are REAL catalog collections under
`<db>/<tenant>/`, `sync_usage` derives vector/storage usage from the
actual manifests in one pass, GDPR export writes genuine per-collection
bundles, and `gdpr_delete(purge=True)` erases the tenant's data on
disk — the part a 100 TB deployment actually needs."""

from __future__ import annotations

import hashlib
import hmac
import os
import re
import shutil
import time
from dataclasses import dataclass, field

ACTIVE = "active"
SUSPENDED = "suspended"
PENDING_DELETION = "pending_deletion"
DELETED = "deleted"

# Permission — tenant_isolation.rs:110-120.
CREATE_COLLECTION = "create_collection"
DELETE_COLLECTION = "delete_collection"
INSERT_VECTOR = "insert_vector"
DELETE_VECTOR = "delete_vector"
SEARCH_VECTOR = "search_vector"
EXPORT_DATA = "export_data"
MANAGE_TENANT = "manage_tenant"

ALL_PERMISSIONS = frozenset({
    CREATE_COLLECTION, DELETE_COLLECTION, INSERT_VECTOR, DELETE_VECTOR,
    SEARCH_VECTOR, EXPORT_DATA, MANAGE_TENANT,
})

#: TenantRole presets — tenant_isolation.rs:102-107.
ROLE_PERMISSIONS = {
    "admin": ALL_PERMISSIONS,
    "read_write": frozenset({CREATE_COLLECTION, INSERT_VECTOR, DELETE_VECTOR,
                             SEARCH_VECTOR, EXPORT_DATA}),
    "read_only": frozenset({SEARCH_VECTOR, EXPORT_DATA}),
}


class TenantError(ValueError):
    pass


class QuotaExceeded(TenantError):
    pass


_FS_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

# marker file stamping a directory as a tenant namespace: tenant dirs
# share the database root with plain collections, so purge/create must
# be able to tell them apart (gdpr_delete must never rmtree a
# same-named NON-tenant collection)
TENANT_MARKER = ".needle_tenant"


def _validate_fs_name(value: str, what: str) -> None:
    """Tenant ids and collection names become directory components under
    the database root; reject anything that could traverse out of it
    ('..', separators, absolute paths) or hide as a dotfile."""
    if (not isinstance(value, str) or not _FS_NAME_RE.fullmatch(value)
            or ".." in value or len(value) > 255):
        raise TenantError(
            f"invalid {what} {value!r}: must match [A-Za-z0-9][A-Za-z0-9._-]*"
            " with no '..'")


@dataclass
class TenantConfig:
    """tenant_isolation.rs:44-64."""

    max_vectors: int = 1_000_000
    max_collections: int = 100
    max_storage_bytes: int = 1_073_741_824
    rate_limit_qps: int = 1_000
    encryption_enabled: bool = False
    audit_logging: bool = False


@dataclass
class Tenant:
    """tenant_isolation.rs:77-91."""

    id: str
    name: str
    config: TenantConfig
    status: str = ACTIVE
    created_at: float = 0.0
    updated_at: float = 0.0
    encryption_key_hash: str | None = None
    collections: set[str] = field(default_factory=set)
    current_vectors: int = 0
    current_storage_bytes: int = 0


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


class TenantManager:
    """tenant_isolation.rs:171-470, with catalog-backed collections."""

    def __init__(self, database=None, max_audit_log_size: int = 10_000):
        self.database = database
        self._tenants: dict[str, Tenant] = {}
        self._policies: dict[str, frozenset[str]] = {}
        self.audit_log: list[dict] = []
        self.max_audit_log_size = max_audit_log_size

    # -- lifecycle --

    def create_tenant(self, tenant_id: str, name: str,
                      config: TenantConfig | None = None,
                      *, now: float | None = None) -> Tenant:
        _validate_fs_name(tenant_id, "tenant_id")
        if tenant_id in self._tenants:
            raise TenantError(f"Tenant {tenant_id!r} already exists")
        if self.database is not None:
            path = os.path.join(os.path.realpath(self.database.root),
                                tenant_id)
            if os.path.exists(path) and not os.path.exists(
                    os.path.join(path, TENANT_MARKER)):
                raise TenantError(
                    f"tenant_id {tenant_id!r} collides with existing "
                    "non-tenant data in the database root")
        ts = time.time() if now is None else now
        t = Tenant(id=tenant_id, name=name, config=config or TenantConfig(),
                   created_at=ts, updated_at=ts)
        self._tenants[tenant_id] = t
        return t

    def _get(self, tenant_id: str) -> Tenant:
        t = self._tenants.get(tenant_id)
        if t is None:
            raise TenantError(f"Tenant {tenant_id!r} not found")
        return t

    def get_tenant(self, tenant_id: str) -> Tenant | None:
        return self._tenants.get(tenant_id)

    def update_tenant_config(self, tenant_id: str, config: TenantConfig,
                             *, now: float | None = None) -> None:
        t = self._get(tenant_id)
        t.config = config
        t.updated_at = time.time() if now is None else now

    def suspend_tenant(self, tenant_id: str, *, now: float | None = None):
        t = self._get(tenant_id)
        t.status = SUSPENDED
        t.updated_at = time.time() if now is None else now

    def delete_tenant(self, tenant_id: str, *, now: float | None = None):
        t = self._get(tenant_id)
        t.status = PENDING_DELETION
        t.updated_at = time.time() if now is None else now

    def list_tenants(self) -> list[Tenant]:
        return list(self._tenants.values())

    @property
    def tenant_count(self) -> int:
        return len(self._tenants)

    # -- encryption keys (hash-verified, never stored raw) --

    def set_encryption_key(self, tenant_id: str, key: bytes,
                           *, now: float | None = None) -> None:
        """tenant_isolation.rs:268-279."""
        t = self._get(tenant_id)
        t.encryption_key_hash = _sha256_hex(key)
        t.updated_at = time.time() if now is None else now

    def verify_encryption_key(self, tenant_id: str, key: bytes) -> bool:
        """tenant_isolation.rs:281-296 — constant-time compare."""
        t = self._get(tenant_id)
        if t.encryption_key_hash is None:
            return False
        return hmac.compare_digest(_sha256_hex(key), t.encryption_key_hash)

    # -- quotas & usage --

    def check_quota(self, tenant_id: str, vectors_to_add: int) -> bool:
        """tenant_isolation.rs:298-306 (non-raising form)."""
        t = self._get(tenant_id)
        return t.current_vectors + vectors_to_add <= t.config.max_vectors

    def enforce_quota(self, tenant_id: str, vectors_to_add: int) -> None:
        """tenant_isolation.rs:444-470: non-active tenants refuse, over
        limit raises QuotaExceeded."""
        t = self._get(tenant_id)
        if t.status != ACTIVE:
            raise TenantError(
                f"Tenant {tenant_id!r} is not active (status: {t.status})")
        if t.current_vectors + vectors_to_add > t.config.max_vectors:
            raise QuotaExceeded(
                f"Tenant {tenant_id!r}: adding {vectors_to_add} vectors "
                f"would exceed limit of {t.config.max_vectors} "
                f"(current: {t.current_vectors})")

    def record_usage(self, tenant_id: str, vectors_added: int = 0,
                     storage_added: int = 0, *, now: float | None = None):
        """tenant_isolation.rs:308-324."""
        t = self._get(tenant_id)
        t.current_vectors += vectors_added
        t.current_storage_bytes += storage_added
        t.updated_at = time.time() if now is None else now

    def get_usage(self, tenant_id: str) -> dict:
        """tenant_isolation.rs:326-348."""
        t = self._get(tenant_id)
        util = (t.current_vectors / t.config.max_vectors * 100.0
                if t.config.max_vectors else 0.0)
        return {
            "vectors_used": t.current_vectors,
            "vectors_limit": t.config.max_vectors,
            "storage_used_bytes": t.current_storage_bytes,
            "storage_limit_bytes": t.config.max_storage_bytes,
            "collections_used": len(t.collections),
            "collections_limit": t.config.max_collections,
            "utilization_pct": util,
        }

    # -- catalog integration --

    def _tenant_path(self, tenant_id: str) -> str:
        """Tenant namespace dir, guaranteed INSIDE the database root.

        tenant_id is validated at create time, but this re-checks with a
        realpath containment assertion (defense in depth: the module
        whose job is tenant isolation must never hand out an escaped
        path — gdpr_delete(purge=True) rmtree's it)."""
        _validate_fs_name(tenant_id, "tenant_id")
        root = os.path.realpath(self.database.root)
        path = os.path.realpath(os.path.join(root, tenant_id))
        if os.path.commonpath([root, path]) != root or path == root:
            raise TenantError(
                f"tenant_id {tenant_id!r} escapes the database root")
        return path

    def create_collection(self, tenant_id: str, name: str, dims: int,
                          **kwargs):
        """Create a REAL collection under the tenant's namespace dir;
        counts against max_collections."""
        if self.database is None:
            raise TenantError("no database attached")
        t = self._get(tenant_id)
        if t.status != ACTIVE:
            raise TenantError(f"Tenant {tenant_id!r} is not active")
        if len(t.collections) >= t.config.max_collections:
            raise QuotaExceeded(
                f"Tenant {tenant_id!r} at collection limit "
                f"({t.config.max_collections})")
        from needle_spark.catalog import Collection
        _validate_fs_name(name, "collection name")
        tdir = self._tenant_path(tenant_id)
        os.makedirs(tdir, exist_ok=True)
        marker = os.path.join(tdir, TENANT_MARKER)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write(tenant_id)
        path = os.path.join(tdir, name)
        coll = Collection.create(self.database.spark, path, dims=dims,
                                 **kwargs)
        t.collections.add(name)
        return coll

    def collection(self, tenant_id: str, name: str):
        if self.database is None:
            raise TenantError("no database attached")
        t = self._get(tenant_id)
        if name not in t.collections:
            raise TenantError(
                f"collection {name!r} does not belong to tenant {tenant_id!r}")
        from needle_spark.catalog import Collection
        return Collection(self.database.spark,
                          os.path.join(self._tenant_path(tenant_id), name))

    def sync_usage(self, tenant_id: str, *, now: float | None = None) -> dict:
        """Derive usage from the REAL manifests (the reference only
        counts what callers report)."""
        t = self._get(tenant_id)
        vectors = 0
        storage = 0
        for name in sorted(t.collections):
            coll = self.collection(tenant_id, name)
            vectors += coll.count()
            root = os.path.join(self._tenant_path(tenant_id), name)
            for dirpath, _, files in os.walk(root):
                storage += sum(
                    os.path.getsize(os.path.join(dirpath, f)) for f in files)
        t.current_vectors = vectors
        t.current_storage_bytes = storage
        t.updated_at = time.time() if now is None else now
        return self.get_usage(tenant_id)

    # -- access policies --

    def set_access_policy(self, tenant_id: str, role: str,
                          permissions: set[str] | None = None) -> None:
        """tenant_isolation.rs:350-364; named roles carry their preset
        unless custom permissions are given."""
        self._get(tenant_id)
        perms = (frozenset(permissions) if permissions is not None
                 else ROLE_PERMISSIONS.get(role))
        if perms is None:
            raise TenantError(
                f"unknown role {role!r} and no explicit permissions")
        bad = perms - ALL_PERMISSIONS
        if bad:
            raise TenantError(f"unknown permissions: {sorted(bad)}")
        self._policies[tenant_id] = perms

    def check_permission(self, tenant_id: str, permission: str) -> bool:
        """tenant_isolation.rs:366-378 — no policy means no access."""
        self._get(tenant_id)
        return permission in self._policies.get(tenant_id, frozenset())

    # -- audit --

    def log_audit(self, tenant_id: str, action: str, resource: str,
                  success: bool, details: str | None = None,
                  *, now: float | None = None) -> None:
        """tenant_isolation.rs:381-388 — bounded, oldest dropped."""
        if len(self.audit_log) >= self.max_audit_log_size:
            self.audit_log.pop(0)
        self.audit_log.append({
            "timestamp": time.time() if now is None else now,
            "tenant_id": tenant_id, "action": action, "resource": resource,
            "success": success, "details": details,
        })

    def get_audit_log(self, tenant_id: str) -> list[dict]:
        return [e for e in self.audit_log if e["tenant_id"] == tenant_id]

    # -- GDPR --

    def prepare_gdpr_export(self, tenant_id: str, out_dir: str | None = None,
                            *, now: float | None = None) -> dict:
        """tenant_isolation.rs:401-415; with out_dir it writes REAL
        per-collection bundles (data portability, not just a
        manifest)."""
        t = self._get(tenant_id)
        exported = sorted(t.collections)
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            for name in exported:
                self.collection(tenant_id, name).export_bundle(
                    os.path.join(out_dir, name))
        return {
            "tenant_id": tenant_id,
            "exported_at": time.time() if now is None else now,
            "collections": exported,
            "total_vectors": t.current_vectors,
            "format": "parquet" if out_dir else "json",
            "checksum": _sha256_hex(
                f"{tenant_id}:{t.current_vectors}".encode()),
        }

    def gdpr_delete(self, tenant_id: str, *, purge: bool = False,
                    now: float | None = None) -> None:
        """tenant_isolation.rs:417-439; purge=True actually erases the
        tenant's data directory (the real right-to-erasure)."""
        t = self._get(tenant_id)
        if purge and self.database is not None:
            path = self._tenant_path(tenant_id)
            if os.path.isdir(path):
                if not os.path.exists(os.path.join(path, TENANT_MARKER)):
                    raise TenantError(
                        f"refusing to purge {tenant_id!r}: directory "
                        "is not a tenant namespace (marker missing)")
                shutil.rmtree(path)
            t.collections.clear()
            t.current_vectors = 0
            t.current_storage_bytes = 0
        t.status = DELETED
        t.updated_at = time.time() if now is None else now
        self.log_audit(tenant_id, "gdpr_delete", "tenant", True,
                       "Tenant marked for GDPR deletion"
                       + (" and purged" if purge else ""), now=now)
