"""Database schema versioning & migrations: semver-tracked up/down
migrations with applied history, rollback, previews, validation, and a
catalog bridge that executes the recorded operations for real.

Reference: /root/reference/src/persistence/migrations.rs —
SchemaVersion semver + same-major compatibility (:48-100),
MigrationRecord (:127-140), Migration with up/down closures and
one_way irreversibility (:145-220), MigrationContext recording typed
operations (create/drop/rename collection, create/drop index, update
config, add/remove metadata field, raw execute) with dry_run
(:234-350), MigrationManager (:410-860): register keeps migrations
version-sorted, pending = newer than current, migrate_up applies all
pending in order recording history, migrate_to walks up OR down,
rollback reverts the last applied (refusing irreversible ones),
preview, validate (duplicate versions, destructive ops without
allow_destructive), CompatibilityCheck (:1000+: db newer than app =
incompatible; app newer with same major = upgradeable).

Catalog bridge: the reference's MigrationContext only RECORDS
operations; `apply_operations(db, ops)` here executes the collection
ops against the real catalog (create/drop/rename), so a migration run
is an actual database change, not bookkeeping."""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Callable

DESTRUCTIVE_OPS = ("drop_collection", "remove_metadata_field", "drop_index")


class MigrationError(ValueError):
    pass


@dataclass(frozen=True, order=True)
class SchemaVersion:
    """migrations.rs:48-100."""

    major: int
    minor: int
    patch: int

    @classmethod
    def parse(cls, s: str) -> "SchemaVersion":
        m = re.fullmatch(r"(\d+)\.(\d+)\.(\d+)", s.strip())
        if not m:
            raise MigrationError(f"not a schema version: {s!r}")
        return cls(*(int(g) for g in m.groups()))

    def is_compatible(self, other: "SchemaVersion") -> bool:
        return self.major == other.major

    def is_newer_than(self, other: "SchemaVersion") -> bool:
        return self > other

    def __str__(self) -> str:
        return f"{self.major}.{self.minor}.{self.patch}"


@dataclass
class MigrationRecord:
    """migrations.rs:127-140."""

    id: str
    version: SchemaVersion
    applied_at: float
    direction: str = "up"


class MigrationContext:
    """migrations.rs:234-350 — records typed operations."""

    def __init__(self, current: SchemaVersion, target: SchemaVersion,
                 dry_run: bool = False):
        self.current_version = current
        self.target_version = target
        self.metadata: dict[str, str] = {}
        self.operations: list[dict] = []
        self.dry_run = dry_run

    def record(self, op: str, **kw) -> None:
        self.operations.append({"op": op, **kw})

    def create_collection(self, name: str, dimensions: int) -> None:
        self.record("create_collection", name=name, dimensions=dimensions)

    def drop_collection(self, name: str) -> None:
        self.record("drop_collection", name=name)

    def rename_collection(self, old_name: str, new_name: str) -> None:
        self.record("rename_collection", old_name=old_name,
                    new_name=new_name)

    def create_index(self, collection: str, index_type: str) -> None:
        self.record("create_index", collection=collection,
                    index_type=index_type)

    def drop_index(self, collection: str, index_type: str) -> None:
        self.record("drop_index", collection=collection,
                    index_type=index_type)

    def update_config(self, collection: str, key: str, value: str) -> None:
        self.record("update_config", collection=collection, key=key,
                    value=value)

    def add_metadata_field(self, collection: str, field_name: str,
                           default_value: str) -> None:
        self.record("add_metadata_field", collection=collection,
                    field_name=field_name, default_value=default_value)

    def remove_metadata_field(self, collection: str,
                              field_name: str) -> None:
        self.record("remove_metadata_field", collection=collection,
                    field_name=field_name)

    def execute(self, command: str) -> None:
        self.record("execute", command=command)

    def set_metadata(self, key: str, value: str) -> None:
        self.metadata[key] = value


@dataclass
class Migration:
    """migrations.rs:145-220."""

    id: str
    version: SchemaVersion
    description: str
    up_fn: Callable[[MigrationContext], None]
    down_fn: Callable[[MigrationContext], None] | None = None

    @property
    def reversible(self) -> bool:
        return self.down_fn is not None

    @classmethod
    def one_way(cls, id: str, version: SchemaVersion, description: str,
                up_fn) -> "Migration":
        return cls(id, version, description, up_fn, None)

    def up(self, ctx: MigrationContext) -> None:
        self.up_fn(ctx)

    def down(self, ctx: MigrationContext) -> None:
        if self.down_fn is None:
            raise MigrationError(f"Migration {self.id} is not reversible")
        self.down_fn(ctx)


@dataclass
class MigrationResult:
    """migrations.rs:920-940."""

    applied: list[str] = field(default_factory=list)
    operations: list[dict] = field(default_factory=list)
    from_version: SchemaVersion = SchemaVersion(0, 0, 0)
    to_version: SchemaVersion = SchemaVersion(0, 0, 0)

    @property
    def is_success(self) -> bool:
        return True


class MigrationManager:
    """migrations.rs:410-860."""

    def __init__(self, current: SchemaVersion | None = None,
                 allow_destructive: bool = False):
        self.migrations: list[Migration] = []
        self.history: list[MigrationRecord] = []
        self.current_version = current or SchemaVersion(0, 0, 0)
        self.allow_destructive = allow_destructive

    def register(self, migration: Migration) -> None:
        self.migrations.append(migration)
        self.migrations.sort(key=lambda m: m.version)

    def load_history(self, history: list[MigrationRecord]) -> None:
        self.history = list(history)

    def pending(self) -> list[Migration]:
        return [m for m in self.migrations
                if m.version > self.current_version]

    def applied(self) -> list[MigrationRecord]:
        """Net history: an 'up' record cancelled by a later 'down' for
        the same id is no longer applied."""
        net: list[MigrationRecord] = []
        for r in self.history:
            if r.direction == "up":
                net.append(r)
            else:
                for i in range(len(net) - 1, -1, -1):
                    if net[i].id == r.id:
                        del net[i]
                        break
        return net

    @property
    def has_pending(self) -> bool:
        return bool(self.pending())

    # -- execution --

    def _run(self, migration: Migration, direction: str,
             dry_run: bool, now: float | None) -> MigrationContext:
        target = (migration.version if direction == "up"
                  else self.current_version)
        ctx = MigrationContext(self.current_version, target, dry_run)
        (migration.up if direction == "up" else migration.down)(ctx)
        destructive = [o for o in ctx.operations
                       if o["op"] in DESTRUCTIVE_OPS]
        if destructive and not self.allow_destructive:
            raise MigrationError(
                f"Migration {migration.id} contains destructive operations "
                f"{sorted({o['op'] for o in destructive})}; pass "
                f"allow_destructive=True to run them")
        if not dry_run:
            self.history.append(MigrationRecord(
                migration.id, migration.version,
                time.time() if now is None else now, direction))
        return ctx

    def migrate_up(self, *, dry_run: bool = False,
                   now: float | None = None) -> MigrationResult:
        """Apply every pending migration in version order —
        migrations.rs:502-586."""
        result = MigrationResult(from_version=self.current_version,
                                 to_version=self.current_version)
        for m in self.pending():
            ctx = self._run(m, "up", dry_run, now)
            result.applied.append(m.id)
            result.operations.extend(ctx.operations)
            if not dry_run:
                self.current_version = m.version
            result.to_version = m.version
        return result

    def migrate_to(self, target: SchemaVersion, *, dry_run: bool = False,
                   now: float | None = None) -> MigrationResult:
        """Walk up or down to the target — migrations.rs:589-745."""
        result = MigrationResult(from_version=self.current_version,
                                 to_version=target)
        if target > self.current_version:
            for m in self.pending():
                if m.version > target:
                    break
                ctx = self._run(m, "up", dry_run, now)
                result.applied.append(m.id)
                result.operations.extend(ctx.operations)
                if not dry_run:
                    self.current_version = m.version
        elif target < self.current_version:
            downs = [m for m in reversed(self.migrations)
                     if target < m.version <= self.current_version]
            for m in downs:
                ctx = self._run(m, "down", dry_run, now)
                result.applied.append(m.id)
                result.operations.extend(ctx.operations)
                if not dry_run:
                    # floor: the largest registered version at or below
                    # the target, else the pristine 0.0.0 schema
                    below = [x.version for x in self.migrations
                             if x.version <= target]
                    self.current_version = (max(below) if below
                                            else SchemaVersion(0, 0, 0))
        return result

    def rollback(self, *, now: float | None = None) -> MigrationResult:
        """Revert the most recent applied migration —
        migrations.rs:748-834."""
        ups = self.applied()
        if not ups:
            raise MigrationError("nothing to roll back")
        last = ups[-1]
        migration = next(
            (m for m in self.migrations if m.id == last.id), None)
        if migration is None:
            raise MigrationError(
                f"applied migration {last.id!r} is not registered; "
                f"cannot roll back")
        prev = [m.version for m in self.migrations
                if m.version < migration.version]
        target = max(prev) if prev else SchemaVersion(0, 0, 0)
        ctx = self._run(migration, "down", False, now)
        self.current_version = target
        return MigrationResult(applied=[migration.id],
                               operations=ctx.operations,
                               from_version=migration.version,
                               to_version=target)

    # -- inspection --

    def preview(self) -> list[dict]:
        """migrations.rs:836-856 — dry-run every pending migration."""
        out = []
        for m in self.pending():
            ctx = MigrationContext(self.current_version, m.version,
                                   dry_run=True)
            m.up(ctx)
            out.append({"id": m.id, "version": str(m.version),
                        "description": m.description,
                        "reversible": m.reversible,
                        "operations": ctx.operations})
        return out

    def validate(self) -> list[str]:
        """migrations.rs:858-918 — duplicate versions, destructive ops
        without the flag, irreversible migrations flagged.  Walks EVERY
        registered migration (the reference audits the full registry,
        not just the pending tail)."""
        issues = []
        seen: dict[SchemaVersion, str] = {}
        for m in self.migrations:
            if m.version in seen:
                issues.append(
                    f"duplicate version {m.version}: {seen[m.version]} "
                    f"and {m.id}")
            seen[m.version] = m.id
        for m in self.migrations:
            ctx = MigrationContext(self.current_version, m.version,
                                   dry_run=True)
            m.up(ctx)
            bad = sorted({o["op"] for o in ctx.operations
                          if o["op"] in DESTRUCTIVE_OPS})
            if bad and not self.allow_destructive:
                issues.append(
                    f"{m.id} contains destructive operations {bad} "
                    f"but allow_destructive is off")
            if not m.reversible:
                issues.append(f"{m.id} is irreversible (one-way)")
        return issues


def check_compatibility(database_version: SchemaVersion,
                        application_version: SchemaVersion) -> dict:
    """CompatibilityCheck — migrations.rs:1000+."""
    if database_version > application_version:
        return {"compatible": False, "reason": "database is newer than "
                "the application; upgrade the application"}
    if not database_version.is_compatible(application_version):
        return {"compatible": False,
                "reason": "major version mismatch; migration required"}
    return {"compatible": True,
            "needs_migration": database_version < application_version}


def apply_operations(db, operations: list[dict]) -> list[dict]:
    """Execute recorded collection operations against the real catalog
    (the bridge the reference leaves to callers).  Unsupported op kinds
    are returned untouched for the caller's own machinery."""
    skipped = []
    for op in operations:
        kind = op["op"]
        if kind == "create_collection":
            db.create_collection(op["name"], dims=op["dimensions"])
        elif kind == "drop_collection":
            db.drop_collection(op["name"])
        elif kind == "rename_collection":
            db.rename_collection(op["old_name"], op["new_name"])
        else:
            skipped.append(op)
    return skipped
