"""Point-in-time recovery: database-level backup snapshots with
checksums, retention, and recovery targets.

Reference: /root/reference/src/services/collection/pitr_service.rs —
PitrServiceConfig (:48-121: backup dir, retention days, max snapshots,
checksums, auto-snapshot interval), RestorePoint (:123-131),
RecoveryTarget Named/Latest/Timestamp (:134-142), create_snapshot
(:207), recover_to (:261), list_restore_points (:316), stats (:321),
verify_snapshot (:333), should_auto_snapshot (:350).

Spark mapping: a restore point is one export_bundle per collection
(materialized Parquet + manifest) under the backup dir, with a sha256
over the data files; recovery imports the bundles back and commits
each collection's state as a NEW version (history preserved — recovery
is itself undoable).  `now_ms` is injectable for deterministic
retention tests."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field


def _utcnow_ms() -> int:
    return int(time.time() * 1000)


class PitrError(ValueError):
    pass


@dataclass
class PitrConfig:
    """pitr_service.rs:48-121."""

    backup_dir: str = ""
    retention_days: int = 30
    max_snapshots: int = 100
    enable_checksums: bool = True
    auto_snapshot_interval_secs: int = 0  # 0 = disabled


@dataclass
class RestorePoint:
    """pitr_service.rs:123-131."""

    id: str
    label: str
    timestamp_ms: int
    collections: list[str]
    total_vectors: int
    checksum: str | None
    size_bytes: int


@dataclass
class RecoveryResult:
    """pitr_service.rs:146-153."""

    restore_point_id: str
    collections_restored: list[str]
    vectors_restored: int
    duration_ms: int
    verified: bool


class PitrService:
    """pitr_service.rs:165-360 on the versioned-Parquet catalog."""

    def __init__(self, db, config: PitrConfig):
        if not config.backup_dir:
            raise PitrError("backup_dir required")
        self.db = db
        self.config = config
        os.makedirs(config.backup_dir, exist_ok=True)
        self._index_path = os.path.join(config.backup_dir, "restore_points.json")

    # ------------------------------------------------------- internal --
    def _load_index(self) -> list[dict]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return []

    def _save_index(self, idx: list[dict]) -> None:
        tmp = self._index_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(idx, f)
        os.replace(tmp, self._index_path)

    def _point_dir(self, point_id: str) -> str:
        return os.path.join(self.config.backup_dir, point_id)

    def _hash_tree(self, root: str) -> str:
        h = hashlib.sha256()
        for dirpath, _, files in sorted(os.walk(root)):
            for name in sorted(files):
                if name.endswith((".crc", "_SUCCESS")):
                    continue
                path = os.path.join(dirpath, name)
                h.update(os.path.relpath(path, root).encode())
                with open(path, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
        return h.hexdigest()

    def _tree_bytes(self, root: str) -> int:
        total = 0
        for dirpath, _, files in os.walk(root):
            for name in files:
                total += os.path.getsize(os.path.join(dirpath, name))
        return total

    # --------------------------------------------------------- public --
    def create_snapshot(self, label: str,
                        now_ms: int | None = None) -> RestorePoint:
        """:207 — bundle every collection into the backup dir."""
        now = now_ms if now_ms is not None else _utcnow_ms()
        point_id = f"rp_{now}_{label}"
        pdir = self._point_dir(point_id)
        if os.path.exists(pdir):
            raise PitrError(f"restore point exists: {point_id}")
        names = self.db.list_collections()
        total = 0
        for name in names:
            coll = self.db.collection(name)
            coll.export_bundle(os.path.join(pdir, name))
            total += coll.count()
        checksum = self._hash_tree(pdir) if self.config.enable_checksums else None
        point = RestorePoint(
            id=point_id, label=label, timestamp_ms=now, collections=names,
            total_vectors=total, checksum=checksum,
            size_bytes=self._tree_bytes(pdir),
        )
        idx = self._load_index()
        idx.append(point.__dict__)
        self._save_index(idx)
        return point

    def list_restore_points(self) -> list[RestorePoint]:
        return [RestorePoint(**d) for d in self._load_index()]

    def _resolve_target(self, target) -> RestorePoint:
        """RecoveryTarget (:134): a label, 'latest', or a timestamp —
        timestamps resolve to the newest point at or before them."""
        points = sorted(self.list_restore_points(), key=lambda p: p.timestamp_ms)
        if not points:
            raise PitrError("no restore points")
        if target == "latest":
            return points[-1]
        if isinstance(target, int):
            eligible = [p for p in points if p.timestamp_ms <= target]
            if not eligible:
                raise PitrError(f"no restore point at or before {target}")
            return eligible[-1]
        for p in points:
            if p.label == target or p.id == target:
                return p
        raise PitrError(f"no such restore point: {target!r}")

    def recover_to(self, target, now_ms: int | None = None,
                   extra_collections: str = "keep") -> RecoveryResult:
        """:261 — verify, then replace each collection's CURRENT state
        with the bundled data (committed as new versions; nothing is
        rewritten in place).

        Atomicity: the restored segment is written FIRST, then the
        manifest flips ONCE to {segments: [restored], tombstones: []} —
        a crash mid-recovery (or a concurrent reader) sees either the
        old state or the fully restored one, never an emptied
        collection.

        extra_collections: policy for collections created AFTER the
        restore point (absent from the bundle).  "keep" (default)
        leaves them untouched — recovery scopes to what was backed up;
        "clear" truncates them (as an undoable new version) for full
        database-state recovery matching the reference's semantics."""
        if extra_collections not in ("keep", "clear"):
            raise PitrError(f"unknown extra_collections policy: {extra_collections!r}")
        t0 = time.perf_counter()
        point = self._resolve_target(target)
        verified = self.verify_snapshot(point.id) if self.config.enable_checksums else False
        if self.config.enable_checksums and not verified:
            raise PitrError(f"checksum mismatch for {point.id}")
        restored = 0
        for name in point.collections:
            bundle = os.path.join(self._point_dir(point.id), name)
            data = self.db.spark.read.parquet(os.path.join(bundle, "data"))
            coll = self.db.collection(name)
            seg = coll._new_obj("seg")
            data.write.mode("overwrite").parquet(os.path.join(coll.path, seg))
            coll._commit(
                [], [coll._literal_event("restore", point.id)], 1, now_ms,
                new_entry={"segments": [seg], "tombstones": []},
            )
            restored += coll.count()
        cleared = []
        if extra_collections == "clear":
            for name in self.db.list_collections():
                if name not in point.collections:
                    self.db.collection(name).clear(now_ms=now_ms)
                    cleared.append(name)
        return RecoveryResult(
            restore_point_id=point.id,
            collections_restored=list(point.collections),
            vectors_restored=restored,
            duration_ms=int((time.perf_counter() - t0) * 1000),
            verified=verified,
        )

    def verify_snapshot(self, point_id: str) -> bool:
        """:333 — recompute the sha256 over the bundle tree."""
        for d in self._load_index():
            if d["id"] == point_id:
                if d["checksum"] is None:
                    return True
                return self._hash_tree(self._point_dir(point_id)) == d["checksum"]
        raise PitrError(f"no such restore point: {point_id}")

    def prune(self, now_ms: int | None = None) -> int:
        """Retention: drop points older than retention_days and beyond
        max_snapshots (oldest first).  Returns the number removed."""
        now = now_ms if now_ms is not None else _utcnow_ms()
        cutoff = now - self.config.retention_days * 86_400_000
        idx = sorted(self._load_index(), key=lambda d: d["timestamp_ms"])
        keep = [d for d in idx if d["timestamp_ms"] >= cutoff]
        if len(keep) > self.config.max_snapshots:
            keep = keep[-self.config.max_snapshots:]
        removed = [d for d in idx if d not in keep]
        for d in removed:
            shutil.rmtree(self._point_dir(d["id"]), ignore_errors=True)
        self._save_index(keep)
        return len(removed)

    def stats(self, now_ms: int | None = None) -> dict:
        """:321."""
        idx = self._load_index()
        now = now_ms if now_ms is not None else _utcnow_ms()
        cutoff = now - self.config.retention_days * 86_400_000
        ts = [d["timestamp_ms"] for d in idx]
        return {
            "total_snapshots": len(idx),
            "total_size_bytes": sum(d["size_bytes"] for d in idx),
            "oldest_snapshot_ms": min(ts) if ts else None,
            "newest_snapshot_ms": max(ts) if ts else None,
            "expired_count": sum(1 for d in idx if d["timestamp_ms"] < cutoff),
        }

    def should_auto_snapshot(self, now_ms: int | None = None) -> bool:
        """:350 — interval elapsed since the newest point."""
        if not self.config.auto_snapshot_interval_secs:
            return False
        newest = self.stats(now_ms)["newest_snapshot_ms"]
        if newest is None:
            return True
        now = now_ms if now_ms is not None else _utcnow_ms()
        return now - newest >= self.config.auto_snapshot_interval_secs * 1000
