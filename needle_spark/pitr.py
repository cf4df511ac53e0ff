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
import tempfile
import time
from dataclasses import dataclass, field


def _safe_label(label: str) -> str:
    """Labels become filesystem path components inside point ids
    (rp_<ts>_<label>); reject traversal the same way catalog._safe_name
    does — '..' in a label would write bundles outside the backup dir
    and later prune() would rmtree the escaped path."""
    import re

    if label and (not re.fullmatch(r"[A-Za-z0-9._-]+", label)
                  or ".." in label or len(label) > 200):
        raise PitrError(
            f"invalid label {label!r}: must match [A-Za-z0-9._-]+ "
            "with no '..'")
    return label


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
        label = _safe_label(label)
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


    def _collection_or_recreate(self, name: str, bundle: str):
        """Open the live collection, or recreate a DROPPED one from the
        bundle's manifest (dims/metric/schema) so recovery of deleted
        collections works — the canonical PITR scenario."""
        import json as _json

        from needle_spark.catalog import Collection, CollectionError

        try:
            return self.db.collection(name)
        except CollectionError:
            with open(os.path.join(bundle, "manifest.json")) as f:
                m = _json.load(f)
            coll = Collection.create(
                self.db.spark, os.path.join(self.db.root, name),
                dims=m["dims"], metric=m.get("metric", "cosine"),
                id_col=m.get("id_col", "id"),
                vector_col=m.get("vector_col", "vector"),
                schema=m.get("schema"),
                default_ttl_seconds=m.get("default_ttl_seconds"))
            # persisted settings beyond create()'s args survive the
            # round-trip too (typed schema, compaction policy): losing
            # default_ttl/metadata_schema silently disables expiry and
            # validation on the recovered collection
            extra = {k: m[k] for k in ("metadata_schema", "auto_compact")
                     if m.get(k) is not None}
            if extra:
                coll._manifest.update(extra)
                coll._write_manifest_static(coll.path, coll._manifest)
            return coll

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
        # NB: collections dropped AFTER the snapshot are recreated from
        # the bundled manifest — the canonical reason to run PITR
        t0 = time.perf_counter()
        point = self._resolve_target(target)
        verified = self.verify_snapshot(point.id) if self.config.enable_checksums else False
        if self.config.enable_checksums and not verified:
            raise PitrError(f"checksum mismatch for {point.id}")
        restored = 0
        for name in point.collections:
            bundle = os.path.join(self._point_dir(point.id), name)
            data = self.db.spark.read.parquet(os.path.join(bundle, "data"))
            coll = self._collection_or_recreate(name, bundle)
            # segment name allocates INSIDE the commit lock: _commit's
            # manifest refresh would roll back an outside bump and the
            # next commit would reuse — and overwrite — this segment
            with coll._commit_lock():
                coll._manifest = coll._read_manifest()
                seg = coll._new_obj("seg")
                data.write.mode("overwrite").parquet(
                    os.path.join(coll.path, seg))
                coll._commit_locked(
                    [], [coll._literal_event("restore", point.id)], 1,
                    now_ms,
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


# ===================================================================
# Incremental backup chains (persistence/incremental_backup.rs)
# ===================================================================

@dataclass
class ChainPoint:
    """incremental_backup.rs BaseSnapshot (:207) / ArchivedSegment
    (:72): one link of an incremental chain."""

    id: str
    label: str
    kind: str               # base | incremental
    base_id: str | None
    timestamp_ms: int
    files: list[str]        # relpaths copied INTO this point
    checksum: str | None
    size_bytes: int


class IncrementalBackupService:
    """File-level incremental backups over the collections' immutable
    object layout (incremental_backup.rs IncrementalBackupManager
    :274-400 + RecoveryPlan :238).

    Collections append immutable objects (seg-*/del-*/_cdc files) and
    only the manifest mutates, so an incremental point copies EXACTLY
    the files whose relative path is new since the chain head, plus
    the current manifests — bytes scale with churn, not corpus size.
    Recovery assembles base + increments into a staging tree and
    commits through the same atomic manifest-flip as PitrService."""

    def __init__(self, db, backup_dir: str, enable_checksums: bool = True):
        self.db = db
        self.backup_dir = backup_dir
        self.enable_checksums = enable_checksums
        os.makedirs(backup_dir, exist_ok=True)
        self._index_path = os.path.join(backup_dir, "chain_index.json")

    # ------------------------------------------------------- index --
    def _load(self) -> list[dict]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return []

    def _save(self, idx: list[dict]) -> None:
        tmp = self._index_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(idx, f, indent=1)
        os.replace(tmp, self._index_path)

    def points(self) -> list[ChainPoint]:
        return [ChainPoint(**d) for d in self._load()]

    def _chain_to(self, point_id: str) -> list[ChainPoint]:
        """RecoveryPlan (:238): base..increment links in apply order."""
        by_id = {p.id: p for p in self.points()}
        if point_id not in by_id:
            raise PitrError(f"no such chain point: {point_id}")
        chain = []
        cur = by_id[point_id]
        while cur is not None:
            chain.append(cur)
            cur = by_id.get(cur.base_id) if cur.base_id else None
        chain.reverse()
        if chain[0].kind != "base":
            raise PitrError(f"chain for {point_id} has no base snapshot")
        return chain

    # ----------------------------------------------------- backups --
    def _collection_files(self, name: str) -> list[str]:
        coll = self.db.collection(name)
        out = []
        for dirpath, _, files in os.walk(coll.path):
            for fn in files:
                if fn.endswith(".crc") or fn == "_SUCCESS":
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), coll.path)
                out.append(os.path.join(name, rel))
        return sorted(out)

    def _copy(self, point_dir: str, relpaths: list[str]) -> int:
        total = 0
        roots: dict[str, str] = {}  # resolve each collection ONCE
        for rel in relpaths:
            name, inner = rel.split(os.sep, 1)
            if name not in roots:
                roots[name] = self.db.collection(name).path
            src = os.path.join(roots[name], inner)
            dst = os.path.join(point_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
            total += os.path.getsize(dst)
        return total

    def create_base(self, label: str, now_ms: int | None = None) -> ChainPoint:
        """Full copy of every collection's raw object tree (:297)."""
        label = _safe_label(label)
        now = now_ms if now_ms is not None else _utcnow_ms()
        pid = f"cb_{now}_{label}"
        pdir = os.path.join(self.backup_dir, pid)
        files = []
        for name in self.db.list_collections():
            files.extend(self._collection_files(name))
        size = self._copy(pdir, files)
        point = ChainPoint(
            id=pid, label=label, kind="base", base_id=None,
            timestamp_ms=now, files=files,
            checksum=_hash_dir(pdir) if self.enable_checksums else None,
            size_bytes=size)
        idx = self._load()
        idx.append(point.__dict__)
        self._save(idx)
        return point

    def create_incremental(self, label: str, base: str | None = None,
                           now_ms: int | None = None) -> ChainPoint:
        """Copy only files new since the chain head (:320
        create_incremental): manifests always recopy (they mutate);
        immutable objects copy once per chain."""
        points = self.points()
        if base is None:
            heads = [p for p in points]
            if not heads:
                raise PitrError("no base snapshot; create_base first")
            head = heads[-1]
        else:
            head = next((p for p in points if p.id == base or p.label == base),
                        None)
            if head is None:
                raise PitrError(f"no such chain point: {base!r}")
        chain_files = set()
        for link in self._chain_to(head.id):
            chain_files.update(link.files)
        label = _safe_label(label)
        now = now_ms if now_ms is not None else _utcnow_ms()
        pid = f"ci_{now}_{label}"
        pdir = os.path.join(self.backup_dir, pid)
        new_files = []
        for name in self.db.list_collections():
            for rel in self._collection_files(name):
                mutable = os.path.basename(rel) in (
                    "manifest.json", "aliases.json", "branches.json")
                if mutable or rel not in chain_files:
                    new_files.append(rel)
        size = self._copy(pdir, new_files)
        point = ChainPoint(
            id=pid, label=label, kind="incremental", base_id=head.id,
            timestamp_ms=now, files=new_files,
            checksum=_hash_dir(pdir) if self.enable_checksums else None,
            size_bytes=size)
        idx = self._load()
        idx.append(point.__dict__)
        self._save(idx)
        return point

    def verify(self, point_id: str) -> bool:
        """True when intact; a point with NO recorded checksum (chain
        created with enable_checksums=False) verifies trivially — it
        cannot be proven corrupt, and recover() must not reject healthy
        checksum-less chains (PitrService.verify_snapshot parity)."""
        p = next((x for x in self.points() if x.id == point_id), None)
        if p is None:
            return False
        if p.checksum is None:
            return True
        return _hash_dir(os.path.join(self.backup_dir, point_id)) == p.checksum

    # ---------------------------------------------------- recovery --
    def recover(self, point_id: str, now_ms: int | None = None) -> dict:
        """Assemble the chain newest-last into a staging tree (later
        links overwrite manifests), then commit each collection's
        restored state atomically (same manifest-flip as
        PitrService.recover_to)."""
        chain = self._chain_to(point_id)
        if self.enable_checksums:
            for link in chain:
                if not self.verify(link.id):
                    raise PitrError(f"checksum mismatch for {link.id}")
        staging = tempfile.mkdtemp(prefix="pitr_chain_")
        try:
            for link in chain:
                pdir = os.path.join(self.backup_dir, link.id)
                for rel in link.files:
                    src = os.path.join(pdir, rel)
                    dst = os.path.join(staging, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copy2(src, dst)
            restored = {}
            for name in sorted(os.listdir(staging)):
                src_path = os.path.join(staging, name)
                if not os.path.exists(os.path.join(src_path, "manifest.json")):
                    continue
                from needle_spark.catalog import Collection

                assembled = Collection(self.db.spark, src_path)
                data = assembled.df()
                from needle_spark.catalog import CollectionError
                try:
                    coll = self.db.collection(name)
                except CollectionError:
                    with open(os.path.join(src_path, "manifest.json")) as f:
                        am = json.load(f)
                    coll = Collection.create(
                        self.db.spark, os.path.join(self.db.root, name),
                        dims=am["dims"], metric=am.get("metric", "cosine"),
                        id_col=am.get("id_col", "id"),
                        vector_col=am.get("vector_col", "vector"),
                        schema=am.get("schema"))
                # in-lock allocation, same rule as restore() above
                with coll._commit_lock():
                    coll._manifest = coll._read_manifest()
                    seg = coll._new_obj("seg")
                    data.write.mode("overwrite").parquet(
                        os.path.join(coll.path, seg))
                    coll._commit_locked(
                        [], [coll._literal_event("restore", point_id)],
                        1, now_ms,
                        new_entry={"segments": [seg], "tombstones": []})
                restored[name] = coll.count()
            return {"point_id": point_id, "chain_length": len(chain),
                    "collections": restored}
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def chain_stats(self) -> dict:
        pts = self.points()
        return {
            "points": len(pts),
            "bases": sum(1 for p in pts if p.kind == "base"),
            "incrementals": sum(1 for p in pts if p.kind == "incremental"),
            "total_bytes": sum(p.size_bytes for p in pts),
        }


def _hash_dir(root: str) -> str:
    h = hashlib.sha256()
    for dirpath, _, files in sorted(os.walk(root)):
        for name in sorted(files):
            path = os.path.join(dirpath, name)
            h.update(os.path.relpath(path, root).encode())
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
    return h.hexdigest()
