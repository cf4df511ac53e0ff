"""Git-like collection branching & merge (reference:
/root/reference/src/collection_branch.rs — branch tree :55-140, COW
read-through :16-19, merge strategies + conflict detection :43-45,
merge result accounting :200+).

Spark-first mapping: a branch is a full Collection whose version-0
manifest entry REFERENCES the parent's immutable segment/tombstone
files by absolute path (copy-on-write: zero data copied at fork).
Branch mutations append segments/tombstones into the branch's own
directory through the normal commit engine, so every collection
feature — merge-on-read, CDC, TTL, time travel, kNN — works on a
branch unchanged.

Conflict detection uses the CDC logs both sides already write: a
conflict is an id mutated in the branch AND mutated in the parent
after the fork point (parent sequence > fork_seq).  Merge applies the
branch's net state for its changed ids (upserts + deletes) with
SourceWins / TargetWins / FailOnConflict semantics.

GC safety: forked object files are pinned via `branch_pins.json` in
the parent directory; `Collection.compact()` treats pinned objects as
live.  Deleting a branch unpins them.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.catalog import Collection, CollectionError, Database

CDC_DIR = "_cdc"
PINS_FILE = "branch_pins.json"

SOURCE_WINS = "source_wins"
TARGET_WINS = "target_wins"
FAIL_ON_CONFLICT = "fail_on_conflict"


@dataclass
class MergeResult:
    """collection_branch.rs MergeResult: applied/skipped accounting."""

    merged: int          # upserted rows
    deleted: int         # delete mutations applied
    conflicts: int       # conflicting ids detected
    skipped: int         # conflicting ids left as target (TargetWins)


def _read_json(path: str, default):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return default


def _write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class BranchManager:
    """Branch tree for one named collection in a Database.  'main' is
    the base collection itself; branch data lives in sibling
    directories `<name>@<branch>`."""

    def __init__(self, db: Database, name: str):
        self.db = db
        self.name = name
        self.meta_path = os.path.join(db.root, f"{name}.branches.json")

    # ------------------------------------------------------- plumbing --
    def _meta(self) -> dict:
        return _read_json(self.meta_path, {"branches": {}})

    def _branch_path(self, branch: str) -> str:
        return os.path.join(self.db.root, f"{self.name}@{branch}")

    def collection(self, branch: str = "main") -> Collection:
        if branch == "main":
            return self.db.collection(self.name)
        if branch not in self._meta()["branches"]:
            raise CollectionError(f"no such branch: {branch}")
        return Collection(self.db.spark, self._branch_path(branch))

    def list_branches(self) -> list[str]:
        return ["main"] + sorted(self._meta()["branches"])

    def _pin(self, parent: Collection, objects: list[str], branch: str) -> None:
        pins_path = os.path.join(parent.path, PINS_FILE)
        pins = _read_json(pins_path, {})
        for o in objects:
            holders = set(pins.get(o, []))
            holders.add(branch)
            pins[o] = sorted(holders)
        _write_json(pins_path, pins)

    def _unpin(self, parent_path: str, branch: str) -> None:
        pins_path = os.path.join(parent_path, PINS_FILE)
        pins = _read_json(pins_path, {})
        pins = {o: [b for b in bs if b != branch] for o, bs in pins.items()}
        _write_json(pins_path, {o: bs for o, bs in pins.items() if bs})

    # ------------------------------------------------------- branching --
    def create_branch(self, branch: str, from_branch: str = "main",
                      at_version: int | None = None,
                      fork_seq: int | None = None) -> Collection:
        """Fork `from_branch` at its current version (COW — no data
        copied; the new manifest references the parent's files).

        `at_version` forks at an older retained manifest version
        (commit-level VCS checkouts); `fork_seq` overrides the conflict
        baseline when the caller knows the CDC sequence at that version
        (vcs.py records it per commit) — without it, forking at an old
        version keeps the CURRENT cdc_seq as baseline, so parent
        changes between the old version and now would not be flagged as
        conflicts on merge."""
        if branch == "main" or branch in self._meta()["branches"]:
            raise CollectionError(f"branch exists: {branch}")
        parent = self.collection(from_branch)
        m = parent._manifest
        fork_v = m["version"] if at_version is None else int(at_version)
        if str(fork_v) not in m["versions"]:
            raise CollectionError(
                f"version {fork_v} is not retained (compacted away?)")
        entry = m["versions"][str(fork_v)]
        abs_segs = [
            s if os.path.isabs(s) else os.path.join(parent.path, s)
            for s in entry["segments"]
        ]
        abs_tombs = [
            [t if os.path.isabs(t) else os.path.join(parent.path, t), pos]
            for t, pos in entry["tombstones"]
        ]
        coll = Collection.create(
            self.db.spark, self._branch_path(branch), dims=m["dims"],
            metric=m["metric"], id_col=m["id_col"], vector_col=m["vector_col"],
            schema=m["schema"],
            default_ttl_seconds=m.get("default_ttl_seconds"),
        )
        bm = coll._manifest
        bm["versions"] = {"0": {"segments": abs_segs, "tombstones": abs_tombs}}
        Collection._write_manifest_static(coll.path, bm)
        shutil.rmtree(os.path.join(coll.path, "seg-0"), ignore_errors=True)
        coll._manifest = bm

        local = [s for s in entry["segments"] if not os.path.isabs(s)]
        local += [t for t, _ in entry["tombstones"] if not os.path.isabs(t)]
        if local:
            self._pin(parent, local, branch)

        meta = self._meta()
        meta["branches"][branch] = {
            "parent": from_branch,
            "fork_version": fork_v,
            "fork_seq": m.get("cdc_seq", 0) if fork_seq is None else int(fork_seq),
            "created_ms": int(time.time() * 1000),
        }
        _write_json(self.meta_path, meta)
        return coll

    def delete_branch(self, branch: str) -> None:
        meta = self._meta()
        if branch not in meta["branches"]:
            raise CollectionError(f"no such branch: {branch}")
        # a grandchild fork references this branch's local segment files
        # (pinned under this branch's directory only); deleting out from
        # under it would dangle those reads after the next compact() GC
        children = sorted(
            b for b, i in meta["branches"].items() if i["parent"] == branch)
        if children:
            raise CollectionError(
                f"branch {branch!r} has dependent branches {children}; "
                "delete or merge them first")
        info = meta["branches"].pop(branch)
        parent = self.collection(info["parent"])
        self._unpin(parent.path, branch)
        shutil.rmtree(self._branch_path(branch), ignore_errors=True)
        _write_json(self.meta_path, meta)

    # --------------------------------------------------------- merging --
    def _changed_ids(self, coll: Collection, since_seq: int) -> DataFrame:
        """Distinct ids mutated at or after sequence `since_seq`
        (manifests store cdc_seq as the NEXT sequence to assign, so the
        fork snapshot value is exactly the first post-fork sequence)."""
        cdc_path = os.path.join(coll.path, CDC_DIR)
        if not os.path.exists(cdc_path):
            return self.db.spark.createDataFrame([], "vector_id string")
        ev = self.db.spark.read.parquet(cdc_path)
        return (
            ev.filter(F.col("sequence") >= F.lit(int(since_seq)))
            .select("vector_id").distinct()
        )

    def merge(self, branch: str, strategy: str = SOURCE_WINS) -> MergeResult:
        """Merge a branch's net changes into its parent.

        Conflicts: ids mutated on BOTH sides since the fork.
        - source_wins: branch's state lands for every branch-changed id
        - target_wins: conflicting ids keep the parent's state
        - fail_on_conflict: raise before touching anything

        The delete set (branch-changed ids no longer present in the
        branch) is collected to the driver — deletes are assumed
        human-scale; bulk deletions should merge as tombstone segments
        via the streaming path instead."""
        if strategy not in (SOURCE_WINS, TARGET_WINS, FAIL_ON_CONFLICT):
            raise ValueError(f"unknown merge strategy: {strategy!r}")
        info = self._meta()["branches"].get(branch)
        if info is None:
            raise CollectionError(f"no such branch: {branch}")
        src = self.collection(branch)
        dst = self.collection(info["parent"])
        ic = dst.id_col

        # conflict baseline: the fork point, advanced past our own writes
        # by previous merges (merged_seq) — without it a re-merge would
        # see the first merge's parent-side CDC events as conflicts
        baseline = max(int(info["fork_seq"]), int(info.get("merged_seq", 0)))
        src_changed = self._changed_ids(src, 0)
        dst_changed = self._changed_ids(dst, baseline)
        conflicts = src_changed.join(dst_changed, "vector_id")
        n_conflicts = conflicts.count()
        if strategy == FAIL_ON_CONFLICT and n_conflicts:
            sample = [r["vector_id"] for r in conflicts.limit(10).collect()]
            raise CollectionError(
                f"merge conflict on {n_conflicts} id(s), e.g. {sample}")

        apply_ids = src_changed
        skipped = 0
        if strategy == TARGET_WINS and n_conflicts:
            apply_ids = src_changed.join(conflicts, "vector_id", "left_anti")
            skipped = n_conflicts

        src_rows = src.df().join(
            apply_ids.withColumnRenamed("vector_id", "__mid"),
            F.col(ic).cast("string") == F.col("__mid"),
        ).drop("__mid")
        merged = dst.upsert(src_rows)

        # ids changed in the branch but absent from its current state
        # were deleted there -> delete in the target too
        gone = apply_ids.join(
            src.df().select(F.col(ic).cast("string").alias("vector_id")),
            "vector_id", "left_anti",
        )
        gone_ids = [r["vector_id"] for r in gone.collect()]
        deleted = 0
        if gone_ids:
            deleted = dst.delete(pred=F.col(ic).cast("string").isin(gone_ids))

        # record the parent's post-merge sequence as the next conflict
        # baseline so this merge's own CDC events are not re-flagged
        meta = self._meta()
        meta["branches"][branch]["merged_seq"] = int(
            dst._manifest.get("cdc_seq", 0))
        _write_json(self.meta_path, meta)
        return MergeResult(merged=int(merged), deleted=int(deleted),
                           conflicts=int(n_conflicts), skipped=int(skipped))
