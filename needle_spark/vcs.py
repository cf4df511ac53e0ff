"""Commit-level version control over collections (reference:
/root/reference/src/services/governance/version_control.rs — staging
:252-300, commit :303-384, branch/checkout :387-441, log :459-478,
diff + DiffResult :481-532,105-135, merge :535-639, rollback :642-673).

Spark-first mapping: the reference keeps every commit's full vector
snapshot in a HashMap; here a commit is METADATA ONLY — a pointer to an
existing manifest version of the underlying Collection (plus message /
author / parent hash / CDC range).  Segments are immutable, so a commit
pins its snapshot for free, `snapshot(ref)` is `coll.df(version=v)`
(zero copies), and `diff(base, target)` is a distributed full-outer
join of two manifest versions — never a driver-side map walk.  A
branch commit rides branches.py's COW fork machinery, so commits on a
branch reference the parent's segment files without copying data.

DiffResult parity: change_type added/modified/deleted; `similarity` is
the cosine similarity between base and target vectors for modified
rows (version_control.rs:494, cosine_similarity :727-739 — 0.0 when
either norm is 0).  Unlike the reference, a metadata-only change also
counts as modified (similarity 1.0) because the engine diffs whole
rows; the reference's VCS carries metadata but only compares vectors.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.branches import BranchManager
from needle_spark.catalog import Collection, CollectionError, Database
from needle_spark.functions.distance import distance_expr

ROOT_HASH = "0" * 10


def _utcnow_ms() -> int:
    return int(time.time() * 1000)


# ------------------------------------------------------------ diff op --

def snapshot_diff(
    base: DataFrame,
    target: DataFrame,
    id_col: str = "id",
    vector_col: str = "vector",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed diff of two collection snapshots: one full-outer join
    on id -> (vector_id, change_type, similarity).

    change_type: 'added' (only in target), 'deleted' (only in base),
    'modified' (present in both, vector or compared metadata differs).
    similarity: cosine(base_vector, target_vector) for modified rows,
    NULL for added/deleted (version_control.rs:481-532).  Unchanged
    rows are dropped.  compare_cols defaults to every shared non-id
    column, so metadata edits surface as modified.

    100 TB shape: one hash join on the id key (both sides shuffle once
    on id), all comparisons are scan expressions; nothing collects.
    """
    shared = set(base.columns) & set(target.columns)
    has_vec_default = vector_col in shared
    if compare_cols is None:
        # the vector rides separately as __vec_b/__vec_t (the cosine +
        # differs branches need it); including it in the compared
        # struct would serialize the widest column TWICE through the
        # full-outer shuffle
        compare_cols = sorted(shared - {id_col}
                              - ({vector_col} if has_vec_default else set()))
    else:
        missing = [c for c in compare_cols if c not in shared]
        if missing:
            raise CollectionError(f"compare_cols not in both sides: {missing}")
    has_vec = vector_col in shared

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(id_col).cast("string").alias("vector_id"),
                F.lit(True).alias(f"__present_{tag}")]
        if compare_cols:
            cols.append(F.struct(*[F.col(c) for c in compare_cols])
                        .alias(f"__row_{tag}"))
        if has_vec:
            cols.append(F.col(vector_col).alias(f"__vec_{tag}"))
        return df.select(*cols)

    j = side(base, "b").join(side(target, "t"), "vector_id", "full_outer")
    in_b = F.col("__present_b").isNotNull()
    in_t = F.col("__present_t").isNotNull()
    differs = F.lit(False)
    if compare_cols:
        differs = differs | ~(F.col("__row_b").eqNullSafe(F.col("__row_t")))
    if has_vec:
        # a vector change is a modification even when the compared
        # metadata is identical (the documented contract)
        differs = differs | ~(F.col("__vec_b").eqNullSafe(F.col("__vec_t")))
    change = (
        F.when(~in_b, F.lit("added"))
        .when(~in_t, F.lit("deleted"))
        .when(differs, F.lit("modified"))
    )
    if has_vec:
        sim = F.when(
            F.col("__vec_b").isNotNull() & F.col("__vec_t").isNotNull(),
            F.lit(1.0) - distance_expr("cosine", F.col("__vec_b"),
                                       F.col("__vec_t")),
        )
    else:
        sim = F.lit(None).cast("double")
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            "vector_id",
            "change_type",
            F.when(F.col("change_type") == "modified", sim)
            .alias("similarity"),
        )
    )


# ---------------------------------------------------------- VCS store --

@dataclass
class DiffSummary:
    """version_control.rs DiffResult counters (:105-118); the detailed
    changes stay distributed as the DataFrame they came from."""

    base: str
    target: str
    inserts: int
    updates: int
    deletes: int


@dataclass
class _StagedOp:
    kind: str                      # insert | upsert | delete
    rows: DataFrame | None = None
    ids: list | None = None
    flt: dict | None = None
    meta: dict = field(default_factory=dict)


class CollectionVcs:
    """Git-like stage/commit/log/checkout/diff for one named collection.

    Commit metadata lives in `<name>.vcs.json` at the database root:
    {"commits": {hash: {...}}, "heads": {branch: hash},
     "current": branch, "detached": hash|null}.  Branches are
    branches.py COW forks; 'main' is the base collection.  The root
    commit 0000000000 pins manifest version 0 of main.
    """

    def __init__(self, db: Database, name: str):
        self.db = db
        self.name = name
        self.branches = BranchManager(db, name)
        self.state_path = os.path.join(db.root, f"{name}.vcs.json")
        self._staging: list[_StagedOp] = []
        if not os.path.exists(self.state_path):
            self._write_state({
                "commits": {
                    ROOT_HASH: {
                        "parent": None, "message": "Initial commit",
                        "author": "system", "timestamp_ms": _utcnow_ms(),
                        "branch": "main", "version": 0,
                        "cdc_lo": 0, "cdc_hi": 0,
                    }
                },
                "heads": {"main": ROOT_HASH},
                "current": "main",
                "detached": None,
            })

    # ----------------------------------------------------- state I/O --
    def _state(self) -> dict:
        with open(self.state_path) as f:
            return json.load(f)

    def _write_state(self, st: dict) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self.state_path)

    def _locked_update(self, fn):
        """Serialize vcs.json read-modify-writes under an exclusive
        flock (the catalog/branches writers all do this; an unlocked
        RMW loses the other writer's commit record and head update).
        `fn(st)` mutates the freshly-read state and returns a value."""
        import fcntl

        with open(self.state_path + ".lock", "w") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                st = self._state()
                out = fn(st)
                self._write_state(st)
                return out
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)

    # ------------------------------------------------------- staging --
    def stage_insert(self, rows: DataFrame) -> None:
        """version_control.rs:252 stage_insert — lazily held; nothing
        runs until commit()."""
        self._staging.append(_StagedOp("insert", rows=rows))

    def stage_update(self, rows: DataFrame) -> None:
        """Stage full-row updates (upsert semantics: the reference's
        stage_update carries old+new; the collection derives 'old' from
        its own current state)."""
        self._staging.append(_StagedOp("upsert", rows=rows))

    def stage_delete(self, ids: list | None = None,
                     flt: dict | None = None) -> None:
        if ids is None and flt is None:
            raise CollectionError("stage_delete needs ids or a filter")
        self._staging.append(_StagedOp("delete", ids=ids, flt=flt))

    def staged_count(self) -> int:
        return len(self._staging)

    # ----------------------------------------------------- resolve  --
    def current_branch(self) -> str:
        return self._state()["current"]

    def _resolve(self, ref: str, st: dict | None = None) -> dict:
        """Ref -> commit record (+hash).  Branch name first, then
        commit hash (version_control.rs:699-712)."""
        st = st or self._state()
        if ref in st["heads"]:
            h = st["heads"][ref]
        elif ref in st["commits"]:
            h = ref
        else:
            raise CollectionError(f"no such ref: {ref}")
        return {"hash": h, **st["commits"][h]}

    def get_commit(self, ref: str) -> dict:
        return self._resolve(ref)

    def _collection(self, branch: str) -> Collection:
        return self.branches.collection(branch)

    # -------------------------------------------------------- commit --
    def commit(self, message: str, author: str) -> str:
        """Apply staged ops to the current branch's collection as
        ordinary incremental mutations, then record a commit pinning
        the resulting manifest version.  Raises with nothing staged
        (version_control.rs:303-307)."""
        if not self._staging:
            raise CollectionError("nothing staged to commit")
        st = self._state()
        if st["detached"]:
            raise CollectionError(
                "cannot commit in detached HEAD state; checkout a branch")
        branch = st["current"]
        coll = self._collection(branch)
        cdc_lo = coll._manifest.get("cdc_seq", 0)
        ts = _utcnow_ms()
        pre_version = coll.version
        ours: list[int] = []
        try:
            for op in self._staging:
                if op.kind == "insert":
                    coll.insert(op.rows, now_ms=ts)
                elif op.kind == "upsert":
                    coll.upsert(op.rows, now_ms=ts)
                else:
                    coll.delete(flt=op.flt, ids=op.ids, now_ms=ts)
                ours.append(coll.version)
        except Exception:
            # atomic: a failed op rolls the collection back to its
            # pre-commit version; staging is kept so the user can fix
            # the bad op and retry WITHOUT re-applying the earlier
            # ones.  Restore ONLY when every version since pre is ours
            # — reverting over an interleaved foreign commit would
            # silently wipe it.
            coll._manifest = coll._read_manifest()
            if (ours and coll.version == ours[-1]
                    and ours == list(range(pre_version + 1,
                                           pre_version + 1 + len(ours)))):
                coll.restore(pre_version, now_ms=ts)
            raise
        self._staging = []

        parent = st["heads"][branch]
        rec = {
            "parent": parent, "message": message, "author": author,
            "timestamp_ms": ts, "branch": branch,
            "version": coll.version,
            "cdc_lo": cdc_lo, "cdc_hi": coll._manifest.get("cdc_seq", 0),
        }
        h = hashlib.sha1(
            json.dumps([parent, message, author, ts, coll.version],
                       sort_keys=True).encode()
        ).hexdigest()[:10]

        def upd(st):
            st["commits"][h] = rec
            st["heads"][branch] = h

        self._locked_update(upd)
        return h

    # ------------------------------------------------------ branches --
    def create_branch(self, name: str, at_ref: str | None = None) -> None:
        """Branch from a commit (default: current branch head).  The
        COW fork references the source branch's segment files at that
        commit's pinned version — no data copied."""
        st = self._state()
        # detached HEAD positions the branch point (that is what
        # checkout-at-a-commit is FOR); fall back to the branch head
        rec = self._resolve(
            at_ref or st.get("detached") or st["current"], st)
        self.branches.create_branch(
            name, from_branch=rec["branch"],
            at_version=rec["version"], fork_seq=rec["cdc_hi"],
        )
        self._locked_update(
            lambda st2: st2["heads"].__setitem__(name, rec["hash"]))

    def checkout(self, ref: str) -> None:
        """Switch to a branch, or detach at a commit hash.  Refuses
        with staged changes (version_control.rs:412-423)."""
        if self._staging:
            raise CollectionError("cannot checkout with uncommitted changes")
        def upd(st):
            if ref in st["heads"]:
                st["current"], st["detached"] = ref, None
            elif ref in st["commits"]:
                st["current"] = st["commits"][ref]["branch"]
                st["detached"] = ref
            else:
                raise CollectionError(f"no such ref: {ref}")

        self._locked_update(upd)

    def delete_branch(self, name: str) -> None:
        if name == "main":
            raise CollectionError("cannot delete 'main'")
        st = self._state()
        if name == st["current"]:
            raise CollectionError("cannot delete the current branch")
        self.branches.delete_branch(name)
        self._locked_update(lambda st2: st2["heads"].pop(name, None))

    def list_branches(self) -> list[str]:
        return sorted(self._state()["heads"])

    # ----------------------------------------------------------- log --
    def log(self, limit: int | None = None, ref: str | None = None) -> list[dict]:
        """Commit chain from a ref (default: HEAD), newest first
        (version_control.rs:459-478)."""
        st = self._state()
        if ref is None:
            h = st["detached"] or st["heads"][st["current"]]
        else:
            h = self._resolve(ref, st)["hash"]
        out = []
        while h is not None and (limit is None or len(out) < limit):
            rec = st["commits"].get(h)
            if rec is None:
                break
            out.append({"hash": h, **rec})
            h = rec["parent"]
        return out

    # ------------------------------------------------------ snapshot --
    def snapshot(self, ref: str | None = None) -> DataFrame:
        """The collection state a ref pins — `df()` AS OF the commit's
        manifest version (MVCC makes this free)."""
        st = self._state()
        if ref is None:
            rec = self._resolve(st["detached"] or st["heads"][st["current"]], st)
        else:
            rec = self._resolve(ref, st)
        return self._collection(rec["branch"]).df(version=rec["version"])

    def head_snapshot(self) -> DataFrame:
        return self.snapshot()

    # ---------------------------------------------------------- diff --
    def diff(self, base: str, target: str) -> DataFrame:
        """Distributed DiffResult detail rows between two refs:
        (vector_id, change_type, similarity)."""
        coll = self._collection("main")
        return snapshot_diff(
            self.snapshot(base), self.snapshot(target),
            id_col=coll.id_col, vector_col=coll.vector_col,
        )

    def diff_summary(self, base: str, target: str) -> DiffSummary:
        counts = {
            r["change_type"]: r["cnt"]
            for r in self.diff(base, target)
            .groupBy("change_type").agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        return DiffSummary(
            base=base, target=target,
            inserts=int(counts.get("added", 0)),
            updates=int(counts.get("modified", 0)),
            deletes=int(counts.get("deleted", 0)),
        )

    # ------------------------------------------------------ rollback --
    def rollback(self, ref: str, author: str) -> str:
        """New commit restoring a previous commit's snapshot on the
        current branch (version_control.rs:642-673) — manifest-only,
        no data rewritten."""
        st = self._state()
        if st["detached"]:
            raise CollectionError("cannot rollback in detached HEAD state")
        rec = self._resolve(ref, st)
        branch = st["current"]
        if rec["branch"] != branch:
            raise CollectionError(
                f"commit {rec['hash']} is on branch {rec['branch']!r}, "
                f"not {branch!r}")
        coll = self._collection(branch)
        cdc_lo = coll._manifest.get("cdc_seq", 0)
        ts = _utcnow_ms()
        coll.restore(rec["version"], now_ms=ts)
        parent = st["heads"][branch]
        h = hashlib.sha1(json.dumps(
            [parent, "rollback", author, ts, coll.version],
            sort_keys=True).encode()).hexdigest()[:10]

        def upd(st):
            # CDC range covers the restore marker itself: a branch
            # forked at this commit must baseline at the CURRENT
            # sequence, not the old commit's (events between them are
            # already-settled history and must not resurface as merge
            # conflicts)
            st["commits"][h] = {
                "parent": parent, "message": f"Rollback to {rec['hash']}",
                "author": author, "timestamp_ms": ts, "branch": branch,
                "version": coll.version,
                "cdc_lo": cdc_lo,
                "cdc_hi": coll._manifest.get("cdc_seq", 0),
            }
            st["heads"][branch] = h

        self._locked_update(upd)
        return h

    # --------------------------------------------------------- merge --
    def merge(self, source_branch: str, author: str,
              strategy: str | None = None) -> str:
        """Merge a branch into the current branch via branches.py's
        CDC-derived net-change merge, recorded as a merge commit."""
        st = self._state()
        if st["detached"]:
            raise CollectionError("cannot merge in detached HEAD state")
        target = st["current"]
        if source_branch == target:
            raise CollectionError("cannot merge a branch into itself")
        # branches.merge always lands in the source's ACTUAL parent —
        # the commit must be recorded on that same branch, so require
        # the current branch to BE the parent (not just any branch)
        info = self.branches._meta()["branches"].get(source_branch)
        if info is None:
            raise CollectionError(f"no such branch: {source_branch}")
        if info["parent"] != target:
            raise CollectionError(
                f"branch {source_branch!r} merges into its parent "
                f"{info['parent']!r}; checkout that branch first")
        kwargs = {"strategy": strategy} if strategy else {}
        self.branches.merge(source_branch, **kwargs)
        coll = self._collection(target)
        ts = _utcnow_ms()
        parent = st["heads"][target]
        h = hashlib.sha1(json.dumps(
            [parent, "merge", author, ts, coll.version],
            sort_keys=True).encode()).hexdigest()[:10]

        def upd(st):
            st["commits"][h] = {
                "parent": parent,
                "message": f"Merge branch '{source_branch}' into {target}",
                "author": author, "timestamp_ms": ts, "branch": target,
                "version": coll.version,
                "cdc_lo": 0, "cdc_hi": coll._manifest.get("cdc_seq", 0),
            }
            st["heads"][target] = h

        self._locked_update(upd)
        return h
