"""Cross-collection ACID transactions: buffer operations spanning many
collections, apply atomically with rollback, journal for recovery.

Reference: /root/reference/src/services/compute/vector_transactions.rs
— TransactionConfig (:59-96: max ops 10k, 30 s timeout, 64 concurrent,
journal on), TxId (:101-107, rendered "vtx-N"), TxStatus (:113-124:
Active/Committed/Aborted/TimedOut), TxOperation Insert/Update/Delete
(:128-170), CommitReceipt (:208-222), JournalEntry/UndoRecord
(:225-264), TransactionManager (:268-495): begin (:287-294),
add_operation status/expiry/capacity checks (:296-323), commit with
apply-and-rollback-on-failure (:328-394), abort (:396-412),
status/active_count/journal_entries/gc (:414-434).

Spark shape (100 TB posture): buffered operations hold lazy DataFrames
— nothing executes until commit, and each op applies as the catalog's
own distributed mutation (segment write + tombstones), so a
transaction of a billion rows is just a handful of jobs.  Undo is
STRONGER than the reference's reverse-op replay: the catalog's
versioned manifests let commit snapshot each affected collection's
version up front and roll back by restoring those versions — an exact,
O(manifest) undo that cannot half-revert."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

ACTIVE = "active"
COMMITTED = "committed"
ABORTED = "aborted"
TIMED_OUT = "timed_out"


class TxError(ValueError):
    pass


@dataclass
class TransactionConfig:
    """vector_transactions.rs:59-96."""

    max_operations: int = 10_000
    timeout_seconds: float = 30.0
    max_concurrent: int = 64
    enable_journal: bool = True


@dataclass
class TxOperation:
    """vector_transactions.rs:128-170.  op one of insert|update|delete;
    insert/update carry a rows DataFrame, delete carries ids."""

    collection: str
    op: str
    rows: DataFrame | None = None
    ids: list | None = None

    def __post_init__(self):
        if self.op in ("insert", "update"):
            if self.rows is None:
                raise TxError(f"{self.op} needs a rows DataFrame")
        elif self.op == "delete":
            if not self.ids:
                raise TxError("delete needs ids")
        else:
            raise TxError("op must be insert|update|delete")


@dataclass
class CommitReceipt:
    """vector_transactions.rs:208-222."""

    tx_id: str
    operations_applied: int
    collections_affected: list[str]
    apply_duration_ms: int
    committed_at: int


@dataclass
class _Tx:
    id: int
    status: str = ACTIVE
    operations: list[TxOperation] = field(default_factory=list)
    started_at: float = 0.0


class TransactionManager:
    """vector_transactions.rs:268-495 over the versioned catalog."""

    def __init__(self, config: TransactionConfig | None = None):
        self.config = config or TransactionConfig()
        self._next = 1
        self._transactions: dict[int, _Tx] = {}
        self.journal: list[dict] = []

    @staticmethod
    def _name(tx_id: int) -> str:
        return f"vtx-{tx_id}"

    def _expire_stale(self, now: float | None = None) -> None:
        """Abandoned transactions (begun, never touched again) must not
        hold max_concurrent slots forever: expire them lazily wherever
        the active set is consulted."""
        t = time.monotonic() if now is None else now
        for tx in self._transactions.values():
            if (tx.status == ACTIVE
                    and t - tx.started_at > self.config.timeout_seconds):
                tx.status = TIMED_OUT

    def begin(self, *, now: float | None = None) -> int:
        self._expire_stale(now)
        if self.active_count() >= self.config.max_concurrent:
            raise TxError(
                f"too many concurrent transactions "
                f"({self.config.max_concurrent})")
        tx_id = self._next
        self._next += 1
        self._transactions[tx_id] = _Tx(
            id=tx_id, started_at=time.monotonic() if now is None else now)
        return tx_id

    def _get(self, tx_id: int) -> _Tx:
        tx = self._transactions.get(tx_id)
        if tx is None:
            raise TxError(f"Transaction {self._name(tx_id)} not found")
        return tx

    def _check_expiry(self, tx: _Tx, now: float | None) -> None:
        t = time.monotonic() if now is None else now
        if t - tx.started_at > self.config.timeout_seconds:
            tx.status = TIMED_OUT
            raise TxError(f"Transaction {self._name(tx.id)} timed out")

    def add_operation(self, tx_id: int, op: TxOperation,
                      *, now: float | None = None) -> None:
        """vector_transactions.rs:296-323."""
        tx = self._get(tx_id)
        if tx.status != ACTIVE:
            raise TxError(
                f"Transaction {self._name(tx_id)} is {tx.status}, "
                f"cannot add operations")
        self._check_expiry(tx, now)
        if len(tx.operations) >= self.config.max_operations:
            raise TxError(
                f"Transaction {self._name(tx_id)} exceeds max operations "
                f"({self.config.max_operations})")
        tx.operations.append(op)

    def commit(self, tx_id: int, db, *, now: float | None = None,
               now_ms: int | None = None) -> CommitReceipt:
        """vector_transactions.rs:328-394.  Snapshot every affected
        collection's version, apply ops in order, and on ANY failure
        restore the snapshots (exact multi-collection undo)."""
        tx = self._get(tx_id)
        if tx.status != ACTIVE:
            raise TxError(
                f"Transaction {self._name(tx_id)} is {tx.status}, "
                f"cannot commit")
        self._check_expiry(tx, now)

        t0 = time.monotonic()
        names = sorted({op.collection for op in tx.operations})
        colls = {n: db.collection(n) for n in names}
        pre_versions = {n: c.version for n, c in colls.items()}
        # versions OUR ops produced, per collection: rollback must only
        # version-restore when no other writer's commit interleaved —
        # restoring over an interleaved commit would silently wipe it
        our_versions: dict[str, list[int]] = {n: [] for n in names}

        applied: list[dict] = []
        try:
            for seq, op in enumerate(tx.operations):
                coll = colls[op.collection]
                if op.op == "insert":
                    n = coll.insert(op.rows, now_ms=now_ms)
                elif op.op == "update":
                    n = coll.upsert(op.rows, now_ms=now_ms)
                else:
                    n = coll.delete(ids=op.ids, now_ms=now_ms)
                our_versions[op.collection].append(coll.version)
                applied.append({
                    "tx_id": self._name(tx_id), "seq": seq,
                    "collection": op.collection, "op": op.op, "rows": n,
                    "undo_version": pre_versions[op.collection],
                })
        except Exception as e:
            # rollback: restore each touched collection — every restore
            # is attempted (one failure must not leave the rest
            # half-reverted), and a collection with interleaved foreign
            # commits is SKIPPED with an explicit error rather than
            # silently wiping the other writer's data
            undo_errors: list[str] = []
            for n in reversed(names):
                ours = our_versions[n]
                if not ours:
                    continue
                try:
                    colls[n]._manifest = colls[n]._read_manifest()
                    cur = colls[n].version
                    contiguous = ours == list(
                        range(ours[0], ours[0] + len(ours)))
                    if (cur == ours[-1] and contiguous
                            and ours[0] - 1 == pre_versions[n]):
                        colls[n].restore(pre_versions[n], now_ms=now_ms)
                    else:
                        undo_errors.append(
                            f"{n}: concurrent commits interleaved "
                            f"(ours={ours}, current={cur}); not "
                            f"restored — undo manually via history")
                except Exception as ue:  # noqa: BLE001
                    undo_errors.append(f"{n}: restore failed: {ue}")
            tx.status = ABORTED
            msg = f"Transaction {self._name(tx_id)} failed: {e}"
            if undo_errors:
                msg += f"; partial rollback: {undo_errors}"
            raise TxError(msg) from e

        tx.status = COMMITTED
        if self.config.enable_journal:
            self.journal.extend(applied)
        return CommitReceipt(
            tx_id=self._name(tx_id),
            operations_applied=len(applied),
            collections_affected=names,
            apply_duration_ms=int((time.monotonic() - t0) * 1000),
            committed_at=now_ms if now_ms is not None else int(
                time.time() * 1000),
        )

    def abort(self, tx_id: int) -> None:
        """vector_transactions.rs:396-412 — discard buffered ops."""
        tx = self._get(tx_id)
        if tx.status != ACTIVE:
            raise TxError(
                f"Transaction {self._name(tx_id)} is {tx.status}, "
                f"cannot abort")
        tx.status = ABORTED

    def status(self, tx_id: int) -> str | None:
        tx = self._transactions.get(tx_id)
        return tx.status if tx else None

    def active_count(self) -> int:
        return sum(1 for t in self._transactions.values()
                   if t.status == ACTIVE)

    def journal_entries(self, tx_id: int) -> list[dict]:
        name = self._name(tx_id)
        return [e for e in self.journal if e["tx_id"] == name]

    def gc(self) -> None:
        """vector_transactions.rs:432-434 — keep only active."""
        self._transactions = {
            k: v for k, v in self._transactions.items() if v.status == ACTIVE}
