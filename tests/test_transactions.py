"""Cross-collection transactions — vector_transactions.rs parity:
lifecycle, capacity/timeout gates, atomic multi-collection commit,
failure rollback via version restore, journal, gc."""

import pytest

from needle_spark.catalog import Database
from needle_spark.transactions import (
    ABORTED,
    ACTIVE,
    COMMITTED,
    TIMED_OUT,
    CommitReceipt,
    TransactionConfig,
    TransactionManager,
    TxError,
    TxOperation,
)


@pytest.fixture()
def db(spark, tmp_path):
    d = Database(spark, str(tmp_path / "db"))
    d.create_collection("docs", dims=2)
    d.create_collection("images", dims=2)
    return d


def rows(spark, *ids):
    return spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in ids], "id string, vector array<float>")


def test_lifecycle_and_ids(db, spark):
    mgr = TransactionManager()
    tx = mgr.begin(now=0.0)
    assert mgr.status(tx) == ACTIVE and mgr.active_count() == 1
    mgr.add_operation(tx, TxOperation("docs", "insert", rows=rows(spark, "a")),
                      now=1.0)
    receipt = mgr.commit(tx, db, now=2.0, now_ms=1000)
    assert isinstance(receipt, CommitReceipt)
    assert receipt.tx_id == f"vtx-{tx}"
    assert receipt.operations_applied == 1
    assert receipt.collections_affected == ["docs"]
    assert mgr.status(tx) == COMMITTED and mgr.active_count() == 0


def test_cross_collection_atomic_commit(db, spark):
    mgr = TransactionManager()
    tx = mgr.begin(now=0.0)
    mgr.add_operation(tx, TxOperation("docs", "insert",
                                      rows=rows(spark, "d1", "d2")), now=0.1)
    mgr.add_operation(tx, TxOperation("images", "insert",
                                      rows=rows(spark, "i1")), now=0.2)
    # buffered: nothing visible yet
    assert db.collection("docs").count() == 0
    receipt = mgr.commit(tx, db, now=1.0)
    assert receipt.collections_affected == ["docs", "images"]
    assert db.collection("docs").count() == 2
    assert db.collection("images").count() == 1


def test_failed_commit_rolls_back_all_collections(db, spark):
    coll = db.collection("docs")
    coll.insert(rows(spark, "pre"))
    v_docs = coll.version
    v_imgs = db.collection("images").version

    mgr = TransactionManager()
    tx = mgr.begin(now=0.0)
    mgr.add_operation(tx, TxOperation("images", "insert",
                                      rows=rows(spark, "i1")), now=0.1)
    # duplicate id -> the second op fails mid-commit
    mgr.add_operation(tx, TxOperation("docs", "insert",
                                      rows=rows(spark, "pre")), now=0.2)
    with pytest.raises(TxError, match="failed"):
        mgr.commit(tx, db, now=1.0)
    assert mgr.status(tx) == ABORTED
    # both collections back to pre-tx state (images had applied already)
    assert db.collection("images").count() == 0
    assert sorted(r["id"] for r in db.collection("docs").df()
                  .select("id").collect()) == ["pre"]
    assert db.collection("docs").df(version=v_docs).count() == 1
    assert v_imgs >= 0


def test_update_and_delete_ops(db, spark):
    db.collection("docs").insert(rows(spark, "a", "b"))
    mgr = TransactionManager()
    tx = mgr.begin(now=0.0)
    upd = spark.createDataFrame([("a", [0.0, 1.0])],
                                "id string, vector array<float>")
    mgr.add_operation(tx, TxOperation("docs", "update", rows=upd), now=0.1)
    mgr.add_operation(tx, TxOperation("docs", "delete", ids=["b"]), now=0.2)
    mgr.commit(tx, db, now=1.0)
    left = {r["id"]: r["vector"] for r in db.collection("docs").df().collect()}
    assert set(left) == {"a"} and left["a"] == [0.0, 1.0]


def test_capacity_timeout_and_state_gates(db, spark):
    mgr = TransactionManager(TransactionConfig(
        max_operations=1, timeout_seconds=5.0, max_concurrent=2))
    t1 = mgr.begin(now=0.0)
    mgr.add_operation(t1, TxOperation("docs", "delete", ids=["x"]), now=1.0)
    with pytest.raises(TxError, match="max operations"):
        mgr.add_operation(t1, TxOperation("docs", "delete", ids=["y"]),
                          now=1.0)
    # timeout flips status and refuses further use
    t2 = mgr.begin(now=0.0)
    with pytest.raises(TxError, match="timed out"):
        mgr.add_operation(t2, TxOperation("docs", "delete", ids=["x"]),
                          now=10.0)
    assert mgr.status(t2) == TIMED_OUT
    with pytest.raises(TxError, match="cannot commit"):
        mgr.commit(t2, db, now=11.0)
    # concurrency cap counts only ACTIVE transactions
    mgr.begin(now=0.0)
    with pytest.raises(TxError, match="concurrent"):
        mgr.begin(now=0.0)
    # unknown id
    with pytest.raises(TxError, match="not found"):
        mgr.status(99) or mgr.abort(99)


def test_abort_discards(db, spark):
    mgr = TransactionManager()
    tx = mgr.begin(now=0.0)
    mgr.add_operation(tx, TxOperation("docs", "insert",
                                      rows=rows(spark, "z")), now=0.1)
    mgr.abort(tx)
    assert mgr.status(tx) == ABORTED
    assert db.collection("docs").count() == 0
    with pytest.raises(TxError):
        mgr.abort(tx)  # double abort


def test_journal_and_gc(db, spark):
    mgr = TransactionManager()
    tx = mgr.begin(now=0.0)
    mgr.add_operation(tx, TxOperation("docs", "insert",
                                      rows=rows(spark, "a")), now=0.1)
    mgr.commit(tx, db, now=1.0)
    entries = mgr.journal_entries(tx)
    assert len(entries) == 1
    assert entries[0]["op"] == "insert" and entries[0]["rows"] == 1
    assert entries[0]["undo_version"] == 0
    live = mgr.begin(now=0.0)
    mgr.gc()
    assert mgr.status(tx) is None and mgr.status(live) == ACTIVE
    # journal disabled
    m2 = TransactionManager(TransactionConfig(enable_journal=False))
    t2 = m2.begin(now=0.0)
    m2.add_operation(t2, TxOperation("docs", "delete", ids=["a"]), now=0.1)
    m2.commit(t2, db, now=1.0)
    assert m2.journal == []


def test_op_validation():
    with pytest.raises(TxError):
        TxOperation("docs", "insert")  # no rows
    with pytest.raises(TxError):
        TxOperation("docs", "delete")  # no ids
    with pytest.raises(TxError):
        TxOperation("docs", "truncate")
