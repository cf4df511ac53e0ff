"""Vector-clock sync engine — sync_engine.rs parity.

Mirrors the reference's in-file tests (vector clock basics/merge/
dominates/concurrent, record+delta roundtrip, skip-already-seen,
conflict policies, bi-directional convergence) plus the Spark paths:
batch recording, DataFrame delta exchange, collection apply.
"""

import pytest

from needle_spark.catalog import Collection
from needle_spark.sync import (
    LAST_WRITE_WINS,
    LOCAL_WINS,
    REJECT,
    SyncConfig,
    SyncEngine,
    SyncError,
    VectorClock,
)


def test_vector_clock_basics():
    c = VectorClock()
    assert c.get("a") == 0
    assert c.tick("a") == 1
    assert c.tick("a") == 2
    assert c.get("a") == 2


def test_vector_clock_merge_dominates_concurrent():
    a = VectorClock({"na": 2})
    b = VectorClock({"nb": 2})
    assert a.is_concurrent(b)
    assert not a.dominates(b) and not b.dominates(a)
    m = a.copy()
    m.merge(b)
    assert m.clocks == {"na": 2, "nb": 2}
    assert m.dominates(a) and m.dominates(b)
    assert not m.is_concurrent(a)
    assert not VectorClock({"x": 1}).is_concurrent(VectorClock({"x": 1}))


def test_record_and_delta_roundtrip(spark):
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")
    a.record_insert("v1", [1.0, 2.0], now_ms=1000)
    a.record_insert("v2", [3.0, 4.0], now_ms=1001)
    delta = a.generate_delta(b.vector_clock())
    assert delta.source_node == "node-a"
    assert delta.operations.count() == 2
    res = b.apply_delta(delta)
    assert res.applied == 2 and res.skipped == 0 and not res.conflicts
    assert b.vector_clock().get("node-a") == 2
    # second pull: nothing new
    delta2 = a.generate_delta(b.vector_clock())
    assert delta2.operations.count() == 0


def test_skip_already_seen(spark):
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")
    a.record_insert("v1", [1.0], now_ms=1)
    d1 = a.generate_delta(VectorClock())  # full delta
    b.apply_delta(d1)
    res = b.apply_delta(d1)  # replay: everything already seen
    assert res.applied == 0 and res.skipped == 1


def test_batch_recording_contiguous_ticks(spark):
    a = SyncEngine(spark, "node-a")
    rows = spark.createDataFrame(
        [(f"v{i}", [float(i)], None) for i in range(10)],
        "id string, vector array<float>, metadata string")
    assert a.record_batch(rows, "insert", now_ms=5) == 10
    assert a.vector_clock().get("node-a") == 10
    ts = sorted(r["timestamp"] for r in a.generate_delta(
        VectorClock()).operations.collect())
    assert ts == list(range(1, 11))


def test_conflict_policies(spark):
    def build(policy):
        a = SyncEngine(spark, "node-a", SyncConfig(conflict_policy=policy))
        b = SyncEngine(spark, "node-b", SyncConfig(conflict_policy=policy))
        # both touch v1 concurrently
        a.record_update("v1", [1.0], now_ms=1)
        b.record_update("v1", [2.0], now_ms=2)
        return a, b

    a, b = build(LAST_WRITE_WINS)
    res = b.apply_delta(a.generate_delta(b.vector_clock()))
    assert res.applied == 1
    assert res.conflicts == [{
        "vector_id": "v1", "local_ts": 1, "remote_ts": 1,
        "resolution": "remote_applied"}]

    a, b = build(LOCAL_WINS)
    res = b.apply_delta(a.generate_delta(b.vector_clock()))
    assert res.applied == 0 and res.skipped == 1
    assert res.conflicts[0]["resolution"] == "local_kept"

    a, b = build(REJECT)
    res = b.apply_delta(a.generate_delta(b.vector_clock()))
    assert res.applied == 0
    assert res.conflicts[0]["resolution"] == "rejected"


def test_bidirectional_convergence_to_collection(spark, tmp_path):
    coll_a = Collection.create(spark, str(tmp_path / "a"), dims=2)
    coll_b = Collection.create(spark, str(tmp_path / "b"), dims=2)
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")

    a.record_insert("x", [1.0, 0.0], now_ms=1)
    coll_a.insert(spark.createDataFrame([("x", [1.0, 0.0])],
                                        "id string, vector array<float>"))
    b.record_insert("y", [0.0, 1.0], now_ms=2)
    coll_b.insert(spark.createDataFrame([("y", [0.0, 1.0])],
                                        "id string, vector array<float>"))

    b.apply_delta(a.generate_delta(b.vector_clock()), collection=coll_b)
    a.apply_delta(b.generate_delta(a.vector_clock()), collection=coll_a)

    ids_a = sorted(r["id"] for r in coll_a.df().select("id").collect())
    ids_b = sorted(r["id"] for r in coll_b.df().select("id").collect())
    assert ids_a == ids_b == ["x", "y"]
    assert a.vector_clock().clocks == b.vector_clock().clocks


def test_delete_propagates(spark, tmp_path):
    coll_b = Collection.create(spark, str(tmp_path / "b"), dims=2)
    coll_b.insert(spark.createDataFrame([("x", [1.0, 0.0])],
                                        "id string, vector array<float>"))
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")
    b.apply_delta(a.generate_delta(b.vector_clock()), collection=coll_b)
    a.record_delete("x", now_ms=3)
    b.apply_delta(a.generate_delta(b.vector_clock()), collection=coll_b)
    assert coll_b.count() == 0


def test_applied_ops_propagate_onward(spark):
    # a -> b -> c: c receives a's op via b's log
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")
    c = SyncEngine(spark, "node-c")
    a.record_insert("v1", [1.0], now_ms=1)
    b.apply_delta(a.generate_delta(b.vector_clock()))
    # b's delta to c only carries b-authored ops per the reference's
    # generate_delta filter, so forwarding a's ops needs a's entry in
    # the delta... the reference keeps them in b.op_log; verify they
    # are retained for that purpose.
    assert b.log_len() == 1


def test_max_delta_size_caps_oldest_first(spark):
    a = SyncEngine(spark, "node-a", SyncConfig(max_delta_size=2))
    for i in range(5):
        a.record_insert(f"v{i}", [float(i)], now_ms=i)
    ops = a.generate_delta(VectorClock()).operations.collect()
    assert sorted(r["timestamp"] for r in ops) == [1, 2]


def test_bad_policy_and_op_rejected(spark):
    with pytest.raises(SyncError):
        SyncConfig(conflict_policy="merge")
    a = SyncEngine(spark, "node-a")
    with pytest.raises(SyncError):
        a.record_batch(
            spark.createDataFrame([("v", None, None)],
                                  "id string, vector array<float>, metadata string"),
            "truncate")


def test_causally_dominated_ops_are_not_conflicts(spark):
    # the code-review scenario: B pulls all of A's ops on x, then B
    # writes x; applying B's delta at A must NOT flag A's old
    # (causally dominated) ops as conflicts
    from needle_spark.sync import SyncConfig, LOCAL_WINS
    a = SyncEngine(spark, "node-a", SyncConfig(conflict_policy=LOCAL_WINS))
    b = SyncEngine(spark, "node-b", SyncConfig(conflict_policy=LOCAL_WINS))
    for i in range(3):
        a.record_update("x", [float(i)], now_ms=i)
    b.apply_delta(a.generate_delta(b.vector_clock()))  # B has seen all
    b.record_update("x", [99.0], now_ms=10)            # newer write at B
    res = a.apply_delta(b.generate_delta(a.vector_clock()))
    assert res.conflicts == []          # dominated, not concurrent
    assert res.applied == 1             # B's newer write lands at A
    # truly concurrent writes still conflict
    a.record_update("x", [1.0], now_ms=20)
    b.record_update("x", [2.0], now_ms=21)
    res2 = a.apply_delta(b.generate_delta(a.vector_clock()))
    assert len(res2.conflicts) == 1


def test_three_node_no_clock_overadvance(spark):
    """C pulling from B must NOT learn B's view of A as its own: deltas
    carry only sender-authored ops, so merging the full clock would
    make C filter A's direct delta and lose A's ops forever."""
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")
    c = SyncEngine(spark, "node-c")
    for i in range(3):
        a.record_insert(f"av{i}", [float(i)], now_ms=i)
    b.apply_delta(a.generate_delta(b.vector_clock()))
    assert b.vector_clock().get("node-a") == 3
    b.record_insert("bv0", [9.0], now_ms=10)

    # C pulls from B: only B's op arrives; C's clock must NOT claim A
    res = c.apply_delta(b.generate_delta(c.vector_clock()))
    assert res.applied == 1
    assert c.vector_clock().get("node-b") == 1
    assert c.vector_clock().get("node-a") == 0  # nothing of A's seen

    # the direct A -> C sync therefore still ships all of A's ops
    res = c.apply_delta(a.generate_delta(c.vector_clock()))
    assert res.applied == 3
    ids = {r["id"] for r in c._ops.select("id").collect()}
    assert ids == {"av0", "av1", "av2", "bv0"}


def test_capped_delta_advances_clock_only_to_shipped(spark):
    """A size-capped delta must advance the receiver's clock only to
    the newest op actually shipped, so the NEXT pull fetches the rest
    instead of losing it."""
    a = SyncEngine(spark, "node-a", SyncConfig(max_delta_size=2))
    b = SyncEngine(spark, "node-b")
    for i in range(5):
        a.record_insert(f"v{i}", [float(i)], now_ms=i)
    applied = 0
    for _ in range(3):  # 2 + 2 + 1
        applied += b.apply_delta(a.generate_delta(b.vector_clock())).applied
    assert applied == 5
    assert b.vector_clock().get("node-a") == 5
    ids = {r["id"] for r in b._ops.select("id").collect()}
    assert ids == {f"v{i}" for i in range(5)}
