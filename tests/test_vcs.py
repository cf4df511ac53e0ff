"""Commit-level version control: stage/commit/log/checkout/diff/rollback
(version_control.rs:252-673 semantics on manifest-pinned snapshots)."""

import math

import pytest

from needle_spark.catalog import CollectionError, Database
from needle_spark.vcs import ROOT_HASH, CollectionVcs, snapshot_diff


def mk_rows(spark, items):
    return spark.createDataFrame(
        [(i, v, c) for i, v, c in items],
        "id string, vector array<float>, category string",
    )


@pytest.fixture()
def vcs(spark, tmp_path):
    db = Database(spark, str(tmp_path / "vcsdb"))
    db.create_collection(
        "docs", dims=2, schema="id string, vector array<float>, category string"
    )
    return CollectionVcs(db, "docs")


def test_stage_commit_log_roundtrip(spark, vcs):
    assert vcs.staged_count() == 0
    with pytest.raises(CollectionError, match="nothing staged"):
        vcs.commit("empty", "t@t")
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x"),
                                     ("b", [0.0, 1.0], "y")]))
    assert vcs.staged_count() == 1
    h1 = vcs.commit("first", "alice@example.com")
    assert vcs.staged_count() == 0
    vcs.stage_insert(mk_rows(spark, [("c", [1.0, 1.0], "x")]))
    h2 = vcs.commit("second", "bob@example.com")

    log = vcs.log()
    assert [c["hash"] for c in log] == [h2, h1, ROOT_HASH]
    assert log[0]["message"] == "second" and log[0]["author"] == "bob@example.com"
    assert log[1]["message"] == "first"
    assert vcs.log(limit=1)[0]["hash"] == h2
    rec = vcs.get_commit(h1)
    assert rec["version"] == 1 and rec["cdc_lo"] == 0 and rec["cdc_hi"] == 2


def test_checkout_detached_and_snapshot(spark, vcs):
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    h1 = vcs.commit("first", "t")
    vcs.stage_insert(mk_rows(spark, [("b", [0.0, 1.0], "y")]))
    vcs.commit("second", "t")

    assert {r["id"] for r in vcs.snapshot(h1).collect()} == {"a"}
    assert {r["id"] for r in vcs.head_snapshot().collect()} == {"a", "b"}

    vcs.checkout(h1)  # detached
    assert {r["id"] for r in vcs.head_snapshot().collect()} == {"a"}
    vcs.stage_insert(mk_rows(spark, [("z", [0.5, 0.5], "z")]))
    with pytest.raises(CollectionError, match="detached"):
        vcs.commit("nope", "t")
    vcs._staging = []
    vcs.checkout("main")
    assert {r["id"] for r in vcs.head_snapshot().collect()} == {"a", "b"}

    vcs.stage_insert(mk_rows(spark, [("q", [0.1, 0.9], "q")]))
    with pytest.raises(CollectionError, match="uncommitted"):
        vcs.checkout(h1)


def test_diff_between_refs(spark, vcs):
    vcs.stage_insert(mk_rows(spark, [
        ("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y"), ("c", [1.0, 1.0], "x"),
    ]))
    h1 = vcs.commit("base", "t")
    vcs.stage_update(mk_rows(spark, [("b", [1.0, 0.0], "y")]))   # vector change
    vcs.stage_delete(ids=["c"])
    vcs.stage_insert(mk_rows(spark, [("d", [0.5, 0.5], "z")]))
    h2 = vcs.commit("edits", "t")

    d = {r["vector_id"]: r for r in vcs.diff(h1, h2).collect()}
    assert d["d"]["change_type"] == "added" and d["d"]["similarity"] is None
    assert d["c"]["change_type"] == "deleted"
    assert d["b"]["change_type"] == "modified"
    # cosine([0,1],[1,0]) = 0
    assert abs(d["b"]["similarity"]) < 1e-6
    assert "a" not in d  # unchanged rows dropped

    s = vcs.diff_summary(h1, h2)
    assert (s.inserts, s.updates, s.deletes) == (1, 1, 1)
    # reversed diff flips added/deleted
    rd = {r["vector_id"]: r["change_type"] for r in vcs.diff(h2, h1).collect()}
    assert rd == {"d": "deleted", "c": "added", "b": "modified"}


def test_metadata_only_change_is_modified(spark, vcs):
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    h1 = vcs.commit("base", "t")
    vcs.stage_update(mk_rows(spark, [("a", [1.0, 0.0], "x2")]))
    h2 = vcs.commit("meta edit", "t")
    d = vcs.diff(h1, h2).collect()
    assert len(d) == 1 and d[0]["change_type"] == "modified"
    assert abs(d[0]["similarity"] - 1.0) < 1e-6  # vector unchanged


def test_branch_commit_merge(spark, vcs):
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    vcs.commit("first", "t")
    vcs.create_branch("feature")
    vcs.checkout("feature")
    assert vcs.current_branch() == "feature"
    vcs.stage_insert(mk_rows(spark, [("f", [0.0, 1.0], "f")]))
    hf = vcs.commit("feature work", "t")
    assert [c["message"] for c in vcs.log()] == [
        "feature work", "first", "Initial commit"]
    assert {r["id"] for r in vcs.snapshot("feature").collect()} == {"a", "f"}
    assert {r["id"] for r in vcs.snapshot("main").collect()} == {"a"}
    d = {r["vector_id"]: r["change_type"]
         for r in vcs.diff("main", "feature").collect()}
    assert d == {"f": "added"}

    vcs.checkout("main")
    hm = vcs.merge("feature", "t")
    assert {r["id"] for r in vcs.head_snapshot().collect()} == {"a", "f"}
    log = vcs.log()
    assert log[0]["hash"] == hm
    assert log[0]["message"] == "Merge branch 'feature' into main"
    assert hf in {c["hash"] for c in vcs.log(ref="feature")}


def test_branch_at_old_commit(spark, vcs):
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    h1 = vcs.commit("first", "t")
    vcs.stage_insert(mk_rows(spark, [("b", [0.0, 1.0], "y")]))
    vcs.commit("second", "t")
    vcs.create_branch("old", at_ref=h1)
    assert {r["id"] for r in vcs.snapshot("old").collect()} == {"a"}
    vcs.checkout("old")
    vcs.stage_insert(mk_rows(spark, [("o", [0.5, 0.5], "o")]))
    vcs.commit("diverge", "t")
    assert {r["id"] for r in vcs.snapshot("old").collect()} == {"a", "o"}
    assert {r["id"] for r in vcs.snapshot("main").collect()} == {"a", "b"}


def test_rollback(spark, vcs):
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    h1 = vcs.commit("first", "t")
    vcs.stage_insert(mk_rows(spark, [("b", [0.0, 1.0], "y")]))
    vcs.commit("second", "t")
    hr = vcs.rollback(h1, "t")
    assert {r["id"] for r in vcs.head_snapshot().collect()} == {"a"}
    log = vcs.log()
    assert log[0]["hash"] == hr and log[0]["message"] == f"Rollback to {h1}"
    # rollback is a NEW commit; history is preserved
    assert len(log) == 4


def test_snapshot_diff_no_vector_col(spark):
    base = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    tgt = spark.createDataFrame([("a", 1), ("b", 3), ("c", 9)], "id string, v int")
    d = {r["vector_id"]: (r["change_type"], r["similarity"])
         for r in snapshot_diff(base, tgt, id_col="id").collect()}
    assert d == {"b": ("modified", None), "c": ("added", None)}


def test_merge_requires_actual_parent(spark, vcs):
    """branches.merge lands in the source's real parent; recording the
    commit anywhere else would corrupt both histories."""
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    vcs.commit("first", "t")
    vcs.create_branch("f1")
    vcs.checkout("f1")
    vcs.stage_insert(mk_rows(spark, [("f", [0.0, 1.0], "f")]))
    f1_head = vcs.commit("f1 work", "t")
    vcs.create_branch("f2", at_ref=f1_head)
    vcs.checkout("f2")
    vcs.stage_insert(mk_rows(spark, [("g", [0.5, 0.5], "g")]))
    vcs.commit("f2 work", "t")

    vcs.checkout("main")
    with pytest.raises(CollectionError, match="merges into its parent 'f1'"):
        vcs.merge("f2", "t")
    # merging on the true parent works and lands there only
    vcs.checkout("f1")
    vcs.merge("f2", "t")
    assert {r["id"] for r in vcs.snapshot("f1").collect()} == {"a", "f", "g"}
    assert {r["id"] for r in vcs.snapshot("main").collect()} == {"a"}


def test_rollback_cdc_range_covers_restore(spark, vcs):
    """A branch forked at a rollback commit must baseline at the
    post-restore CDC sequence, or settled history resurfaces as merge
    conflicts."""
    vcs.stage_insert(mk_rows(spark, [("a", [1.0, 0.0], "x")]))
    h1 = vcs.commit("first", "t")
    vcs.stage_insert(mk_rows(spark, [("b", [0.0, 1.0], "y")]))
    vcs.commit("second", "t")
    hr = vcs.rollback(h1, "t")
    rec = vcs.get_commit(hr)
    coll = vcs.branches.collection("main")
    assert rec["cdc_hi"] == coll._manifest.get("cdc_seq", 0)
    assert rec["cdc_lo"] <= rec["cdc_hi"]
    # fork at the rollback commit, re-insert the rolled-back id in the
    # branch, merge back: no spurious conflict from pre-rollback events
    vcs.create_branch("redo", at_ref=hr)
    vcs.checkout("redo")
    vcs.stage_insert(mk_rows(spark, [("b", [0.9, 0.1], "y2")]))
    vcs.commit("redo b", "t")
    vcs.checkout("main")
    from needle_spark.branches import FAIL_ON_CONFLICT
    vcs.merge("redo", "t", strategy=FAIL_ON_CONFLICT)
    got = {r["id"]: r["category"] for r in vcs.head_snapshot().collect()}
    assert got == {"a": "x", "b": "y2"}
