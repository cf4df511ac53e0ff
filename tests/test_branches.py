"""Collection branching & merge (reference: src/collection_branch.rs
COW branches :16-19, merge strategies + conflicts :43-45)."""

import os

import pytest
from pyspark.sql import functions as F

from needle_spark.branches import (
    FAIL_ON_CONFLICT,
    SOURCE_WINS,
    TARGET_WINS,
    BranchManager,
)
from needle_spark.catalog import CollectionError, Database


def _rows(spark, coll, items):
    return spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, a, b in items], coll.df().schema
    )


@pytest.fixture()
def mgr(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    coll = db.create_collection("docs", dims=2)
    coll.insert(_rows(spark, coll, [("d1", 1, 0), ("d2", 2, 0), ("d3", 3, 0)]))
    return BranchManager(db, "docs")


def _state(coll):
    return {r["id"]: [round(float(x), 3) for x in r["vector"]]
            for r in coll.df().collect()}


def test_branch_cow_isolation(spark, mgr):
    br = mgr.create_branch("exp")
    assert mgr.list_branches() == ["main", "exp"]
    # fork sees parent data without copying it
    assert _state(br) == _state(mgr.collection("main"))
    # branch mutations don't touch main
    br.upsert(_rows(spark, br, [("d1", 9, 9), ("d4", 4, 0)]))
    br.delete(ids=["d3"])
    assert _state(br) == {"d1": [9.0, 9.0], "d2": [2.0, 0.0], "d4": [4.0, 0.0]}
    assert _state(mgr.collection("main")) == {
        "d1": [1.0, 0.0], "d2": [2.0, 0.0], "d3": [3.0, 0.0]}


def test_merge_source_wins_applies_all(spark, mgr):
    br = mgr.create_branch("exp")
    br.upsert(_rows(spark, br, [("d1", 9, 9), ("d4", 4, 0)]))
    br.delete(ids=["d3"])
    # parent also changes d1 after the fork -> conflict
    main = mgr.collection("main")
    main.upsert(_rows(spark, main, [("d1", 7, 7)]))
    res = mgr.merge("exp", strategy=SOURCE_WINS)
    assert res.conflicts == 1 and res.skipped == 0
    assert res.deleted == 1
    assert _state(mgr.collection("main")) == {
        "d1": [9.0, 9.0], "d2": [2.0, 0.0], "d4": [4.0, 0.0]}


def test_merge_target_wins_keeps_conflicts(spark, mgr):
    br = mgr.create_branch("exp")
    br.upsert(_rows(spark, br, [("d1", 9, 9), ("d4", 4, 0)]))
    main = mgr.collection("main")
    main.upsert(_rows(spark, main, [("d1", 7, 7)]))
    res = mgr.merge("exp", strategy=TARGET_WINS)
    assert res.conflicts == 1 and res.skipped == 1
    got = _state(mgr.collection("main"))
    assert got["d1"] == [7.0, 7.0]          # target kept
    assert got["d4"] == [4.0, 0.0]          # non-conflicting applied


def test_merge_fail_on_conflict(spark, mgr):
    br = mgr.create_branch("exp")
    br.upsert(_rows(spark, br, [("d1", 9, 9)]))
    main = mgr.collection("main")
    main.upsert(_rows(spark, main, [("d1", 7, 7)]))
    with pytest.raises(CollectionError, match="conflict"):
        mgr.merge("exp", strategy=FAIL_ON_CONFLICT)
    # clean merge goes through after the conflict is gone
    mgr.delete_branch("exp")
    br2 = mgr.create_branch("exp2")
    br2.upsert(_rows(spark, br2, [("d9", 1, 1)]))
    res = mgr.merge("exp2", strategy=FAIL_ON_CONFLICT)
    assert res.conflicts == 0 and res.merged == 1


def test_parent_compact_preserves_branch_files(spark, mgr):
    br = mgr.create_branch("exp")
    main = mgr.collection("main")
    # parent keeps mutating + compacts: the branch must stay readable
    main.upsert(_rows(spark, main, [("d1", 5, 5)]))
    main.compact()
    assert _state(br)["d1"] == [1.0, 0.0]    # fork-point view intact
    # deleting the branch unpins; a later compact may GC fork files
    mgr.delete_branch("exp")
    import json
    pins = json.load(open(os.path.join(main.path, "branch_pins.json")))
    assert pins == {}


def test_branch_of_branch(spark, mgr):
    b1 = mgr.create_branch("b1")
    b1.upsert(_rows(spark, b1, [("x1", 1, 1)]))
    b2 = mgr.create_branch("b2", from_branch="b1")
    b2.upsert(_rows(spark, b2, [("x2", 2, 2)]))
    assert "x2" not in _state(b1)
    assert set(_state(b2)) == {"d1", "d2", "d3", "x1", "x2"}
    res = mgr.merge("b2")                    # merges into b1
    assert res.merged == 1
    assert "x2" in _state(mgr.collection("b1"))
    assert "x2" not in _state(mgr.collection("main"))


def test_knn_works_on_branch(spark, mgr):
    from needle_spark.operators.knn import knn

    br = mgr.create_branch("exp")
    br.upsert(_rows(spark, br, [("near", 1, 0.01)]))
    got = knn(br.df(), [1.0, 0.0], k=2, metric="cosine").collect()
    assert [r["id"] for r in got][0] in ("d1", "near")
    assert len(got) == 2


def test_delete_branch_with_children_refused(spark, mgr):
    b1 = mgr.create_branch("b1")
    b1.upsert(_rows(spark, b1, [("x1", 1, 1)]))
    mgr.create_branch("b2", from_branch="b1")
    # b2 references b1's local segments: deleting b1 would dangle b2
    with pytest.raises(CollectionError, match="dependent"):
        mgr.delete_branch("b1")
    # leaf-first deletion works
    mgr.delete_branch("b2")
    mgr.delete_branch("b1")
    assert mgr.list_branches() == ["main"]


def test_remerge_is_not_a_conflict(spark, mgr):
    br = mgr.create_branch("exp")
    br.upsert(_rows(spark, br, [("d1", 9, 9), ("d4", 4, 0)]))
    res1 = mgr.merge("exp", strategy=FAIL_ON_CONFLICT)
    assert res1.conflicts == 0 and res1.merged == 2
    # the first merge's own parent-side CDC events must not count as
    # post-fork parent changes on a second merge
    br.upsert(_rows(spark, br, [("d5", 5, 0)]))
    res2 = mgr.merge("exp", strategy=FAIL_ON_CONFLICT)
    assert res2.conflicts == 0
    assert _state(mgr.collection("main"))["d5"] == [5.0, 0.0]


def test_remerge_target_wins_applies_branch_updates(spark, mgr):
    br = mgr.create_branch("exp")
    br.upsert(_rows(spark, br, [("d1", 9, 9)]))
    assert mgr.merge("exp", strategy=TARGET_WINS).skipped == 0
    # branch updates the same id again; with the advanced baseline the
    # second merge must apply it, not skip it as a stale conflict
    br.upsert(_rows(spark, br, [("d1", 11, 11)]))
    res = mgr.merge("exp", strategy=TARGET_WINS)
    assert res.skipped == 0
    assert _state(mgr.collection("main"))["d1"] == [11.0, 11.0]
