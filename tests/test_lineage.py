"""Lineage & audit queries over the CDC log (observe/lineage.rs:157-312,
observe/audit.rs:265-530 semantics as distributed aggregations)."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.operators.lineage import audit_report, lineage_from_cdc


def mk_rows(spark, items):
    return spark.createDataFrame(
        [(i, v, c) for i, v, c in items],
        "id string, vector array<float>, category string",
    )


@pytest.fixture()
def coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "lineagedb"))
    c = db.create_collection(
        "docs", dims=2, schema="id string, vector array<float>, category string"
    )
    c.insert(mk_rows(spark, [
        ("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y"), ("c", [1.0, 1.0], "x"),
    ]), now_ms=1_000)
    c.upsert(mk_rows(spark, [("b", [0.5, 0.5], "y2")]), now_ms=90_000_000)
    c.update_metadata({"id": "a"}, {"category": "x2"}, now_ms=90_500_000)
    c.delete(ids=["c"], now_ms=172_900_000)
    return c


def test_lineage_summary(spark, coll):
    lin = {r["vector_id"]: r for r in coll.lineage().collect()}
    assert set(lin) == {"a", "b", "c"}

    a, b, c = lin["a"], lin["b"], lin["c"]
    assert (a["first_op"], a["last_op"]) == ("insert", "update")
    assert a["n_events"] == 2 and a["n_updates"] == 1 and a["is_live"]
    assert (b["first_op"], b["last_op"]) == ("insert", "upsert")
    assert b["n_upserts"] == 1 and b["is_live"]
    assert (c["first_op"], c["last_op"]) == ("insert", "delete")
    assert c["n_deletes"] == 1 and not c["is_live"]
    # chain ordering: first/last timestamps bracket the mutations
    assert c["first_ts"] == 1_000 and c["last_ts"] == 172_900_000
    assert a["first_seq"] < a["last_seq"]


def test_lineage_excludes_collection_markers(spark, coll):
    coll.restore(1, now_ms=200_000_000)  # writes a 'restore' marker
    lin = coll.lineage().collect()
    assert {r["vector_id"] for r in lin} == {"a", "b", "c"}
    # but the audit report sees the marker
    rep = audit_report(coll.cdc_events(), bucket="day")
    assert "restore" in {r["event_type"] for r in rep.collect()}


def test_audit_report_buckets(spark, coll):
    rep = {(r["bucket_start_ms"], r["event_type"]): (r["n_events"], r["n_vectors"])
           for r in coll.audit_report(bucket="day").collect()}
    day = 86_400_000
    assert rep[(0, "insert")] == (3, 3)
    assert rep[(day, "upsert")] == (1, 1)
    assert rep[(day, "update")] == (1, 1)
    assert rep[(day * 2, "delete")] == (1, 1)
    assert len(rep) == 4
    with pytest.raises(ValueError, match="unknown bucket"):
        coll.audit_report(bucket="fortnight")


def test_compliance_report_forget_proof(spark, coll):
    rc = coll.compliance_report("c")
    assert rc["deleted"] and rc["n_events"] == 2
    assert [e["event_type"] for e in rc["chain"]] == ["insert", "delete"]
    assert rc["created_ms"] == 1_000 and rc["last_modified_ms"] == 172_900_000
    ra = coll.compliance_report("a")
    assert not ra["deleted"]
    rz = coll.compliance_report("zz")
    assert rz["n_events"] == 0 and not rz["deleted"]


def test_lineage_from_cdc_standalone(spark):
    ev = spark.createDataFrame(
        [(0, 10, "insert", "x", None), (1, 20, "update", "x", None),
         (2, 30, "delete", "x", None), (3, 40, "insert", "y", None),
         (4, 50, "clear", "*", None)],
        "sequence long, timestamp_ms long, event_type string, "
        "vector_id string, metadata string",
    )
    lin = {r["vector_id"]: r for r in lineage_from_cdc(ev).collect()}
    assert set(lin) == {"x", "y"}
    assert not lin["x"]["is_live"] and lin["y"]["is_live"]
    assert lin["x"]["n_events"] == 3


# ---------------------------------------------------- lineage graph --

def _edges(spark):
    """a -> b -> d -> e, a -> c -> d (diamond: d reachable 2 ways)."""
    rows = [("b", ["a"]), ("c", ["a"]), ("d", ["b", "c"]), ("e", ["d"]),
            ("z", [])]
    df = spark.createDataFrame(rows, "vector_id string, parents array<string>")
    from needle_spark.operators.lineage import lineage_edges
    return lineage_edges(df)


def test_lineage_descendants_min_depth(spark):
    from needle_spark.operators.lineage import lineage_descendants

    got = {r["vector_id"]: r["depth"]
           for r in lineage_descendants(_edges(spark), "a").collect()}
    assert got == {"b": 1, "c": 1, "d": 2, "e": 3}
    # depth bound respected
    shallow = {r["vector_id"]
               for r in lineage_descendants(_edges(spark), "a", max_depth=1)
               .collect()}
    assert shallow == {"b", "c"}


def test_lineage_ancestors(spark):
    from needle_spark.operators.lineage import lineage_ancestors

    got = {r["vector_id"]: r["depth"]
           for r in lineage_ancestors(_edges(spark), "e").collect()}
    assert got == {"d": 1, "b": 2, "c": 2, "a": 3}
    assert lineage_ancestors(_edges(spark), "a").count() == 0


def test_impact_analysis(spark):
    from needle_spark.operators.lineage import impact_analysis

    rep = impact_analysis(_edges(spark), "a")
    assert rep == {"source_id": "a", "directly_affected": 2,
                   "total_affected": 4, "max_depth_reached": 3}
    assert impact_analysis(_edges(spark), "e")["total_affected"] == 0


def test_lineage_path(spark):
    from needle_spark.operators.lineage import lineage_path

    e = _edges(spark)
    p = lineage_path(e, "a", "e")
    assert p[0] == "a" and p[-1] == "e" and len(p) == 4
    assert p[2] == "d"
    assert lineage_path(e, "e", "a") is None     # edges are directed
    assert lineage_path(e, "a", "a") == ["a"]
    assert lineage_path(e, "a", "zz") is None
