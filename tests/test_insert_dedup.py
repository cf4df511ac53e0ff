"""Insert-time semantic-dedup policies (VERDICT r9 missing #1;
reference src/collection/dedup.rs:80-161, insert.rs:147,
config.rs:137-199): Reject / MergeMetadata / Version on insert, with
the reference's SEQUENTIAL semantics — each row sees the collection as
mutated by earlier batch rows."""

import json
import math

import pytest

from needle_spark.catalog import Database
from needle_spark.operators.insert_dedup import (SemanticDedupConfig,
                                                 apply_insert_dedup,
                                                 merge_json_str)


@pytest.fixture()
def db(spark, tmp_path):
    return Database(spark, str(tmp_path / "db"))


SCHEMA = "id string, vector array<float>, metadata string"


def mk(spark, items):
    return spark.createDataFrame(
        [(i, v, m) for i, v, m in items], SCHEMA)


def unit(theta):
    return [float(math.cos(theta)), float(math.sin(theta))]


@pytest.fixture()
def coll(spark, db):
    c = db.create_collection("vecs", dims=2, schema=SCHEMA)
    c.insert(mk(spark, [
        ("e1", unit(0.0), json.dumps({"src": "old", "keep": 1})),
        ("e2", unit(1.2), None),
    ]), now_ms=1000)
    return c


def test_config_presets_and_validation():
    assert SemanticDedupConfig.strict().distance_threshold == 0.01
    assert SemanticDedupConfig.moderate().distance_threshold == 0.05
    assert SemanticDedupConfig.relaxed().distance_threshold == 0.1
    for p in ("strict", "moderate", "relaxed"):
        cfg = getattr(SemanticDedupConfig, p)()
        assert cfg.enabled and cfg.policy == "reject"
    assert SemanticDedupConfig().enabled is False  # config.rs default
    assert SemanticDedupConfig().distance_threshold == 0.02
    with pytest.raises(ValueError):
        SemanticDedupConfig(policy="drop")
    with pytest.raises(ValueError):
        SemanticDedupConfig(distance_threshold=0.0)


def test_merge_json_shallow():
    """dedup.rs:230 merge_json_values: object+object merges with the
    new side winning; anything else is replaced by new; null new
    keeps existing."""
    assert json.loads(merge_json_str(
        '{"a": 1, "b": 2}', '{"b": 3, "c": 4}')) == \
        {"a": 1, "b": 3, "c": 4}
    assert merge_json_str('{"a": 1}', None) == '{"a": 1}'
    assert merge_json_str(None, '{"x": 9}') == '{"x":9}'
    assert merge_json_str('[1]', '{"x": 1}') == '{"x": 1}'  # non-obj base
    assert merge_json_str('{"a": 1}', '"s"') == '"s"'  # non-obj overlay


def test_reject_policy_sequential(spark, coll):
    """Reject: near-dups of existing rows AND of earlier ACCEPTED
    batch rows are dropped; a row near only a REJECTED row inserts
    (the rejected row never joined the collection)."""
    coll.set_semantic_dedup(threshold=0.05, policy="reject")
    # cosine distance 1-cos(dtheta): 0.05 ~ dtheta 0.316 rad
    batch = mk(spark, [
        ("n1", unit(0.01), None),    # dup of e1 (dtheta .01)
        ("n2", unit(2.4), None),     # fresh -> accepted
        ("n3", unit(2.41), None),    # dup of accepted n2
        ("n4", unit(0.02), None),    # dup of e1 (n1 was rejected, but
                                     # e1 still matches)
        ("n5", unit(-2.0), None),    # fresh
    ])
    out = coll.insert_dedup(batch)
    assert out["inserted"] == 2 and out["rejected"] == 3
    acts = {o["id"]: o for o in out["outcomes"]}
    assert acts["n1"]["action"] == "rejected"
    assert acts["n1"]["existing_id"] == "e1"
    assert acts["n3"]["action"] == "rejected"
    assert acts["n3"]["existing_id"] == "n2"  # sequential: batch target
    assert acts["n4"]["existing_id"] == "e1"
    ids = {r["id"] for r in coll.df().collect()}
    assert ids == {"e1", "e2", "n2", "n5"}


def test_insert_routes_through_gate(spark, coll):
    """Collection.insert() applies the configured policy
    (insert.rs:147) and returns rows actually appended."""
    coll.set_semantic_dedup(threshold=0.05, policy="reject")
    n = coll.insert(mk(spark, [
        ("n1", unit(0.01), None), ("n2", unit(2.4), None)]))
    assert n == 1
    assert coll.count() == 3
    # disabling restores plain append semantics
    coll.set_semantic_dedup(enabled=False)
    n = coll.insert(mk(spark, [("n3", unit(0.015), None)]))
    assert n == 1 and coll.contains("n3")


def test_merge_metadata_policy(spark, coll):
    """MergeMetadata: the duplicate's metadata shallow-merges into the
    matched EXISTING row (new keys win); the duplicate row itself is
    not stored.  A duplicate with no metadata merges nothing
    (dedup.rs:131 `if let Some(new_meta)`)."""
    coll.set_semantic_dedup(threshold=0.05, policy="merge_metadata")
    out = coll.insert_dedup(mk(spark, [
        ("m1", unit(0.01), json.dumps({"src": "new", "extra": True})),
        ("m2", unit(1.21), None),   # dup of e2, no metadata -> no-op
        ("m3", unit(2.4), json.dumps({"fresh": 1})),  # accepted
    ]))
    assert out["merged"] == 2 and out["inserted"] == 1
    got = json.loads(coll.get("e1")["metadata"])
    assert got == {"src": "new", "keep": 1, "extra": True}
    assert coll.get("e2")["metadata"] is None
    assert not coll.contains("m1") and not coll.contains("m2")
    assert coll.contains("m3")


def test_merge_metadata_batch_target(spark, coll):
    """Sequential merge: a duplicate of an earlier ACCEPTED batch row
    merges into that pending row before it lands."""
    coll.set_semantic_dedup(threshold=0.05, policy="merge_metadata")
    out = coll.insert_dedup(mk(spark, [
        ("m1", unit(2.4), json.dumps({"a": 1})),
        ("m2", unit(2.41), json.dumps({"b": 2})),  # dup of pending m1
    ]))
    assert out["inserted"] == 1 and out["merged"] == 1
    assert json.loads(coll.get("m1")["metadata"]) == {"a": 1, "b": 2}
    assert not coll.contains("m2")


def test_version_policy(spark, coll):
    """Version: duplicates store under '{id}-v{len}' (dedup.rs:152,
    N = collection length at that row's turn) and PARTICIPATE in later
    checks like any inserted row."""
    coll.set_semantic_dedup(threshold=0.05, policy="version")
    out = coll.insert_dedup(mk(spark, [
        ("v1", unit(0.01), None),   # dup of e1 -> v1-v2 (len=2)
        ("v2", unit(2.4), None),    # fresh (len=3 after)
        ("v3", unit(2.41), None),   # dup of v2 -> v3-v4 (len=4)
    ]))
    assert out["versioned"] == 2 and out["inserted"] == 1
    acts = {o["id"]: o for o in out["outcomes"]}
    assert acts["v1"]["versioned_id"] == "v1-v2"
    assert acts["v3"]["versioned_id"] == "v3-v4"
    assert acts["v3"]["existing_id"] == "v2"
    ids = {r["id"] for r in coll.df().collect()}
    assert ids == {"e1", "e2", "v1-v2", "v2", "v3-v4"}


def test_nearest_target_wins(spark, coll):
    """The policy target is the 1-NN over the CURRENT collection —
    when both an existing row and an earlier batch row are within
    threshold, the NEARER one is reported (dedup.rs:96 check_dedup is
    a 1-NN search, not first-match)."""
    coll.set_semantic_dedup(threshold=0.1, policy="reject")
    # e1 at theta=0 (threshold 0.1 = angular radius ~0.451).
    # b1 at 0.7: 1-cos(0.7)=0.235 > 0.1 from everything -> accepted.
    # b2 at 0.42: 1-cos(0.42)=0.0869 < 0.1 from e1 AND
    #             1-cos(0.28)=0.0390 < 0.1 from b1 -> b1 is NEARER
    out = coll.insert_dedup(mk(spark, [
        ("b1", unit(0.7), None),
        ("b2", unit(0.42), None),
    ]))
    acts = {o["id"]: o for o in out["outcomes"]}
    assert acts["b1"]["action"] == "inserted"
    assert acts["b2"]["action"] == "rejected"
    assert acts["b2"]["existing_id"] == "b1"
    assert acts["b2"]["distance"] == pytest.approx(
        1.0 - math.cos(0.28), abs=1e-5)


def test_apply_insert_dedup_pure(spark):
    """Pure-function path over plain frames (no catalog): disabled
    config passes everything through."""
    existing = mk(spark, [("e", unit(0.0), None)])
    batch = mk(spark, [("b", unit(0.001), None)])
    res = apply_insert_dedup(existing, batch, SemanticDedupConfig(),
                             id_col="id", vector_col="vector")
    assert res.accepted.count() == 1

    cfg = SemanticDedupConfig.new(0.05, "reject")
    res = apply_insert_dedup(existing, batch, cfg,
                             id_col="id", vector_col="vector")
    assert res.accepted.count() == 0
    assert res.outcomes[0]["action"] == "rejected"
    assert res.counts == {"inserted": 0, "rejected": 1, "merged": 0,
                          "versioned": 0, "checked": 1}


@pytest.fixture()
def arrow_off(spark):
    """Force the non-Arrow createDataFrame row-verifier path — the
    driver harness environment where round-10's numpy.float32 crash
    surfaced (CORRECTNESS_r10: FIELD_DATA_TYPE_UNACCEPTABLE)."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield
    spark.conf.set(key, old)


def test_reject_arrow_disabled(spark, arrow_off):
    """Regression (VERDICT r10 What's-wrong #1): pandas frames with
    numpy.float32 array cells must not reach createDataFrame — the
    operator has to work on a session WITHOUT the Arrow fallback."""
    existing = mk(spark, [("e", unit(0.0), None)])
    batch = mk(spark, [("b1", unit(0.001), None),
                       ("b2", unit(1.5), json.dumps({"k": 1}))])
    cfg = SemanticDedupConfig.new(0.05, "reject")
    res = apply_insert_dedup(existing, batch, cfg,
                             id_col="id", vector_col="vector")
    got = {r["id"] for r in res.accepted.collect()}
    assert got == {"b2"}


def test_version_arrow_disabled(spark, arrow_off):
    existing = mk(spark, [("e", unit(0.0), None)])
    batch = mk(spark, [("b1", unit(0.001), None)])
    cfg = SemanticDedupConfig.new(0.05, "version")
    res = apply_insert_dedup(existing, batch, cfg,
                             id_col="id", vector_col="vector")
    rows = res.accepted.collect()
    assert [r["id"] for r in rows] == ["b1-v1"]
    # vector round-trips as plain floats
    assert all(isinstance(x, float) for x in rows[0]["vector"])


def test_version_requires_string_id(spark):
    """ADVICE r10: '{id}-v{N}' ids are strings — a numeric id column
    must be rejected up front, not corrupted at schema coercion."""
    existing = spark.createDataFrame(
        [(1, unit(0.0))], "id long, vector array<float>")
    batch = spark.createDataFrame(
        [(2, unit(0.001))], "id long, vector array<float>")
    cfg = SemanticDedupConfig.new(0.05, "version")
    with pytest.raises(ValueError, match="string id"):
        apply_insert_dedup(existing, batch, cfg,
                           id_col="id", vector_col="vector")


def test_set_semantic_dedup_metric_defaults_to_collection(spark, db):
    """ADVICE r10: check_dedup runs through Collection::search in the
    reference, i.e. the collection's OWN metric — a euclidean
    collection must gate on euclidean unless overridden."""
    c = db.create_collection("euc", dims=2, schema=SCHEMA,
                             metric="euclidean")
    rep = c.set_semantic_dedup(threshold=0.05)
    assert rep["metric"] == "euclidean"
    assert c.semantic_dedup_config().metric == "euclidean"
    # preset branch honors the metric too
    rep = c.set_semantic_dedup(preset="strict")
    assert rep["metric"] == "euclidean"
    assert rep["distance_threshold"] == 0.01
    # explicit override still wins
    rep = c.set_semantic_dedup(threshold=0.05, metric="dot")
    assert rep["metric"] == "dot"


def test_set_semantic_dedup_preset_validates_policy(spark, db):
    """ADVICE r10: preset branch must run __post_init__ validation —
    a bogus policy must not persist into the manifest."""
    c = db.create_collection("val", dims=2, schema=SCHEMA)
    with pytest.raises(ValueError):
        c.set_semantic_dedup(preset="strict", policy="bogus")
    # manifest untouched -> subsequent reads don't raise
    assert c.semantic_dedup_config().enabled is False
