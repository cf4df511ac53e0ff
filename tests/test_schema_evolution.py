"""Schema evolution: versioned metadata schemas, compatibility checks,
lazy read adaptation across schema versions, eager migration, dimension
strategies (persistence/schema_evolution.rs:65-780)."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import CollectionError, Database
from needle_spark.schema_evolution import SchemaRegistry


def mk(spark, items, schema="id string, vector array<float>, category string"):
    return spark.createDataFrame(items, schema)


@pytest.fixture()
def coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "sedb"))
    c = db.create_collection(
        "docs", dims=2, schema="id string, vector array<float>, category string"
    )
    c.insert(mk(spark, [("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y")]),
             now_ms=1000)
    return c


def test_initial_schema_derived(spark, coll):
    reg = coll.schema_registry()
    assert reg.current_version == 1
    assert reg.version_history() == [1]
    assert reg.active_fields() == {
        "category": {"dtype": "string", "required": False, "default": None,
                     "added_in": 1, "removed_in": None},
    }
    # registry persists: a fresh handle sees the same state
    reg2 = SchemaRegistry(coll)
    assert reg2.current_version == 1


def test_add_field_with_default_adapts_old_rows(spark, coll):
    reg = coll.schema_registry()
    v = reg.apply_change({"kind": "add_field", "name": "score",
                          "dtype": "double", "default": 0.5})
    assert v == 2
    rows = {r["id"]: r for r in reg.adapted_df().collect()}
    assert rows["a"]["score"] == 0.5 and rows["b"]["score"] == 0.5
    assert rows["a"]["category"] == "x"
    # incompatible: duplicate add, required-without-default
    with pytest.raises(CollectionError, match="already exists"):
        reg.apply_change({"kind": "add_field", "name": "score"})
    with pytest.raises(CollectionError, match="needs a default"):
        reg.apply_change({"kind": "add_field", "name": "must",
                          "required": True})


def test_remove_and_rereadd_field(spark, coll):
    reg = coll.schema_registry()
    reg.apply_change({"kind": "remove_field", "name": "category"})
    assert "category" not in reg.adapted_df().columns
    with pytest.raises(CollectionError, match="no active field"):
        reg.apply_change({"kind": "remove_field", "name": "category"})
    # re-adding after removal is a fresh field with its own default
    reg.apply_change({"kind": "add_field", "name": "category",
                      "dtype": "string", "default": "unknown"})
    rows = {r["id"]: r["category"] for r in reg.adapted_df().collect()}
    # old physical values are superseded by the re-added field's view,
    # but non-null stored values still read through (coalesce)
    assert rows["a"] == "x"


def test_widen_field_and_incompatible_narrowing(spark, coll):
    reg = coll.schema_registry()
    coll.update_metadata({"id": "a"}, {"category": "z"})  # keep data alive
    reg.apply_change({"kind": "add_field", "name": "n",
                      "dtype": "int", "default": 1})
    reg.apply_change({"kind": "widen_field", "name": "n",
                      "to_dtype": "bigint"})
    assert reg.active_fields()["n"]["dtype"] == "bigint"
    assert dict(reg.adapted_df().dtypes)["n"] == "bigint"
    with pytest.raises(CollectionError, match="lossy narrowing"):
        reg.apply_change({"kind": "widen_field", "name": "n",
                          "to_dtype": "int"})


def test_require_field_rules(spark, coll):
    reg = coll.schema_registry()
    with pytest.raises(CollectionError, match="without a default"):
        reg.apply_change({"kind": "require_field", "name": "category"})
    reg.apply_change({"kind": "add_field", "name": "lang",
                      "dtype": "string", "default": "en"})
    v = reg.apply_change({"kind": "require_field", "name": "lang"})
    assert reg.schema_at(v)["fields"]["lang"]["required"]


def test_dimension_zero_pad_and_truncate(spark, coll):
    reg = coll.schema_registry()
    with pytest.raises(CollectionError, match="cannot shrink"):
        reg.apply_change({"kind": "change_dimension", "to": 1,
                          "strategy": "zero_pad"})
    with pytest.raises(CollectionError, match="truncate"):
        reg.apply_change({"kind": "change_dimension", "to": 4,
                          "strategy": "truncate"})
    reg.apply_change({"kind": "change_dimension", "to": 4,
                      "strategy": "zero_pad"})
    rows = {r["id"]: list(r["vector"]) for r in reg.adapted_df().collect()}
    assert rows["a"] == [1.0, 0.0, 0.0, 0.0]
    # data written under the OLD schema (2-d) and the NEW schema (4-d)
    # coexist; reads adapt both
    coll._manifest["dims"] = 4  # allow a 4-d insert pre-migration
    coll.insert(mk(spark, [("c", [1.0, 2.0, 3.0, 4.0], "c")]), now_ms=2000)
    rows = {r["id"]: list(r["vector"]) for r in reg.adapted_df().collect()}
    assert rows["c"] == [1.0, 2.0, 3.0, 4.0]
    assert rows["b"] == [0.0, 1.0, 0.0, 0.0]


def test_dimension_random_project_deterministic(spark, coll):
    reg = coll.schema_registry()
    reg.apply_change({"kind": "change_dimension", "to": 1,
                      "strategy": "random_project", "seed": 11})
    a1 = {r["id"]: list(r["vector"]) for r in reg.adapted_df().collect()}
    a2 = {r["id"]: list(r["vector"]) for r in reg.adapted_df().collect()}
    assert a1 == a2  # seeded counter-hash: reproducible anywhere
    assert all(len(v) == 1 for v in a1.values())


def test_pca_project_matrix_validation(spark, coll):
    reg = coll.schema_registry()
    with pytest.raises(CollectionError, match="matrix"):
        reg.apply_change({"kind": "change_dimension", "to": 1,
                          "strategy": "pca_project", "matrix": [[1.0]]})
    reg.apply_change({"kind": "change_dimension", "to": 1,
                      "strategy": "pca_project", "matrix": [[2.0, 3.0]]})
    rows = {r["id"]: list(r["vector"]) for r in reg.adapted_df().collect()}
    assert rows["a"] == [2.0] and rows["b"] == [3.0]


def test_migrate_rewrites_and_stamps(spark, coll):
    reg = coll.schema_registry()
    reg.apply_change({"kind": "add_field", "name": "score",
                      "dtype": "double", "default": 0.25})
    reg.apply_change({"kind": "change_dimension", "to": 3,
                      "strategy": "zero_pad"})
    rep = reg.migrate()
    assert rep.total_migrated == 2 and rep.to_version == 3
    # collection is physically on the new schema now
    assert coll.dims == 3
    assert "score double" in coll._manifest["schema"]
    direct = {r["id"]: r for r in coll.df().collect()}
    assert list(direct["a"]["vector"]) == [1.0, 0.0, 0.0]
    assert direct["a"]["score"] == 0.25
    # new inserts are validated against the migrated dims
    with pytest.raises(CollectionError, match="dimension"):
        coll.insert(mk(spark, [("d", [1.0, 0.0], "d")]))
    coll.insert(spark.createDataFrame(
        [("d", [1.0, 0.0, 1.0], "d", 0.9)],
        "id string, vector array<float>, category string, score double"))
    assert coll.count() == 3


def test_recall_validation_gate(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(5)
    db = Database(spark, str(tmp_path / "recalldb"))
    c = db.create_collection("emb", dims=8)
    rows = [(str(i), [float(x) for x in rng.normal(size=8)])
            for i in range(60)]
    c.insert(spark.createDataFrame(rows, "id string, vector array<float>"))
    reg = c.schema_registry()
    # identity-ish projection (keep all dims): recall must be 1.0
    res = reg.validate_dimension_recall(
        {"kind": "change_dimension", "to": 8, "strategy": "zero_pad"},
        sample_queries=5, k=5)
    assert res["passed"] and res["recall_at_k"] == 1.0
    # crushing 8 dims to 1 destroys neighborhoods: recall clearly < 1
    res1 = reg.validate_dimension_recall(
        {"kind": "change_dimension", "to": 1,
         "strategy": "random_project", "seed": 3},
        sample_queries=5, k=5, min_recall=0.95)
    assert res1["recall_at_k"] < 0.95 and not res1["passed"]


def test_dim_change_survives_later_schema_changes(spark, coll):
    """A pending dimension change is a lazy-adaptation marker: it must
    keep reshaping old rows through UNRELATED later changes (and
    migrate() must not rewrite un-adapted vectors)."""
    reg = coll.schema_registry()
    reg.apply_change({"kind": "change_dimension", "to": 4,
                      "strategy": "zero_pad"})
    reg.apply_change({"kind": "add_field", "name": "q",
                      "dtype": "double", "default": 0.5})
    rows = {r["id"]: list(r["vector"]) for r in reg.adapted_df().collect()}
    assert rows["a"] == [1.0, 0.0, 0.0, 0.0]   # still padded
    rep = reg.migrate()
    assert rep.total_migrated == 2
    direct = {r["id"]: list(r["vector"]) for r in coll.df().collect()}
    assert direct["a"] == [1.0, 0.0, 0.0, 0.0]
    assert coll.dims == 4


def test_stacked_dimension_changes_require_migrate(spark, coll):
    reg = coll.schema_registry()
    reg.apply_change({"kind": "change_dimension", "to": 4,
                      "strategy": "zero_pad"})
    with pytest.raises(CollectionError, match="migrate"):
        reg.apply_change({"kind": "change_dimension", "to": 8,
                          "strategy": "zero_pad"})
    reg.migrate()
    # marker consumed by the rewrite -> a fresh change is legal again
    v = reg.apply_change({"kind": "change_dimension", "to": 8,
                          "strategy": "zero_pad"})
    assert reg.schema_at(v)["dims"] == 8
    rows = {r["id"]: len(r["vector"]) for r in reg.adapted_df().collect()}
    assert set(rows.values()) == {8}


def test_change_distance_validated_and_normalized(spark, coll):
    reg = coll.schema_registry()
    with pytest.raises(CollectionError, match="unknown distance"):
        reg.apply_change({"kind": "change_distance", "to": "cosin"})
    reg.apply_change({"kind": "change_distance", "to": "L2"})
    assert reg.current_schema()["metric"] == "euclidean"


def test_time_travel_reads_reshape_after_migrate(spark, coll):
    # review finding: migrate() must not clear the lazy-adaptation
    # marker — adapted_df(version=<pre-migration>) still reshapes rows
    # written at the old dims
    reg = coll.schema_registry()
    reg.apply_change({"kind": "change_dimension", "to": 4,
                      "strategy": "zero_pad"})
    v_pre = coll.version  # manifest version holding 2-dim rows
    reg.migrate()
    # current read: physically 4-dim
    assert {len(r["vector"]) for r in reg.adapted_df().collect()} == {4}
    # time-travel read of the pre-migration version: reshaped on the fly
    old = reg.adapted_df(version=v_pre).collect()
    assert {len(r["vector"]) for r in old} == {4}
    # raw time-travel (no adaptation) really is 2-dim underneath
    assert {len(r["vector"]) for r in
            coll.df(version=v_pre).collect()} == {2}


def test_recall_validation_uses_collection_metric(spark, tmp_path):
    from needle_spark.catalog import Database
    db = Database(spark, str(tmp_path / "metdb"))
    c = db.create_collection("euc", dims=4, metric="euclidean")
    rows = [(f"v{i}", [float(i), 0.0, 0.0, 0.0]) for i in range(20)]
    c.insert(spark.createDataFrame(rows, "id string, vector array<float>"),
             now_ms=1)
    rep = c.schema_registry().validate_dimension_recall(
        {"kind": "change_dimension", "to": 2, "strategy": "truncate"},
        sample_queries=3, k=3)
    # truncating trailing zeros preserves euclidean neighborhoods exactly
    assert rep["recall_at_k"] == pytest.approx(1.0)
