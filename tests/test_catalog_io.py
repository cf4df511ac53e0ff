"""Collection export/import (JSON + bundle) and compaction."""

import pytest

from needle_spark.catalog import Collection, Database


@pytest.fixture()
def coll(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    c = db.create_collection(
        "io_docs", dims=2, schema="id string, vector array<float>, category string"
    )
    rows = spark.createDataFrame(
        [("a", [1.0, 0.0], "x"), ("b", [0.0, 1.0], "y")],
        "id string, vector array<float>, category string",
    )
    c.insert(rows, now_ms=1)
    return c


def test_json_roundtrip(spark, tmp_path, coll):
    out = str(tmp_path / "export.json")
    coll.export_json(out)
    db2 = Database(spark, str(tmp_path / "db2"))
    c2 = db2.create_collection(
        "copy", dims=2, schema="id string, vector array<float>, category string"
    )
    assert c2.import_json(out) == 2
    assert sorted(r["id"] for r in c2.df().collect()) == ["a", "b"]
    assert [float(x) for x in c2.get("a")["vector"]] == [1.0, 0.0]


def test_bundle_roundtrip(spark, tmp_path, coll):
    bundle = str(tmp_path / "bundle")
    coll.export_bundle(bundle)
    c2 = Collection.import_bundle(spark, bundle, str(tmp_path / "restored"))
    assert c2.dims == 2 and c2.count() == 2
    assert c2.get("b")["category"] == "y"


def test_compact_drops_history(spark, coll):
    for i in range(3):
        coll.update_metadata({"id": "a"}, {"category": f"v{i}"}, now_ms=10 + i)
    assert len(coll.versions()) >= 4
    coll.compact(keep_versions=1, target_partitions=1)
    assert len(coll.versions()) == 2  # compacted current + one kept
    assert coll.get("a")["category"] == "v2"  # data intact
