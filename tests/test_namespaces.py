"""Named vector fields (vector_namespace.rs): schema validation,
per-field search, weighted RRF fusion vs a python oracle."""

import math

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.namespaces import (
    NamespaceError,
    NamespaceSchema,
    VectorFieldDef,
    fusion_search,
    search_field,
)

DOCS = [
    ("d1", [1.0, 0.0], [0.0, 1.0, 0.0]),
    ("d2", [0.9, 0.1], [0.0, 0.0, 1.0]),
    ("d3", [0.0, 1.0], [1.0, 0.0, 0.0]),
    ("d4", [0.5, 0.5], None),  # missing body embedding
]


@pytest.fixture(scope="module")
def ns_docs(spark):
    return spark.createDataFrame(
        DOCS, "id string, title_vec array<float>, body_vec array<float>")


@pytest.fixture(scope="module")
def schema():
    return (NamespaceSchema("articles")
            .add_field(VectorFieldDef("title_vec", 2))
            .add_field(VectorFieldDef("body_vec", 3)))


def test_schema_validation(schema):
    assert schema.field_names() == ["title_vec", "body_vec"]
    with pytest.raises(NamespaceError, match="duplicate"):
        schema.add_field(VectorFieldDef("title_vec", 2))
    with pytest.raises(NamespaceError, match="unknown fields"):
        schema.validate_fields(["nope"])
    with pytest.raises(NamespaceError, match="positive"):
        NamespaceSchema("x").add_field(VectorFieldDef("v", 0))


def test_search_field(spark, ns_docs, schema):
    got = search_field(ns_docs, schema, "title_vec", [1.0, 0.0], k=2).collect()
    assert [r["id"] for r in got] == ["d1", "d2"]
    assert got[0]["field"] == "title_vec" and got[0]["distance"] < 1e-9
    # null field values are skipped, not errors
    body = search_field(ns_docs, schema, "body_vec", [0.0, 1.0, 0.0], k=10).collect()
    assert {r["id"] for r in body} == {"d1", "d2", "d3"}
    with pytest.raises(NamespaceError, match="dimension mismatch"):
        search_field(ns_docs, schema, "title_vec", [1.0, 0.0, 0.0])
    with pytest.raises(NamespaceError, match="unknown field"):
        search_field(ns_docs, schema, "image_vec", [1.0])


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(y * y for y in b))
    return 1.0 - dot / (na * nb)


def test_fusion_search_matches_oracle(spark, ns_docs, schema):
    """RRF: weight/(rank + 60), 0-based rank per field (:292)."""
    tq, bq = [1.0, 0.0], [1.0, 0.0, 0.0]
    got = {r["id"]: r["score"] for r in fusion_search(
        ns_docs, schema, [("title_vec", tq, 2.0), ("body_vec", bq, 1.0)],
        k=4).collect()}

    title_rank = sorted((d for d in DOCS), key=lambda d: (_cos(d[1], tq), d[0]))
    body_rank = sorted((d for d in DOCS if d[2]),
                       key=lambda d: (_cos(d[2], bq), d[0]))
    want: dict = {}
    for rank, d in enumerate(title_rank):
        want[d[0]] = want.get(d[0], 0.0) + 2.0 / (rank + 60.0)
    for rank, d in enumerate(body_rank):
        want[d[0]] = want.get(d[0], 0.0) + 1.0 / (rank + 60.0)
    for did in got:
        assert abs(got[did] - want[did]) < 1e-12, did
    assert len(got) == 4
    with pytest.raises(NamespaceError, match="at least one"):
        fusion_search(ns_docs, schema, [], k=1)


# ===================================================================
# Late multi-modal fusion (multimodal_fusion.rs FusionStrategy)
# ===================================================================

@pytest.fixture(scope="module")
def mm_df(spark):
    # text 2-d, image 2-d; doc "c" lacks the image modality
    return spark.createDataFrame([
        ("a", [1.0, 0.0], [0.0, 1.0]),
        ("b", [0.0, 1.0], [1.0, 0.0]),
        ("c", [1.0, 0.0], None),
    ], "id string, text array<float>, image array<float>")


@pytest.fixture(scope="module")
def mm_schema():
    from needle_spark.operators.namespaces import (
        NamespaceSchema,
        VectorFieldDef,
    )

    return (NamespaceSchema("docs")
            .add_field(VectorFieldDef("text", 2, "cosine"))
            .add_field(VectorFieldDef("image", 2, "cosine")))


def test_multimodal_weighted_sum_renormalizes(mm_df, mm_schema):
    from needle_spark.operators.namespaces import multimodal_fusion_search

    q = [("text", [1.0, 0.0], 1.0), ("image", [0.0, 1.0], 1.0)]
    got = multimodal_fusion_search(mm_df, mm_schema, q, k=3).collect()
    by = {r["id"]: r for r in got}
    # a matches both modalities perfectly -> score 0
    assert got[0]["id"] == "a" and by["a"]["score"] == pytest.approx(0.0)
    # c only has text (perfect): renormalized over present weights -> 0
    assert by["c"]["score"] == pytest.approx(0.0, abs=1e-9)
    assert by["c"]["modalities_present"] == ["text"]
    assert by["b"]["score"] == pytest.approx(1.0)  # both modalities off


def test_multimodal_min_max_rrf(mm_df, mm_schema):
    from needle_spark.operators.namespaces import multimodal_fusion_search

    q = [("text", [1.0, 0.0], 1.0), ("image", [1.0, 0.0], 1.0)]
    mins = {r["id"]: r["score"] for r in multimodal_fusion_search(
        mm_df, mm_schema, q, k=3, strategy="min_distance").collect()}
    maxs = {r["id"]: r["score"] for r in multimodal_fusion_search(
        mm_df, mm_schema, q, k=3, strategy="max_distance").collect()}
    # b: text dist 1, image dist 0 -> min 0, max 1; NULLs skipped for c
    assert mins["b"] == pytest.approx(0.0)
    assert maxs["b"] == pytest.approx(1.0)
    assert mins["c"] == maxs["c"] == pytest.approx(0.0)

    rrf = {r["id"]: r["score"] for r in multimodal_fusion_search(
        mm_df, mm_schema, q, k=3, strategy="rrf").collect()}
    # a: dists 0 and 1 -> 1/(1/60 + 1/61); lower is better, a beats b? b
    # has the same multiset of distances {0,1} -> equal rrf; c has one
    # perfect modality only -> 60.0
    assert rrf["c"] == pytest.approx(60.0)
    assert rrf["a"] == pytest.approx(rrf["b"])


def test_multimodal_concatenate_requires_all(mm_df, mm_schema):
    from needle_spark.operators.namespaces import multimodal_fusion_search

    q = [("text", [1.0, 0.0], 1.0), ("image", [0.0, 1.0], 1.0)]
    got = multimodal_fusion_search(mm_df, mm_schema, q, k=3,
                                   strategy="concatenate").collect()
    ids = [r["id"] for r in got]
    assert "c" not in ids  # missing modality drops for concat
    assert got[0]["id"] == "a"


def test_multimodal_fusion_validation(mm_df, mm_schema):
    from needle_spark.operators.namespaces import (
        NamespaceError,
        multimodal_fusion_search,
    )

    with pytest.raises(NamespaceError):
        multimodal_fusion_search(mm_df, mm_schema, [], k=1)
    with pytest.raises(NamespaceError):
        multimodal_fusion_search(mm_df, mm_schema,
                                 [("text", [1.0], 1.0)], k=1)
    with pytest.raises(NamespaceError):
        multimodal_fusion_search(mm_df, mm_schema,
                                 [("text", [1.0, 0.0], 1.0)], k=1,
                                 strategy="harmonic")
