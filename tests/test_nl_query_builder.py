"""NL -> NeedleQL query builder (reference: src/search/query_builder.rs):
profile-from-data, analysis/classification, validated generation, hints,
suggestions, alternatives, autocompletion, and explain."""

import pytest

from needle_spark.operators.nl_query_builder import (
    BuildHint,
    CollectionProfile,
    FieldProfile,
    QueryAnalyzer,
    VisualQueryBuilder,
    _filter_to_ql,
    generate_hints,
)


@pytest.fixture(scope="module")
def profile(spark, documents):
    return CollectionProfile.from_df(
        "documents", documents, dimensions=64,
        meta_cols=["lang", "source", "n_chars"])


@pytest.fixture(scope="module")
def builder(profile):
    return VisualQueryBuilder(profile)


# ===================================================================
# Profile from real data
# ===================================================================

def test_profile_from_df(profile, documents):
    assert profile.vector_count == documents.count()
    by = {f.name: f for f in profile.metadata_fields}
    assert by["lang"].dtype == "string"
    assert by["n_chars"].dtype == "number"
    # approx_count_distinct within HLL tolerance of the exact count
    exact = documents.select("lang").distinct().count()
    assert abs(by["lang"].cardinality - exact) <= max(2, exact * 0.1)
    assert by["lang"].examples  # sampled values for autocompletion


# ===================================================================
# Analysis
# ===================================================================

def test_analyze_classifies_hybrid():
    a = QueryAnalyzer().analyze("find fast merge papers in category spark")
    assert a.query_class == "hybrid"
    assert "category" in a.filter_fields
    assert any(t in ("fast", "merge", "papers") for t in a.search_terms)


def test_analyze_classifies_aggregation_and_temporal():
    qa = QueryAnalyzer()
    assert qa.analyze("how many documents in category x").query_class == \
        "aggregation"
    assert qa.analyze("last week").query_class == "temporal"
    assert qa.analyze("vector databases").query_class == "semantic"


def test_complexity_scales():
    qa = QueryAnalyzer()
    simple = qa.analyze("cats")
    busy = qa.analyze(
        "count documents by author smith in category science tagged as a, b "
        "and c from the last 30 days excluding category junk sorted by best")
    order = {"simple": 0, "moderate": 1, "complex": 2}
    assert order[busy.complexity] > order[simple.complexity]


# ===================================================================
# Build + validation round-trip
# ===================================================================

def test_build_generates_parseable_ql(builder):
    r = builder.build("find spark papers in category science")
    assert r.parsed is not None, r.needleql
    assert r.parsed["collection"] == "documents"
    assert "SIMILAR TO $query" in r.needleql
    assert "category = 'science'" in r.needleql
    assert r.needleql.endswith("LIMIT 10")
    assert 0.0 <= r.quality_score <= 1.0


def test_build_metadata_only(builder):
    r = builder.build("category: news")
    assert r.parsed is not None
    assert "SIMILAR TO" not in r.needleql
    assert r.needleql.endswith("LIMIT 100")
    assert any(s["type"] == "use_hybrid" for s in r.suggestions)


def test_build_temporal_filter(builder):
    r = builder.build("show documents from the last 7 days")
    assert r.parsed is not None
    assert "inserted_at >=" in r.needleql


def test_alternatives_parse_too(builder):
    from needle_spark.ql.parser import parse

    r = builder.build("find ml papers in category science")
    assert r.alternatives
    for alt in r.alternatives:
        parse(alt["needleql"])  # every alternative is valid NeedleQL


# ===================================================================
# Hints
# ===================================================================

def test_hints_high_cardinality_and_size():
    prof = CollectionProfile(
        "big", 128, 1_000_000,
        metadata_fields=[FieldProfile("user_id", "string",
                                      cardinality=500_000)])
    a = QueryAnalyzer().analyze("find docs with user_id: alice")
    a.filter_fields = ["user_id"]
    hints = generate_hints(a, prof)
    cats = {h.category for h in hints}
    assert "partitioning" in cats  # unindexed high-cardinality filter
    assert "quantization" in cats  # 1M vectors, no codes
    # warnings sort first
    assert hints[0].severity == "warning"


def test_hint_no_filter_large_collection():
    prof = CollectionProfile("big", 128, 200_000)
    a = QueryAnalyzer().analyze("neural networks")
    hints = generate_hints(a, prof)
    assert any(h.category == "filter_order" for h in hints)


# ===================================================================
# Autocompletion + explain
# ===================================================================

def test_suggest_fields_and_values(builder):
    fs = builder.suggest_fields("la")
    assert [f["name"] for f in fs] == ["lang"]
    vals = builder.suggest_values("lang")
    assert vals and all(isinstance(v, str) for v in vals)
    assert builder.suggest_values("nope") == []


def test_explain_narrates_steps(builder):
    ex = builder.explain(
        "SELECT id FROM documents WHERE lang = 'en' "
        "ORDER BY n_chars DESC LIMIT 5")
    assert ex["valid"] is True
    assert "documents" in ex["summary"]
    assert any("WHERE" in s for s in ex["steps"])
    assert any("top 5" in s for s in ex["steps"])

    bad = builder.explain("SELECT FROM WHERE")
    assert bad["valid"] is False and bad["error"]


# ===================================================================
# Filter serialization
# ===================================================================

def test_filter_to_ql_operators():
    assert _filter_to_ql({"lang": "en"}) == "lang = 'en'"
    assert _filter_to_ql({"score": {"$gte": 4}}) == "score >= 4"
    assert _filter_to_ql({"lang": {"$in": ["en", "fr"]}}) == \
        "lang IN ('en', 'fr')"
    assert _filter_to_ql({"tags": {"$contains": "ml"}}) == "tags LIKE '%ml%'"
    assert _filter_to_ql(
        {"tags": {"$not": {"$contains": "x"}}}) == "tags NOT LIKE '%x%'"
    got = _filter_to_ql({"$and": [{"a": 1}, {"b": {"$lt": 2}}]})
    assert got == "(a = 1 AND b < 2)"
    # quotes escape
    assert _filter_to_ql({"t": "it's"}) == "t = 'it''s'"


def test_word_boundary_keyword_matching():
    """'count' inside 'accounting' must not trigger the aggregation
    class; semantic queries stay semantic."""
    a = QueryAnalyzer().analyze("find documents about accounting")
    assert a.query_class == "semantic"
    assert not any(kw == "count" for _, kw in a.patterns)
    # real aggregation keyword still fires with boundaries
    b = QueryAnalyzer().analyze("count the documents")
    assert b.query_class == "aggregation"
