"""Typed knowledge graph (reference:
src/experimental/knowledge_graph.rs): neighbors, context-boosted
search, shortest paths, subgraph extraction."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.knowledge_graph import (
    KnowledgeGraph,
    KnowledgeGraphConfig,
)


@pytest.fixture(scope="module")
def kg(spark):
    ents = spark.createDataFrame([
        ("a", "person", [1.0, 0.0]),
        ("b", "person", [0.9, 0.1]),
        ("c", "org", [0.0, 1.0]),
        ("d", "org", [0.1, 0.9]),
        ("e", "place", [0.5, 0.5]),
    ], "id string, entity_type string, vector array<float>")
    rels = spark.createDataFrame([
        ("a", "b", "knows", 1.0),
        ("b", "c", "works_at", 1.0),
        ("c", "d", "partner", 0.5),
    ], "src string, dst string, edge_type string, weight double")
    return KnowledgeGraph(ents, rels)


def test_lookups_and_neighbors(kg):
    assert kg.get_by_type("person").count() == 2
    assert kg.relations_by_type("knows").count() == 1
    nb = {(r["neighbor"], r["direction"]) for r in kg.neighbors("b").collect()}
    assert nb == {("c", "out"), ("a", "in")}


def test_degree_and_reachable(kg):
    deg = {r["nid"]: r["graph_score"] for r in kg.degree_scores().collect()}
    assert deg["b"] == pytest.approx(2 / 5)
    assert deg["a"] == pytest.approx(1 / 5)
    assert "e" not in deg  # isolated

    reach = {r["nid"]: r["hop"] for r in kg.reachable(["a"], 2).collect()}
    assert reach == {"a": 0, "b": 1, "c": 2}


def test_search_with_context_boosts_anchored(kg):
    # query near the "org" cluster; anchor at a -> b,c reachable in 2
    base = kg.search_with_context([0.0, 1.0], k=5).collect()
    assert base[0]["id"] in ("c", "d")  # pure similarity + degree
    boosted = kg.search_with_context([0.0, 1.0], k=5,
                                     anchors=["a"]).collect()
    by = {r["id"]: r for r in boosted}
    # reachable entities carry graph_score 1.0
    assert by["b"]["graph_score"] == 1.0 and by["c"]["graph_score"] == 1.0
    assert by["d"]["graph_score"] < 1.0
    # with the boost, c (similar AND reachable) must beat d
    assert boosted[0]["id"] == "c"
    for r in boosted:
        assert r["combined_score"] == pytest.approx(
            0.7 * r["similarity"] + 0.3 * r["graph_score"])


def test_find_path(kg):
    assert kg.find_path("a", "d") == ["a", "b", "c", "d"]
    assert kg.find_path("d", "a") == ["d", "c", "b", "a"]  # undirected BFS
    assert kg.find_path("a", "a") == ["a"]
    assert kg.find_path("a", "e") is None  # e is isolated
    assert kg.find_path("a", "d", max_hops=2) is None  # too far


def test_subgraph(kg):
    ents, rels = kg.subgraph(["b"], hops=1)
    assert {r["id"] for r in ents.collect()} == {"a", "b", "c"}
    got = {(r["src"], r["dst"]) for r in rels.collect()}
    assert got == {("a", "b"), ("b", "c")}  # induced edges only


def test_config_weights(spark, kg):
    heavy_graph = KnowledgeGraph(kg.entities, kg.relations,
                                 KnowledgeGraphConfig(similarity_weight=0.0,
                                                      graph_weight=1.0))
    got = heavy_graph.search_with_context([1.0, 0.0], k=1,
                                          anchors=["a"]).first()
    assert got["combined_score"] == pytest.approx(got["graph_score"])
