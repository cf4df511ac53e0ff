"""Framework integrations — langchain.rs / llamaindex.rs parity:
Document/TextNode round-trips, add/search/MMR/batch, relevance score
functions, metadata filters, update/delete."""

import pytest

from needle_spark.catalog import Database
from needle_spark.integrations import (
    RELEVANCE_FNS,
    Document,
    IntegrationError,
    NodeWithScore,
    SparkVectorStore,
    SparkVectorStoreIndex,
    TextNode,
    VectorStoreConfig,
)


@pytest.fixture()
def store(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    return SparkVectorStore(db, VectorStoreConfig("docs", 4))


EMB = {
    "ml": [1.0, 0.0, 0.0, 0.0],
    "dl": [0.9, 0.1, 0.0, 0.0],
    "cooking": [0.0, 0.0, 1.0, 0.0],
}


def seed(store):
    docs = [
        Document("Machine learning is a subset of AI.",
                 {"source": "intro.txt"}, id="d1"),
        Document("Deep learning uses neural networks.",
                 {"source": "deep.txt"}, id="d2"),
        Document("How to bake sourdough bread.",
                 {"source": "cook.txt"}, id="d3"),
    ]
    store.add_documents(docs, [EMB["ml"], EMB["dl"], EMB["cooking"]])
    return docs


def test_relevance_score_functions():
    # langchain.rs:229-240
    assert RELEVANCE_FNS["cosine"](0.2) == pytest.approx(0.8)
    assert RELEVANCE_FNS["euclidean"](1.0) == pytest.approx(0.5)
    assert RELEVANCE_FNS["dot_product"](0.5) == pytest.approx(0.75)
    assert RELEVANCE_FNS["max_inner_product"](0.3) == pytest.approx(-0.3)
    with pytest.raises(IntegrationError):
        VectorStoreConfig("c", 4, relevance_score_fn="sigmoid")


def test_add_and_similarity_search(store):
    seed(store)
    assert len(store) == 3
    res = store.similarity_search(EMB["ml"], k=2)
    assert [d.id for d, _ in res] == ["d1", "d2"]
    doc, dist = res[0]
    assert doc.page_content == "Machine learning is a subset of AI."
    assert doc.metadata == {"source": "intro.txt"}  # content key stripped
    assert dist == pytest.approx(0.0, abs=1e-6)


def test_add_texts_generates_ids(store):
    ids = store.add_texts(["a", "b"], [EMB["ml"], EMB["dl"]])
    assert len(ids) == 2 and all(i.startswith("doc-") for i in ids)
    assert store.get(ids[0]).page_content == "a"
    with pytest.raises(IntegrationError, match="match"):
        store.add_texts(["a"], [EMB["ml"], EMB["dl"]])


def test_relevance_scores_and_threshold(store):
    seed(store)
    res = store.similarity_search_with_relevance_scores(
        EMB["ml"], k=3, score_threshold=0.5)
    ids = [d.id for d, _ in res]
    assert "d1" in ids and "d3" not in ids  # cooking below threshold
    for _, s in res:
        assert s >= 0.5


def test_metadata_filter(store):
    seed(store)
    res = store.similarity_search(EMB["ml"], k=3,
                                  filter={"source": "cook.txt"})
    assert [d.id for d, _ in res] == ["d3"]


def test_mmr_diversifies(store):
    seed(store)
    res = store.max_marginal_relevance_search(
        EMB["ml"], k=2, fetch_k=3, lambda_mult=0.1)
    ids = [d.id for d, _ in res]
    assert ids[0] == "d1" and ids[1] == "d3"  # diversity beats d2


def test_batch_similarity_search(store):
    seed(store)
    out = store.batch_similarity_search([EMB["ml"], EMB["cooking"]], k=1)
    assert [d.id for d, _ in out[0]] == ["d1"]
    assert [d.id for d, _ in out[1]] == ["d3"]


def test_get_update_delete(store):
    seed(store)
    assert store.get("missing") is None
    store.update_metadata("d1", {"source": "updated.txt", "v": 2})
    doc = store.get("d1")
    assert doc.metadata == {"source": "updated.txt", "v": 2}
    assert doc.page_content == "Machine learning is a subset of AI."  # kept
    assert store.delete(["d1", "d3"]) is True
    assert len(store) == 1 and store.get("d1") is None


def test_llamaindex_nodes_roundtrip(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db2"))
    idx = SparkVectorStoreIndex(db, "nodes", 4)
    nodes = [
        TextNode("chunk one", id="n1", metadata={"doc": "a"},
                 source_node_id="src", next_node_id="n2",
                 start_char_idx=0, end_char_idx=9),
        TextNode("chunk two", id="n2", prev_node_id="n1"),
    ]
    idx.add_nodes(nodes, [EMB["ml"], EMB["cooking"]])
    got = idx.retrieve(EMB["ml"], similarity_top_k=1)
    assert isinstance(got[0], NodeWithScore)
    n = got[0].node
    assert n.id == "n1" and n.text == "chunk one"
    assert n.metadata == {"doc": "a"}
    assert (n.source_node_id, n.next_node_id) == ("src", "n2")
    assert (n.start_char_idx, n.end_char_idx) == (0, 9)
    assert got[0].score == pytest.approx(1.0, abs=1e-6)
    assert idx.delete_nodes(["n1"]) is True
    with pytest.raises(IntegrationError):
        idx.add_nodes(nodes, [EMB["ml"]])


def test_reopen_existing_collection(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db3"))
    s1 = SparkVectorStore(db, VectorStoreConfig("docs", 4))
    s1.add_texts(["x"], [EMB["ml"]], ids=["only"])
    s2 = SparkVectorStore(db, VectorStoreConfig("docs", 4))
    assert len(s2) == 1 and s2.get("only").page_content == "x"
