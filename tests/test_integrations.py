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


# ----------------------------------------------- haystack / crewai / sk / vercel


def test_haystack_store_policies(spark, tmp_path):
    from needle_spark.integrations import (
        ERROR, SKIP, HaystackDocument, SparkDocumentStore)
    db = Database(spark, str(tmp_path / "hs"))
    store = SparkDocumentStore(db, "hsdocs", 4, duplicate_policy=SKIP)
    docs = [HaystackDocument("h1", "alpha", metadata={"k": "v"}),
            HaystackDocument("h2", "beta", content_type="table")]
    assert store.write_documents(docs, [EMB["ml"], EMB["cooking"]]) == 2
    # skip policy: re-writing h1 writes nothing new
    assert store.write_documents(
        [HaystackDocument("h1", "alpha2")], [EMB["dl"]]) == 0
    assert store.count_documents() == 2
    res = store.query_by_embedding(EMB["ml"], top_k=1)
    assert res[0].id == "h1" and res[0].content == "alpha"
    assert res[0].score == pytest.approx(1.0, abs=1e-6)
    assert res[0].metadata == {"k": "v"}
    t = store.query_by_embedding(EMB["cooking"], top_k=1)[0]
    assert t.content_type == "table"
    # error policy raises on duplicates
    est = SparkDocumentStore(db, "hserr", 4, duplicate_policy=ERROR)
    est.write_documents([HaystackDocument("x", "x")], [EMB["ml"]])
    with pytest.raises(IntegrationError, match="duplicate ids"):
        est.write_documents([HaystackDocument("x", "x")], [EMB["ml"]])
    assert store.delete_documents(["h1"]) == 1
    assert store.count_documents() == 1


def test_crewai_memory(spark, tmp_path):
    from needle_spark.integrations import CrewAiConfig, CrewAiMemoryStore
    db = Database(spark, str(tmp_path / "crew"))
    mem = CrewAiMemoryStore(db, "memories", 4, CrewAiConfig(
        max_memories=2, relevance_threshold=0.5))
    mem.remember("researcher", "AI is growing fast", EMB["ml"])
    mem.remember("chef", "bread needs yeast", EMB["cooking"],
                 metadata={"topic": "baking"})
    got = mem.recall(EMB["cooking"], top_k=5)  # capped at max_memories=2
    assert len(got) == 1  # the ml memory fails the 0.5 threshold
    assert got[0].agent == "chef" and got[0].content == "bread needs yeast"
    assert got[0].metadata == {"topic": "baking"}
    assert got[0].relevance == pytest.approx(1.0, abs=1e-6)
    assert len(mem) == 2
    assert mem.forget(got[0].id) is True
    assert len(mem) == 1


def test_semantic_kernel_store(spark, tmp_path):
    from needle_spark.integrations import (
        MemoryQueryResult, MemoryRecord, SemanticKernelMemoryStore)
    db = Database(spark, str(tmp_path / "sk"))
    sk = SemanticKernelMemoryStore(db, 4)
    assert not sk.has_collection("facts")
    rec = MemoryRecord("m1", "the sky is blue", description="color fact",
                       external_source_name="obs", is_reference=True,
                       timestamp="2024-01-01",
                       additional_metadata={"conf": 0.9})
    sk.upsert("facts", rec, EMB["ml"])  # auto-creates the collection
    assert sk.has_collection("facts") and sk.list_collections() == ["facts"]
    back = sk.get("facts", "m1")
    assert back.text == "the sky is blue"
    assert back.description == "color fact"
    assert back.external_source_name == "obs"
    assert back.is_reference is True and back.timestamp == "2024-01-01"
    assert back.additional_metadata == {"conf": 0.9}
    matches = sk.get_nearest_matches("facts", EMB["ml"], limit=1,
                                     min_relevance=0.9)
    assert isinstance(matches[0], MemoryQueryResult)
    assert matches[0].record.id == "m1"
    assert sk.remove("facts", "m1") is True
    assert sk.get("facts", "m1") is None
    assert sk.delete_collection("facts") is True
    with pytest.raises(IntegrationError):
        sk.get("nope", "x")


def test_vercel_ai_store(spark, tmp_path):
    from needle_spark.integrations import (
        RetrievalResult, VercelAiConfig, VercelAiStore)
    db = Database(spark, str(tmp_path / "vc"))
    store = VercelAiStore(db, "kb", 4, VercelAiConfig(
        max_results=2, score_threshold=0.5, include_metadata=True))
    store.add_document("a", "first doc", EMB["ml"], {"tag": "x"})
    store.add_documents([("b", "second", EMB["dl"]),
                         ("c", "third", EMB["cooking"], {"t": 1})])
    assert len(store) == 3
    got = store.retrieve(EMB["ml"], top_k=10)  # capped at 2, thresholded
    assert all(isinstance(r, RetrievalResult) for r in got)
    assert [r.id for r in got] == ["a", "b"]
    assert got[0].content == "first doc" and got[0].metadata == {"tag": "x"}
    assert store.delete_document("a") is True
    assert len(store) == 2


def test_filter_matches_json_scalars(store):
    store.add_texts(["p", "q"], [EMB["ml"], EMB["cooking"]],
                    metadatas=[{"published": True, "stars": 5},
                               {"published": False, "stars": 4}],
                    ids=["p1", "p2"])
    got = store.similarity_search(EMB["ml"], k=2,
                                  filter={"published": True})
    assert [d.id for d, _ in got] == ["p1"]
    got = store.similarity_search(EMB["ml"], k=2, filter={"stars": 4})
    assert [d.id for d, _ in got] == ["p2"]


def test_metadatas_length_validated(store):
    with pytest.raises(IntegrationError, match="metadatas"):
        store.add_texts(["a", "b"], [EMB["ml"], EMB["dl"]],
                        metadatas=[{"k": 1}])
