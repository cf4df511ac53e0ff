"""GraphRAG depth (graphrag.rs): entity extraction, co-occurrence
relationships, weighted traversal, PageRank importance, weighted label
propagation, community summaries — each against a python oracle."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.graphrag import (
    community_summaries,
    entity_cooccurrences,
    extract_entities,
    label_propagation,
    pagerank,
    pagerank_fixed,
    weighted_traversal,
)

DOCS = [
    (1, "Today Spark processes data. The Catalyst optimizer helps Spark run fast."),
    (2, "Needle searches vectors. Arrow moves Needle data to Pandas quickly."),
    (3, "lowercase only sentence here. nothing capitalized except First words."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_extract(text):
    seen, out = set(), []
    for sentence in text.split(". "):
        words = sentence.split()
        for i, w in enumerate(words):
            if i == 0 or len(w) < 2:
                continue
            clean = w.strip("".join(c for c in w if not c.isalnum()) or " ")
            # mirror the trim of non-alphanumerics at both ends
            s, e = 0, len(w)
            while s < e and not w[s].isalnum():
                s += 1
            while e > s and not w[e - 1].isalnum():
                e -= 1
            clean = w[s:e]
            if clean and clean[0].isupper() and clean not in seen:
                seen.add(clean)
                out.append(clean)
    return out


def test_extract_entities_matches_reference_rules(spark, docs):
    got = {(r["doc_id"], r["name"]) for r in extract_entities(docs).collect()}
    want = {(i, n) for i, t in DOCS for n in py_extract(t)}
    assert got == want
    # sentence-initial capitals are skipped ('Today', 'The', 'Needle'@0...)
    assert (1, "Today") not in got and (1, "The") not in got
    assert (1, "Spark") in got and (1, "Catalyst") in got
    # doc 3: only the non-initial capitalized 'First' qualifies
    assert {n for d, n in got if d == 3} == {"First"}
    ids = {r["entity_id"] for r in extract_entities(docs).collect()}
    assert "entity_spark" in ids


def test_entity_cooccurrences(spark, docs):
    ents = extract_entities(docs)
    pairs = {(r["src"], r["dst"]): r["weight"]
             for r in entity_cooccurrences(ents).collect()}
    assert pairs[("entity_catalyst", "entity_spark")] == 1
    # 'Arrow' is sentence-initial -> never an entity (reference :197)
    assert pairs[("entity_needle", "entity_pandas")] == 1
    assert not any("arrow" in s or "arrow" in d for s, d in pairs)
    assert all(s < d for s, d in pairs)  # canonical ordering


@pytest.fixture(scope="module")
def wedges(spark):
    #      a -0.9- b -0.8- c
    #      a -0.2- c ,  c -0.5- d
    return spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.8), ("a", "c", 0.2), ("c", "d", 0.5)],
        "src string, dst string, weight double")


def test_weighted_traversal_scores(spark, wedges):
    got = {r["id"]: r for r in
           weighted_traversal(wedges, "a", max_hops=3, k=10).collect()}
    # b: 0.9 at depth1 -> 0.45 ; c best acc = 0.9*0.8=0.72 at depth2 -> 0.24
    assert abs(got["b"]["graph_score"] - 0.9 / 2.0) < 1e-12
    assert abs(got["c"]["graph_score"] - 0.72 / 3.0) < 1e-12
    assert got["c"]["path"] == ["a", "b", "c"]  # the heavier path won
    # d reached through the best c-path
    assert abs(got["d"]["graph_score"] - 0.72 * 0.5 / 4.0) < 1e-12
    assert "a" not in got  # start node itself is not a result


def py_pagerank(edges, n_iter, d):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    scores = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        new = {v: (1.0 - d) / n for v in nodes}
        for s in nodes:
            nbrs = out.get(s, [])
            if nbrs:
                share = scores[s] / len(nbrs)
                for t in nbrs:
                    new[t] += d * share
        scores = new
    return scores


def test_pagerank_matches_python_oracle(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["importance"] for r in pagerank(df, iterations=12).collect()}
    want = py_pagerank(edges, 12, 0.85)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    # identical ranking to the oracle (c tops: it holds the full chain mass)
    ranked = sorted(got, key=lambda v: -got[v])
    want_ranked = sorted(want, key=lambda v: -want[v])
    assert ranked == want_ranked


def test_pagerank_fixed_tracks_float_and_is_partition_invariant(spark):
    """pagerank_fixed: fixed-point scores agree with the float variant
    to ~1e-10 (integer truncation is the only divergence) and are
    bit-identical under different partitionings — the property that
    makes it oracle-checkable and cluster-reproducible."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    fixed = {r["id"]: r["importance"]
             for r in pagerank_fixed(df, iterations=12).collect()}
    flt = {r["id"]: r["importance"]
           for r in pagerank(df, iterations=12).collect()}
    for v in flt:
        assert abs(fixed[v] - flt[v]) < 1e-9, v
    repart = {r["id"]: r["importance"]
              for r in pagerank_fixed(df.repartition(7),
                                      iterations=12).collect()}
    assert fixed == repart  # exact equality, not approx


def test_label_propagation_two_cliques(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0),
             ("x", "y", 1.0), ("y", "z", 1.0), ("x", "z", 1.0),
             ("c", "x", 0.1)]  # weak bridge
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    labels = {r["id"]: r["community"] for r in label_propagation(df).collect()}
    assert labels["a"] == labels["b"] == labels["c"]
    assert labels["x"] == labels["y"] == labels["z"]


def test_graphrag_combined_search(spark):
    """graphrag.rs search (:329-430): ANN seeds scored 1 - d/max_d,
    BFS expansion scores vw*seed_vs + gw/(1+hop), best combined wins."""
    from needle_spark.operators.graphrag import graphrag_search

    ents = spark.createDataFrame(
        [("e1", [1.0, 0.0]), ("e2", [0.8, 0.2]), ("e3", [0.0, 1.0])],
        "id string, vector array<float>")
    edges = spark.createDataFrame(
        [("e1", "x1"), ("x1", "x2"), ("e3", "y1")], "src string, dst string")
    got = {r["id"]: r for r in graphrag_search(
        ents, edges, [1.0, 0.0], k=10, max_hops=2,
        vector_weight=0.7, graph_weight=0.3).collect()}

    # seed scores: distances d(e1)=0, d(e2)~0.029, d(e3)=1 -> max_d = 1
    assert abs(got["e1"]["combined_score"] - (0.7 * 1.0 + 0.3)) < 1e-9
    assert got["e1"]["hop_count"] == 0 and got["e1"]["graph_score"] == 1.0
    assert abs(got["e3"]["vector_score"] - 0.0) < 1e-9  # worst seed -> 0
    # x1: 1 hop from the best seed -> 0.7*1 + 0.3*(1/2)
    assert abs(got["x1"]["combined_score"] - (0.7 + 0.15)) < 1e-9
    assert got["x1"]["path"] == ["e1", "x1"]
    # x2: 2 hops -> 0.7*1 + 0.3*(1/3)
    assert abs(got["x2"]["combined_score"] - (0.7 + 0.1)) < 1e-9
    # y1 reached only from the zero-score seed e3
    assert abs(got["y1"]["combined_score"] - (0.0 + 0.15)) < 1e-9
    # ranking is by combined score
    ordered = sorted(got.values(), key=lambda r: -r["combined_score"])
    assert [r["id"] for r in ordered][:2] == ["e1", "e2"]


def test_community_summaries(spark, docs):
    ents = extract_entities(docs)
    rels = entity_cooccurrences(ents)
    labels = label_propagation(rels, weight_col="weight")
    summ = {r["community"]: r for r in
            community_summaries(labels, ents, rels).collect()}
    # spark/catalyst community and needle/arrow/pandas community
    by_members = {tuple(r["members"]): r for r in summ.values()}
    assert ("Catalyst", "Spark") in by_members
    spark_comm = by_members[("Catalyst", "Spark")]
    assert spark_comm["member_count"] == 2
    assert spark_comm["internal_relationships"] == ["entity_catalyst --> entity_spark"]
