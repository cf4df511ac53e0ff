"""RAG pipeline tests: chunking strategies, recursive splitter,
document loaders, context assembly, multi-query fusion, cache, and the
end-to-end pipeline (reference: src/ml/rag/)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from needle_spark.catalog import Database
from needle_spark.operators.rag import (
    RagCache,
    RagConfig,
    RagPipeline,
    RecursiveTextSplitter,
    assemble_context,
    build_citations,
    chunk_paragraphs_expr,
    chunk_semantic_expr,
    chunk_sliding_expr,
    json_text_expr,
    load_markdown,
    multi_query_search,
    select_context_chunks,
    split_sentences_expr,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first()["v"]


# ===================================================================
# Chunkers
# ===================================================================

def test_split_sentences(spark):
    got = _one(spark, "Hi there. How are you? Great! trailing",
               split_sentences_expr(F.col("text")))
    assert got == ["Hi there.", "How are you?", "Great!", "trailing"]


def test_semantic_chunking_packs_sentences(spark):
    text = "aaaa. bbbb. cccc. dddd."
    # max 12, min 4: "aaaa." (5) + " bbbb." -> 11 <= 12 OK; +" cccc." 17 > 12
    got = _one(spark, text, chunk_semantic_expr(F.col("text"), 12, 4))
    assert got == ["aaaa. bbbb.", "cccc. dddd."]


def test_semantic_chunking_min_size_holds_small_chunks(spark):
    # min_size larger than the running chunk => never emit early
    got = _one(spark, "aa. bb. cc.", chunk_semantic_expr(F.col("text"), 5, 100))
    assert got == ["aa. bb. cc."]


def test_semantic_chunking_python_parity(spark):
    """The fold matches a direct sequential implementation of
    pipeline.rs:379-419 on a nontrivial document."""
    import re

    text = ("Spark plans scans. Catalyst prunes columns! Shuffles cost "
            "network? Broadcast the small side. Skew needs salting. "
            "AQE replans at runtime. Benchmarks keep us honest.")
    max_size, min_size = 60, 20

    sents = [s.strip() for s in re.findall(r"[^.!?]+[.!?]?", text) if s.strip()]
    chunks, cur = [], ""
    for s in sents:
        if len(cur) + len(s) > max_size and len(cur) >= min_size:
            chunks.append(cur.strip())
            cur = s
        else:
            cur = f"{cur} {s}" if cur else s
    if cur.strip():
        chunks.append(cur.strip())

    got = _one(spark, text, chunk_semantic_expr(F.col("text"), max_size, min_size))
    assert got == chunks


def test_semantic_chunking_arrow_parity_edge_cases(spark):
    """chunk_semantic_arrow must be value-identical to the expression
    fold on every trim/regex edge the two engines could disagree on:
    tabs/newlines (Spark trim strips SPACE only), runs of punctuation,
    unicode, leading/trailing spaces, empty and null text."""
    from needle_spark.operators.rag import chunk_semantic_arrow

    texts = [
        "aaaa. bbbb. cccc. dddd.",
        "Hi there. How are you? Great! trailing",
        "  leading spaces. and trailing.   ",
        "tab\tinside. newline\ninside. both kept by trim.",
        " \t . ?? !! ...",                      # punctuation runs
        "no terminator at all",
        "ünïcödé sentences. ümlaut päcking! ça va?",
        "a.b.c.d.e.f.g.h",                       # tiny sentences
        "",                                       # empty
        None,                                     # null
        "one very long sentence that exceeds every max size bound " * 5,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for mx, mn in ((12, 4), (60, 20), (5, 100), (512, 100)):
        rows = df.select(
            chunk_semantic_expr(F.col("text"), mx, mn).alias("expr"),
            chunk_semantic_arrow(F.col("text"), mx, mn).alias("arrow"),
        ).collect()
        for r in rows:
            assert r["expr"] == r["arrow"], (mx, mn, r)


def test_semantic_chunking_arrow_parity_corpus(spark, documents):
    """Full-corpus A/B (VERDICT r11 #7 'exceptAll-identical'): the arrow
    twin and the expression fold agree on every sf-corpus document at
    the declared query's (200, 50) configuration."""
    from needle_spark.operators.rag import chunk_semantic_arrow

    both = documents.select(
        "doc_id",
        chunk_semantic_expr(F.col("text"), 200, 50).alias("expr"),
        chunk_semantic_arrow(F.col("text"), 200, 50).alias("arrow"),
    )
    diff = both.filter(~(F.col("expr") == F.col("arrow"))).count()
    assert diff == 0


def test_sliding_window_words(spark):
    text = "w1 w2 w3 w4 w5 w6 w7"
    got = _one(spark, text, chunk_sliding_expr(F.col("text"), 3, 2))
    # starts 0,2,4 (start 4 reaches the end; start 6 suppressed)
    assert got == ["w1 w2 w3", "w3 w4 w5", "w5 w6 w7"]


def test_sliding_window_short_doc(spark):
    got = _one(spark, "only two", chunk_sliding_expr(F.col("text"), 5, 2))
    assert got == ["only two"]
    assert _one(spark, "", chunk_sliding_expr(F.col("text"), 5, 2)) == []


def test_paragraph_groups(spark):
    text = "p1\n\np2\n\np3\n\np4\n\np5"
    got = _one(spark, text, chunk_paragraphs_expr(F.col("text"), 2))
    assert got == ["p1\n\np2", "p3\n\np4", "p5"]


# ===================================================================
# RecursiveTextSplitter
# ===================================================================

def test_recursive_short_text_is_one_chunk():
    s = RecursiveTextSplitter(chunk_size=100, chunk_overlap=10)
    assert s.split("short text") == [("short text", 0, 10)]
    assert s.split("   ") == []


def test_recursive_splits_on_paragraphs_first():
    s = RecursiveTextSplitter(chunk_size=12, chunk_overlap=0)
    chunks = [c for c, _, _ in s.split("para one\n\npara two\n\npara three")]
    assert all(len(c) <= 12 for c in chunks)
    assert "".join(chunks).replace("\n\n", " ").startswith("para one")


def test_recursive_overlap_carries_tail():
    s = RecursiveTextSplitter(chunk_size=10, chunk_overlap=4,
                              separators=(" ",))
    chunks = [c for c, _, _ in s.split("aaa bbb ccc ddd eee")]
    # every chunk fits; adjacent chunks share the overlap tail
    assert all(len(c) <= 10 for c in chunks)
    joined = " ".join(chunks)
    for w in ("aaa", "bbb", "ccc", "ddd", "eee"):
        assert w in joined


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=" abcdef.\n", min_size=0, max_size=300),
       st.integers(8, 60), st.integers(0, 7))
def test_recursive_properties(text, size, overlap):
    s = RecursiveTextSplitter(chunk_size=size, chunk_overlap=overlap)
    chunks = s.split(text)
    for c, start, end in chunks:
        assert c.strip()
        assert end - start == len(c)
        # without overlap, a chunk longer than chunk_size only survives
        # when no separator could divide its interior (overlap tails can
        # legitimately carry separators into an oversize chunk — the
        # reference behaves identically, chunking.rs:181-189)
        if overlap == 0 and len(c) > size:
            assert not any(sep in c.strip() for sep in s.separators)
    # deterministic
    assert chunks == s.split(text)


def test_recursive_split_distributed(spark):
    from needle_spark.operators.rag import recursive_split

    df = spark.createDataFrame(
        [("d1", "alpha beta gamma delta epsilon zeta eta theta"),
         ("d2", "short")], "id string, text string")
    out = recursive_split(df, chunk_size=20, chunk_overlap=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    assert len(by_doc["d2"]) == 1 and by_doc["d2"][0]["chunk"] == "short"
    assert all(len(r["chunk"]) <= 20 for r in by_doc["d1"])
    idxs = [r["chunk_index"] for r in sorted(by_doc["d1"],
                                             key=lambda r: r["chunk_index"])]
    assert idxs == list(range(len(idxs)))


# ===================================================================
# Document loaders
# ===================================================================

def test_load_markdown(spark):
    md = "# Title One\nintro line\n## Section A\nbody a\n#### Deep\ntail"
    df = spark.createDataFrame([(md,)], "text string")
    row = load_markdown(df).first()
    assert row["title"] == "Title One"
    assert row["headings"] == ["Title One", "Section A", "Deep"]
    assert row["text"] == "Title One\nintro line\nSection A\nbody a\nDeep\ntail"


def test_load_markdown_no_title(spark):
    df = spark.createDataFrame([("plain\ntext",)], "text string")
    row = load_markdown(df).first()
    assert row["title"] is None
    assert row["headings"] == []
    assert row["text"] == "plain\ntext"


def test_json_text_expr(spark):
    df = spark.createDataFrame(
        [('{"title": "T", "body": "B", "n": 3}',)], "j string")
    got = df.select(json_text_expr("j", ["title", "body", "missing"])
                    .alias("t")).first()["t"]
    assert got == "T\n\nB"
    with pytest.raises(ValueError):
        json_text_expr("j", [])


# ===================================================================
# Context assembly
# ===================================================================

_ROWS = [
    {"id": "c1", "chunk": "alpha beta gamma", "score": 0.9,
     "document_id": "d1"},
    {"id": "c2", "chunk": "delta epsilon zeta", "score": 0.8,
     "document_id": "d1"},
    {"id": "c3", "chunk": "alpha beta gamma", "score": 0.7,
     "document_id": "d2"},
    {"id": "c4", "chunk": "eta theta iota kappa", "score": 0.6,
     "document_id": "d2"},
]


def test_assemble_none_and_score_priority():
    ctx, kept = assemble_context(_ROWS, "none", max_context_tokens=1)
    assert kept == [0, 1, 2, 3] and ctx.startswith("[1] alpha")
    # budget of 12 tokens = 48 chars: fits chunk1 (22) + chunk2 (24), not 3
    ctx, kept = assemble_context(_ROWS, "score_priority", max_context_tokens=12)
    assert kept == [0, 1]
    assert ctx == "[1] alpha beta gamma\n\n[2] delta epsilon zeta"
    # first chunk always kept even when over budget
    _, kept = assemble_context(_ROWS, "score_priority", max_context_tokens=1)
    assert kept == [0]


def test_assemble_truncate():
    ctx, _ = assemble_context(_ROWS, "truncate", max_context_tokens=10)
    assert ctx.endswith("[Context truncated]")
    ctx_full, _ = assemble_context(_ROWS, "truncate", max_context_tokens=10000)
    assert "[4] eta theta iota kappa" in ctx_full


def test_assemble_compress_drops_redundant():
    ctx, kept = assemble_context(_ROWS, "compress", max_context_tokens=1000,
                                 redundancy_threshold=0.99)
    # c3 duplicates c1's text exactly -> dropped
    assert kept == [0, 1, 3]
    assert "alpha beta gamma" in ctx and ctx.count("alpha beta gamma") == 1


def test_assemble_balanced_prefers_diverse():
    ctx, kept = assemble_context(_ROWS, "balanced", max_context_tokens=1000,
                                 diversity_weight=0.9)
    # with diversity dominating, the duplicate text is selected last
    assert kept.index(2) > kept.index(1)
    assert kept.index(2) > kept.index(3)


def test_select_context_chunks_matches_sequential(spark):
    df = spark.createDataFrame(
        [(r["id"], r["chunk"], r["score"]) for r in _ROWS],
        "id string, chunk string, score double")
    got = select_context_chunks(df, max_context_tokens=12).orderBy(
        "display_idx").collect()
    assert [r["id"] for r in got] == ["c1", "c2"]
    assert got[0]["display_idx"] == 1
    all_rows = select_context_chunks(df, max_context_tokens=12,
                                     strategy="none").count()
    assert all_rows == 4


def test_build_citations():
    cits = build_citations(_ROWS[:1])
    assert cits[0]["chunk_id"] == "c1"
    assert cits[0]["snippet"] == "alpha beta gamma"
    long = [{"id": "x", "chunk": "y" * 150, "score": 1.0}]
    assert build_citations(long)[0]["snippet"].endswith("...")


# ===================================================================
# Multi-query fusion
# ===================================================================

@pytest.fixture(scope="module")
def vec_docs(spark):
    rows = [(f"v{i}", [1.0 if j == i % 4 else 0.1 for j in range(4)])
            for i in range(12)]
    return spark.createDataFrame(rows, "id string, vector array<float>")


def test_multi_query_rrf(vec_docs):
    qs = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = multi_query_search(vec_docs, qs, k=6, merge="rrf").collect()
    assert len(got) == 6
    # ids ranked #1 for either query collect the largest rrf mass
    top_ids = {r["id"] for r in got[:2]}
    assert top_ids <= {f"v{i}" for i in range(12) if i % 4 in (0, 1)}
    scores = [r["rrf_score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_multi_query_best_score(vec_docs):
    qs = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    got = multi_query_search(vec_docs, qs, k=4, merge="best_score").collect()
    dists = [r["best_distance"] for r in got]
    assert dists == sorted(dists)
    assert all(r["matches"] >= 1 for r in got)


def test_multi_query_round_robin(vec_docs):
    qs = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = multi_query_search(vec_docs, qs, k=4, merge="round_robin").collect()
    # interleaved: rank-1 of q0, rank-1 of q1, then rank-2s; no dup ids
    assert len({r["id"] for r in got}) == 4
    assert [(r["rank"], r["query_id"]) for r in got] == sorted(
        (r["rank"], r["query_id"]) for r in got)
    with pytest.raises(ValueError):
        multi_query_search(vec_docs, qs, k=2, merge="bogus")


# ===================================================================
# Cache
# ===================================================================

def test_rag_cache_lru_ttl():
    c = RagCache(capacity=2, ttl_seconds=1000)
    assert c.get("q1") is None
    c.put("q1", "r1")
    c.put("q2", "r2")
    assert c.get("q1") == "r1"
    c.put("q3", "r3")  # evicts q2 (q1 was refreshed)
    assert c.get("q2") is None and c.get("q1") == "r1"
    c2 = RagCache(capacity=2, ttl_seconds=-1)
    c2.put("q", "r")
    assert c2.get("q") is None  # expired
    stats = c.stats()
    assert stats["hits"] == 2 and stats["entries"] == 2


# ===================================================================
# End-to-end pipeline
# ===================================================================

def test_rag_pipeline_end_to_end(spark, tmp_path):
    db = Database(spark, str(tmp_path / "ragdb"))
    cfg = RagConfig(collection_name="rag", dimensions=16,
                    chunking="semantic",
                    chunking_params={"max_chunk_size": 80,
                                     "min_chunk_size": 20},
                    top_k=3, max_context_tokens=200)
    pipe = RagPipeline(db, cfg)
    docs = spark.createDataFrame(
        [("d1", "Spark reads parquet. Catalyst prunes columns. "
                "Shuffles move data. Broadcast beats shuffle for small dims."),
         ("d2", "BM25 ranks terms. Vectors rank meaning. "
                "Hybrid fuses both with RRF. Rerankers polish the top.")],
        "id string, text string")
    n = pipe.ingest_documents(docs)
    assert n >= 2

    resp = pipe.query("hybrid vector fusion")
    assert resp.chunks and resp.context.startswith("[1] ")
    assert len(resp.citations) == len(
        [i for i in range(len(resp.chunks))][: len(resp.citations)])
    assert resp.metadata["chunks_retrieved"] >= len(resp.chunks)
    docs_ids = {c["document_id"] for c in resp.citations}
    assert docs_ids <= {"d1", "d2"}

    # exact cache serves repeats
    again = pipe.query("hybrid vector fusion")
    assert again is resp
    assert pipe.cache.stats()["hits"] == 1


def test_rag_pipeline_multi_query_and_dedup(spark, tmp_path):
    db = Database(spark, str(tmp_path / "ragdb2"))
    cfg = RagConfig(collection_name="rag2", dimensions=16,
                    chunking="sliding_window",
                    chunking_params={"window_size": 8, "step_size": 4},
                    top_k=4, dedup_threshold=0.95, cache_capacity=None)
    pipe = RagPipeline(db, cfg)
    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma delta epsilon zeta eta theta "
                "iota kappa lambda mu nu xi omicron pi")],
        "id string, text string")
    pipe.ingest_documents(docs)
    resp = pipe.query("alpha beta", queries=["alpha beta", "kappa lambda"])
    assert resp.chunks
    # near-identical overlapping windows were deduped
    texts = [c["chunk"] for c in resp.chunks]
    assert len(texts) == len(set(texts))


def test_rag_pipeline_rerank_and_hybrid_change_ranking(spark, tmp_path):
    """rerank=True and hybrid_search actually reorder results (they
    were silent no-ops before): a lexically-matching chunk overtakes a
    vector-closer one."""
    from needle_spark.catalog import Database

    db = Database(spark, str(tmp_path / "ragrrdb"))
    cfg = RagConfig(collection_name="rr", dimensions=16, chunking="none",
                    top_k=2, rerank=True, rerank_top_k=4,
                    cache_capacity=None)
    pipe = RagPipeline(db, cfg)
    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma delta"),
         ("d2", "catalyst optimizer rules engine"),
         ("d3", "epsilon zeta eta theta")],
        "id string, text string")
    pipe.ingest_documents(docs)
    got = pipe.query("catalyst optimizer rules engine")
    assert got.chunks[0]["chunk"].startswith("catalyst")
    assert "rerank_score" in got.chunks[0]

    cfg2 = RagConfig(collection_name="rr2", dimensions=16, chunking="none",
                     top_k=2, hybrid_search=True, hybrid_alpha=0.3,
                     cache_capacity=None)
    pipe2 = RagPipeline(db, cfg2)
    pipe2.ingest_documents(docs)
    got2 = pipe2.query("catalyst optimizer rules engine")
    assert got2.chunks[0]["chunk"].startswith("catalyst")
