"""Pipeline DSL, typed metadata schema enforcement, binary quantization."""

import pytest
from pyspark.sql import functions as F

from needle_spark.catalog import CollectionError, Database
from needle_spark.operators.pipeline_dsl import PipelineError, run_pipeline
from needle_spark.plans.quantization import BinaryQuantizer


@pytest.fixture(scope="module")
def corpus(spark, embeddings, documents):
    emb = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"), "label"
    )
    docs = documents.select(F.col("doc_id").alias("id"), "text")
    return emb.join(docs, "id").cache()


def test_pipeline_search_filter_rerank_limit(spark, corpus, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    out = run_pipeline(
        corpus,
        {"stages": [
            {"type": "search", "k": 40},
            {"type": "filter", "filter": {"label": {"$gte": 2}}},
            {"type": "rerank_field", "field": "label", "k": 10, "fetch_k": 40},
            {"type": "limit", "k": 5},
        ]},
        params={"vector": qv},
    ).collect()
    assert len(out) == 5
    assert all(r["label"] >= 2 for r in out)
    labels = [r["label"] for r in out]
    assert labels == sorted(labels, reverse=True)


def test_pipeline_diversify_terminal(spark, corpus, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    picked = run_pipeline(
        corpus,
        {"stages": [
            {"type": "search", "k": 20},
            {"type": "diversify", "k": 5, "lambda": 0.5},
        ]},
        params={"vector": qv},
    )
    assert isinstance(picked, list) and len(picked) == 5
    with pytest.raises(PipelineError, match="terminal"):
        run_pipeline(
            corpus,
            {"stages": [
                {"type": "search", "k": 20},
                {"type": "diversify", "k": 5},
                {"type": "limit", "k": 2},
            ]},
            params={"vector": qv},
        )


def test_pipeline_hybrid_stage(spark, corpus, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    out = run_pipeline(
        corpus,
        {"stages": [{"type": "hybrid", "k": 5, "query": "fast merge sort"}]},
        params={"vector": qv},
    ).collect()
    assert 0 < len(out) <= 5


def test_pipeline_errors(spark, corpus):
    with pytest.raises(PipelineError, match="no stages"):
        run_pipeline(corpus, {"stages": []})
    with pytest.raises(PipelineError, match="unknown stage"):
        run_pipeline(corpus, {"stages": [{"type": "frobnicate"}]})
    with pytest.raises(PipelineError, match="requires"):
        run_pipeline(corpus, {"stages": [{"type": "search"}]})


def test_pipeline_threshold_and_cache_stages(spark, corpus, embeddings):
    """ThresholdStageConfig (:87) and CacheStageConfig (:94)."""
    from needle_spark.operators.semantic_cache import SemanticCache

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    out = run_pipeline(
        corpus,
        {"stages": [
            {"type": "search", "k": 50},
            {"type": "threshold", "max_distance": 0.5},
        ]},
        params={"vector": qv},
    ).collect()
    assert out and all(r["distance"] <= 0.5 for r in out)

    cache = SemanticCache(similarity_threshold=0.999)
    cfg = {"stages": [
        {"type": "cache", "ttl_secs": 600},
        {"type": "search", "k": 30},
        {"type": "limit", "k": 5},
    ]}
    first = run_pipeline(corpus, cfg, params={"vector": qv, "now": 1}, cache=cache)
    assert len(first) == 5 and cache.misses == 1
    again = run_pipeline(corpus, cfg, params={"vector": qv, "now": 2}, cache=cache)
    assert cache.hits == 1
    assert [r["id"] for r in again] == [r["id"] for r in first]


def test_pipeline_validate_optimize_templates(spark, corpus, embeddings):
    from needle_spark.operators.pipeline_dsl import (
        optimize_pipeline,
        pipeline_from_json,
        pipeline_summary,
        pipeline_to_json,
        template,
        validate_pipeline,
    )

    assert validate_pipeline({"stages": []}) == ["Pipeline has no stages"]
    assert validate_pipeline({"stages": [{"type": "limit", "k": 1}]}) == \
        ["First stage should be 'search'"]
    assert "Multiple search stages" in validate_pipeline(
        {"stages": [{"type": "search"}, {"type": "search"}]})[0]

    messy = {"stages": [{"type": "search", "k": 30},
                        {"type": "limit", "k": 10},
                        {"type": "filter", "filter": {"label": {"$gte": 2}}}]}
    opt = optimize_pipeline(messy)
    assert [s["type"] for s in opt["stages"]] == ["search", "filter", "limit"]

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    for name, kw in [
        ("simple_rag", {}),
        ("filtered_rag", {"filter": {"label": {"$gte": 1}}}),
        ("diverse_rag", {}),
        ("reranked_rag", {"field": "label"}),
        ("high_recall", {"max_distance": 1.5}),
        ("full_rag", {"filter": {"label": {"$gte": 0}}, "field": "label"}),
        ("semantic_dedup", {"max_distance": 1.5}),
    ]:
        cfg = template(name, k=4, **kw)
        assert validate_pipeline(cfg) == [], name
        res = run_pipeline(corpus, cfg, params={"vector": qv})
        rows = res if isinstance(res, list) else res.collect()
        assert 0 < len(rows) <= 4, name

    cfg = template("cached_search", k=3)
    assert pipeline_summary(cfg) == "cached-search (1): cache → search → limit"
    back = pipeline_from_json(pipeline_to_json(cfg))
    assert back["stages"] == cfg["stages"]
    with pytest.raises(PipelineError, match="unknown template"):
        template("frobnicate")


def test_typed_metadata_schema(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    c = db.create_collection(
        "typed", dims=2,
        schema="id string, vector array<float>, category string, rating double",
    )
    c.set_metadata_schema({
        "category": {"type": "string", "required": True},
        "rating": {"type": "float", "required": False},
    })
    ok = spark.createDataFrame(
        [("a", [1.0, 0.0], "books", 4.5)],
        "id string, vector array<float>, category string, rating double",
    )
    assert c.insert(ok, now_ms=1) == 1
    # null in a required field rejected
    bad = spark.createDataFrame(
        [("b", [1.0, 0.0], None, 1.0)],
        "id string, vector array<float>, category string, rating double",
    )
    with pytest.raises(CollectionError, match="required"):
        c.insert(bad)
    # wrong declared type rejected
    with pytest.raises(CollectionError, match="unknown field type"):
        c.set_metadata_schema({"category": {"type": "varchar"}})


def test_product_quantization(spark, embeddings):
    from needle_spark.operators.knn import knn
    from needle_spark.plans.quantization import ProductQuantizer, compression_ratio

    pq = ProductQuantizer.fit(embeddings, m=8, vector_col="embedding")
    assert pq.codebooks.shape == (8, 256, 8)
    enc = pq.encode(embeddings).cache()
    codes = enc.select("pq_codes").first()["pq_codes"]
    assert len(codes) == 8 and all(0 <= c < 256 for c in codes)

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    exact = [r["vec_id"] for r in knn(
        embeddings, qv, k=10, metric="euclidean",
        vector_col="embedding", id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in pq.search(
        enc, qv, k=10, rescore_factor=8, id_col="vec_id").collect()]
    assert approx[0] == exact[0] == 0
    assert len(set(exact) & set(approx)) >= 8
    assert compression_ratio("pq", dim=64, m=8) == 32.0


def test_binary_quantization(spark, embeddings):
    bq = BinaryQuantizer(vector_col="embedding", codes_col="bits")
    enc = bq.encode(embeddings).cache()
    row = enc.select("embedding", "bits").first()
    # spot-check the packing: bit b of word w == (x[w*64+b] > 0)
    word0 = row["bits"][0] & ((1 << 64) - 1)
    for b in range(10):
        assert ((word0 >> b) & 1) == (1 if row["embedding"][b] > 0 else 0)

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    from needle_spark.operators.knn import knn

    exact = [r["vec_id"] for r in knn(
        embeddings, qv, k=10, vector_col="embedding", id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in bq.search(
        enc, qv, k=10, rescore_factor=8, id_col="vec_id").collect()]
    assert approx[0] == exact[0] == 0
    assert len(set(exact) & set(approx)) >= 5  # 1-bit sketch, rescored
