"""Physical-plan regression guards (VERDICT r2 next-round #9).

PLANS.md documents the plan shapes that make the engine scale-safe at
100 TB; these tests pin them in CI so a refactor can't silently
regress them:

- batch kNN: no hash-partition shuffle, no sort-merge join — the query
  side broadcasts / fuses, docs stream through their scan;
- indexed BM25 search: ZERO joins above the cached postings — a query
  is a literal-map lookup over one InMemoryTableScan;
- TTL read path: the expiry filter is a codegen'd scan predicate, not
  a Python UDF;
- lazy graph traversal: every per-hop join broadcasts the frontier,
  never sort-merges the edge table;
- filtered kNN: predicate pushed to the Parquet scan + top-k planned
  as TakeOrderedAndProject (per-partition heaps, no global sort);
- aggregation: map-side partial aggregation before the shuffle;
- embedding near-dup: the verification kernel is a distributed
  FlatMapGroupsInPandas over cells, not a driver-side loop.
"""

import pytest
from pyspark.sql import functions as F

from needle_spark.plans.planner import explain_text

from conftest import load


def plan_of(df) -> str:
    return explain_text(df, mode="formatted")


def test_batch_knn_no_shuffle_no_smj(spark, embeddings):
    from needle_spark.operators.knn import batch_knn

    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector"))
    p = plan_of(batch_knn(embeddings, q, k=5,
                          doc_vector_col="embedding", doc_id_col="vec_id"))
    assert "Exchange hashpartitioning" not in p
    assert "SortMergeJoin" not in p


def test_bm25_index_search_zero_joins_above_cache(spark, sf_dir):
    from needle_spark.operators.hybrid import Bm25Index

    docs = load(spark, "documents", sf_dir).limit(200)
    idx = Bm25Index(docs, id_col="doc_id", text_col="text")
    p = plan_of(idx.search("data pipeline quality", limit=10))
    assert "InMemoryTableScan" in p  # reads the cached postings...
    # ...and nothing joins ABOVE them: the tree below InMemoryRelation
    # is the build-time plan, paid once at index construction — only
    # the operators above the cache run per query
    above_cache = p.split("InMemoryTableScan", 1)[0]
    assert "Join" not in above_cache
    assert "Scan parquet" not in above_cache  # no re-read of the corpus


def test_ttl_filter_is_codegen_not_python(spark, tmp_path):
    from needle_spark.catalog import Database

    db = Database(spark, str(tmp_path / "db"))
    c = db.create_collection(
        "ephemeral", dims=2,
        schema="id string, vector array<float>, category string",
        default_ttl_seconds=100,
    )
    c.insert(spark.createDataFrame(
        [("a", [1.0, 0.0], "x")],
        "id string, vector array<float>, category string"), now_ms=1_000_000)
    p = plan_of(c.df(now=1050))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in p
    assert "expires_at" in p  # the expiry predicate is in the scan plan


def test_graph_traverse_broadcasts_every_hop(spark):
    from needle_spark.operators.graph import traverse

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string")
    p = plan_of(traverse(edges, ["a"], max_hops=4))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_filtered_knn_pushdown_and_topk_heap(spark, embeddings):
    from needle_spark.operators.knn import knn

    p = plan_of(knn(embeddings, [0.1] * 64, k=10,
                    filter={"label": {"$in": [1, 2, 3]}},
                    vector_col="embedding", id_col="vec_id"))
    assert "TakeOrderedAndProject" in p  # no global sort for top-k
    assert "PushedFilters" in p and "In(label" in p.replace(", [", ", [")


def test_groupby_agg_is_map_side_partial(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    p = plan_of(li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")))
    assert "partial_sum" in p or "partial" in p.lower()
    assert p.count("HashAggregate") >= 2  # partial + final


def test_embedding_neardup_is_distributed_kernel(spark, embeddings):
    from needle_spark.operators.dedup import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(
        embeddings.limit(300), threshold=0.15, metric="euclidean",
        vector_col="embedding", id_col="vec_id")
    p = plan_of(pairs)
    assert "FlatMapGroupsInPandas" in p  # per-cell verification kernel
    assert "Scan parquet" in p           # source scan retained (no collect)


def test_snapshot_diff_single_join_no_python(spark, embeddings):
    """VCS diff must stay one join on the id key with every comparison
    a scan expression — no Python, no second pass."""
    from needle_spark.vcs import snapshot_diff

    target = embeddings.filter(F.col("vec_id") % 2 == 0)
    p = plan_of(snapshot_diff(embeddings, target, id_col="vec_id",
                              vector_col="embedding"))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in p
    import re

    joins = re.findall(
        r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", p)
    assert len(joins) == 1  # ONE full-outer join on the id key


def test_lineage_summary_single_aggregation(spark):
    """Per-vector lineage is ONE hash aggregation over the CDC log
    (map-side partial + final), nothing Python, no join."""
    from needle_spark.operators.lineage import lineage_from_cdc

    ev = spark.createDataFrame(
        [(0, 10, "insert", "x", None)],
        "sequence long, timestamp_ms long, event_type string, "
        "vector_id string, metadata string")
    p = plan_of(lineage_from_cdc(ev))
    assert "Join" not in p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in p
    import re

    # partial + final (sort-based: min_by/max_by are TypedImperative),
    # one exchange between them — map-side combine is intact
    aggs = re.findall(r"\(\d+\) (?:Sort|Hash)Aggregate", p)
    assert len(aggs) >= 2
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_schema_adapted_read_map_only(spark, tmp_path):
    """Lazy schema adaptation is pure scan projection: no exchange, no
    Python, on top of the collection's merge-on-read view."""
    from needle_spark.catalog import Database

    db = Database(spark, str(tmp_path / "seplandb"))
    c = db.create_collection(
        "docs", dims=2, schema="id string, vector array<float>, category string")
    c.insert(spark.createDataFrame(
        [("a", [1.0, 0.0], "x")],
        "id string, vector array<float>, category string"), now_ms=1000)
    reg = c.schema_registry()
    reg.apply_change({"kind": "add_field", "name": "q",
                      "dtype": "double", "default": 0.5})
    reg.apply_change({"kind": "change_dimension", "to": 4,
                      "strategy": "zero_pad"})
    base = plan_of(c.df())
    adapted = plan_of(reg.adapted_df())
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in adapted
    # adaptation adds NO exchanges beyond the base read's own plan
    assert adapted.count("Exchange") == base.count("Exchange")


def test_chunk_semantic_map_only(spark, sf_dir):
    """Semantic chunking (operators/rag.py chunk_semantic_expr) is a pure
    scan expression: no exchange, no Python UDF — chunking a 100 TB
    corpus is map-only work."""
    from needle_spark.operators.rag import chunk_semantic_expr

    docs = load(spark, "documents", sf_dir)
    df = docs.select(
        "doc_id",
        F.posexplode(chunk_semantic_expr(F.col("text"), 200, 50))
         .alias("chunk_index", "chunk"))
    p = plan_of(df)
    assert "Exchange" not in p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in p


def test_chunk_semantic_arrow_map_only(spark, sf_dir):
    """The Arrow twin (r12, used by the declared chunk_semantic query)
    stays map-only too: ONE ArrowEvalPython, zero exchanges — chunking
    a 100 TB corpus remains a single scan either way."""
    from needle_spark.operators.rag import chunk_semantic_arrow

    docs = load(spark, "documents", sf_dir)
    df = docs.select(
        "doc_id",
        F.posexplode(chunk_semantic_arrow(F.col("text"), 200, 50))
         .alias("chunk_index", "chunk"))
    p = plan_of(df)
    assert "Exchange" not in p
    # one tree entry "ArrowEvalPython (n)" (the formatted detail section
    # repeats the node name as "(n) ArrowEvalPython")
    assert p.count("ArrowEvalPython (") == 1


def test_multi_query_search_single_rank_exchange(spark, embeddings):
    """Multi-query fusion rides the fused batch-kNN broadcast join: the
    doc side never hash-partitions before ranking; only the per-query
    rank window and the final merge aggregate exchange."""
    from needle_spark.operators.rag import multi_query_search

    docs = embeddings.select(F.col("vec_id").alias("id"),
                             F.col("embedding").alias("vector"))
    qv = [[float(i == j) for j in range(64)] for i in range(3)]
    p = plan_of(multi_query_search(docs, qv, k=5))
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_cf_similarity_no_cartesian(spark, sf_dir):
    """Item-item CF similarity joins on user_id: co-occurring pairs
    only — no CartesianProduct / BroadcastNestedLoopJoin of items."""
    from needle_spark.operators.collab_filter import (
        interaction_matrix,
        item_similarity,
    )

    ev = load(spark, "events", sf_dir).withColumn(
        "item_id", F.get_json_object("props", "$.k").cast("long"))
    p = plan_of(item_similarity(interaction_matrix(ev, item_col="item_id")))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_centroids_ml_no_explode(spark, embeddings):
    """The Summarizer centroid path must aggregate dense vectors —
    no Generate/posexplode of n*d element rows."""
    from needle_spark.operators.vector_agg import group_centroids_ml

    df = embeddings.select("label", F.col("embedding").alias("vector"))
    p = plan_of(group_centroids_ml(df))
    import re

    assert "Generate" not in p  # the explode operator
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1  # one agg exchange


def test_zscore_outliers_single_scan_no_python(spark, embeddings):
    """zscore_outliers = ONE stats aggregation job + ONE map-only flag
    pass: the returned plan is a codegen'd filter over the scan (no
    join, no Python, no exchange beyond the agg already executed)."""
    from needle_spark.operators.anomaly import zscore_outliers

    p = plan_of(zscore_outliers(embeddings, vector_col="embedding",
                                threshold=2.5, id_col="vec_id"))
    assert "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert "Join" not in p
    assert "* Filter" in p  # the flag pass is whole-stage codegen'd


def test_iqr_outliers_single_scan_no_python(spark, embeddings):
    from needle_spark.operators.anomaly import iqr_outliers

    p = plan_of(iqr_outliers(embeddings, vector_col="embedding",
                             multiplier=1.5, id_col="vec_id"))
    assert "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert "Join" not in p


def test_sq8_roundtrip_is_scan_expression(spark, embeddings):
    """encode + dequantize compile to array_transform scan expressions:
    no Python, no shuffle — quantization rides the scan at any scale."""
    from needle_spark.plans.quantization import SQ8

    sq = SQ8.fit(embeddings, vector_col="embedding")
    enc = sq.encode(embeddings).withColumn("deq", sq.dequantize_expr())
    p = plan_of(enc)
    assert "BatchEvalPython" not in p
    assert "Exchange" not in p


def test_insert_dedup_nn_broadcasts_batch_partial_agg(spark, embeddings):
    """Insert-time dedup's batch-vs-existing 1-NN (round 10) must scan
    the collection ONCE with the API-payload batch BROADCAST and
    aggregate the per-row min map-side — a shuffled/sort-merge shape
    here would re-shuffle the corpus per insert batch at 100 TB."""
    from needle_spark.operators.insert_dedup import (SemanticDedupConfig,
                                                     apply_insert_dedup)
    from needle_spark.operators.insert_dedup import _nn_vs_existing

    existing = embeddings.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"))
    import pandas as pd
    import numpy as np

    batch_pdf = pd.DataFrame({
        "__bid": ["b1", "b2"],
        "__bvec": [np.zeros(64, dtype=np.float32),
                   np.ones(64, dtype=np.float32)],
    })
    cfg = SemanticDedupConfig.new(0.5, "reject")
    # capture the physical plan of the nn frame by rebuilding it
    bdf = spark.createDataFrame(batch_pdf,
                                schema="__bid string, __bvec array<float>")
    from needle_spark.functions.distance import distance_expr
    d = distance_expr(cfg.metric, F.col("vector"), F.col("__bvec"))
    nn = (existing.select(F.col("id").alias("__eid"), F.col("vector"))
          .crossJoin(F.broadcast(bdf))
          .select("__bid", F.struct(d.cast("double").alias("d"),
                                    F.col("__eid").alias("eid"))
                  .alias("__s"))
          .groupBy("__bid").agg(F.min("__s").alias("__s")))
    p = plan_of(nn)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    # partial (map-side) min before the exchange
    assert p.count("HashAggregate") >= 2 or "partial_min" in p
    # end-to-end result sanity through the real API
    res = _nn_vs_existing(existing, batch_pdf, cfg, "id", "vector")
    assert set(res) == {"b1", "b2"}
