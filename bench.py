#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workload shapes follow BASELINE.md: single kNN, batch kNN (100 queries),
filtered kNN (~10% selectivity), radius search, group-by analytics,
compound-filter scan, per-group top-k, and bulk insert (parquet write).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from needle_spark import get_spark
    from needle_spark.operators.knn_arrow import batch_knn_arrow

    spark = get_spark(app_name="needle-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up: JVM, parquet footers, file listing — not part of any query's cost
    for t in ("embeddings", "lineitem", "orders", "documents", "events"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    def run(name, thunk, repeats: int = 2):
        # best-of-N: local-mode scheduling noise is comparable to the
        # runtimes of the sub-second queries; min is the stable statistic
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            thunk()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    bench_queries = [
        "knn_cosine", "knn_euclidean", "knn_prefilter", "knn_postfilter",
        "radius_search", "recommend", "agg_lineitem", "having_order",
        "filter_compound", "filtered_count", "group_docs_lang",
        "topk_per_group", "events_by_type",
        "bm25_scores", "hybrid_rrf", "rerank_by_field",
        "dedup_events_exact", "ngram_jaccard_pairs", "minhash_lsh_dedup",
        "simhash_candidates", "embedding_neardup", "text_profile",
        "time_decay_knn", "asof_knn", "maxsim", "sparse_dot",
        "field_stats_orders", "events_hourly_window", "knn_page2",
        "cross_collection", "graph_traverse", "term_overlap_rerank",
        "revenue_per_nation", "distinct_agg", "rollup_agg",
        "idf_overlap_rerank", "chunk_fixed", "cross_agg_best",
    ]
    for name in bench_queries:
        fn = qs[name]
        run(name, lambda fn=fn: fn(spark, SF_DIR).collect())

    # batch kNN at baseline shape: 100 queries x full embeddings table
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    run(
        "batch_knn_100",
        lambda: batch_knn_arrow(
            emb, queries_df, k=10, metric="cosine",
            doc_vector_col="embedding", doc_id_col="vec_id",
        ).collect(),
    )

    # repeated-query BM25 throughput on a built index (10 queries)
    from needle_spark.operators.hybrid import Bm25Index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = Bm25Index(docs, id_col="doc_id", text_col="text")
    idx.search("warmup", limit=1).collect()
    # the 10-query workload runs as ONE explode+join job (search_many);
    # a single ad-hoc query is timed separately
    ten_queries = [
        "fast merge sort", "window batch", "query row data", "hash join",
        "scan filter", "group order", "stream value", "customer line",
        "small table", "spark data merge",
    ]
    run("bm25_indexed_10q", lambda: idx.search_many(ten_queries, limit=10).collect())
    run("bm25_indexed_single", lambda: idx.search("hash join", limit=10).collect())
    idx.unpersist()

    # bulk insert throughput: scan + rewrite lineitem as parquet
    out_dir = tempfile.mkdtemp(prefix="needle_bench_")
    try:
        run(
            "bulk_insert_lineitem",
            lambda: spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/lineitem"),
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    li_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    derived = {
        # baseline workload shapes (BASELINE.md) expressed as throughput
        "batch_knn_qps": round(100.0 / timings["batch_knn_100"], 1),
        "bm25_indexed_qps": round(10.0 / timings["bm25_indexed_10q"], 2),
        "bulk_insert_rows_per_sec": round(li_rows / timings["bulk_insert_lineitem"]),
        "lineitem_agg_rows_per_sec": round(li_rows / timings["agg_lineitem"]),
    }
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "derived": derived,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
