"""Search-pipeline DSL: a JSON/dict-defined DAG of search stages.

Reference: /root/reference/src/search/search_pipeline.rs:1-28 — a
declarative pipeline (embed -> search -> rerank -> filter -> diversify
-> limit) defined as JSON/YAML and executed stage by stage.

Each stage maps onto an engine operator; the pipeline composes lazily
(one DataFrame plan) except the stages that are sequential by nature
(MMR).  Example:

    run_pipeline(docs, {
        "stages": [
            {"type": "search", "k": 50, "metric": "cosine"},
            {"type": "filter", "filter": {"label": {"$gte": 2}}},
            {"type": "rerank_field", "field": "label", "k": 20},
            {"type": "diversify", "k": 10, "lambda": 0.5},
            {"type": "limit", "k": 5},
        ]
    }, params={"vector": [...]})
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.filters import compile_filter


class PipelineError(ValueError):
    pass


def run_pipeline(
    docs: DataFrame,
    config: dict[str, Any],
    params: dict[str, Any] | None = None,
    id_col: str = "id",
    vector_col: str = "vector",
    text_col: str = "text",
):
    """Execute a declarative search pipeline.  Returns a DataFrame, or a
    list of Rows if the last effective stage is sequential (diversify)."""
    from needle_spark.operators.hybrid import bm25_topk, rerank_by_field, rrf_fuse
    from needle_spark.operators.knn import knn
    from needle_spark.operators.rerank import mmr_diversify, term_overlap_scores

    params = params or {}
    stages = config.get("stages")
    if not stages:
        raise PipelineError("pipeline has no stages")

    out: Any = docs
    qv = params.get("vector")
    for i, stage in enumerate(stages):
        st = stage.get("type")
        if isinstance(out, list):
            raise PipelineError(f"stage {i} ({st}) after a terminal diversify stage")
        if st == "search":
            if qv is None:
                raise PipelineError("search stage requires params['vector']")
            out = knn(
                out, qv, k=int(stage.get("k", 10)),
                metric=stage.get("metric", "cosine"),
                filter=stage.get("filter"),
                vector_col=vector_col, id_col=id_col,
            )
        elif st == "text_search":
            out = bm25_topk(
                out, stage.get("query") or params.get("text", ""),
                limit=int(stage.get("k", 10)), id_col=id_col, text_col=text_col,
            )
        elif st == "hybrid":
            if qv is None:
                raise PipelineError("hybrid stage requires params['vector']")
            fetch = int(stage.get("fetch_n", 50))
            vec = knn(out, qv, k=fetch, metric=stage.get("metric", "cosine"),
                      vector_col=vector_col, id_col=id_col).select(id_col, "distance")
            bm = bm25_topk(out, stage.get("query") or params.get("text", ""),
                           limit=fetch, id_col=id_col, text_col=text_col)
            out = rrf_fuse(vec, bm, id_col=id_col, limit=int(stage.get("k", 10)),
                           vector_weight=float(stage.get("vector_weight", 0.5)),
                           bm25_weight=float(stage.get("bm25_weight", 0.5)))
        elif st == "filter":
            out = out.filter(compile_filter(stage["filter"], df=out))
        elif st == "rerank_field":
            out = rerank_by_field(
                out, stage["field"], k=int(stage.get("k", 10)),
                fetch_k=int(stage.get("fetch_k", stage.get("k", 10))),
                descending=bool(stage.get("descending", True)), id_col=id_col,
            )
        elif st == "rerank_overlap":
            out = term_overlap_scores(
                out, stage.get("query") or params.get("text", ""), text_col=text_col
            ).orderBy(F.col("rerank_score").desc(), F.col(id_col).asc())
        elif st == "diversify":
            if qv is None:
                raise PipelineError("diversify stage requires params['vector']")
            out = mmr_diversify(
                out, qv, k=int(stage.get("k", 10)),
                lambda_mult=float(stage.get("lambda", 0.5)),
                vector_col=vector_col, id_col=id_col,
            )
        elif st == "limit":
            out = out.limit(int(stage["k"]))
        else:
            raise PipelineError(f"unknown stage type: {st!r}")
    return out
