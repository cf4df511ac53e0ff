"""Search-pipeline DSL: a JSON/dict-defined DAG of search stages.

Reference: /root/reference/src/search/search_pipeline.rs — a
declarative pipeline (embed -> search -> rerank -> filter -> diversify
-> threshold -> limit, plus a cache stage) defined as JSON/YAML and
executed stage by stage; validate (:203), optimize (:231 — pull
filters up to the search; Catalyst does this for real, the API is kept
for parity), to/from JSON (:262), summary (:271), and the built-in
RAG templates (:280-410).

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
    cache=None,
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
        elif st == "threshold":
            # ThresholdStageConfig (:87): drop results farther than
            # max_distance
            out = out.filter(
                F.col("distance") <= float(stage["max_distance"]))
        elif st == "cache":
            # CacheStageConfig (:94): cache-aside around the REST of
            # the pipeline, keyed by the query vector
            if cache is None:
                from needle_spark.operators.semantic_cache import SemanticCache

                cache = SemanticCache(
                    max_entries=int(stage.get("max_entries", 1000)),
                    default_ttl_seconds=int(stage["ttl_secs"])
                    if stage.get("ttl_secs") is not None else None,
                )
            if qv is None:
                raise PipelineError("cache stage requires params['vector']")
            hit = cache.lookup(qv, now=params.get("now"))
            if hit is not None:
                return hit
            rest = {"stages": stages[i + 1:]}
            result = run_pipeline(docs, rest, params=params, id_col=id_col,
                                  vector_col=vector_col, text_col=text_col)
            rows = result if isinstance(result, list) else result.collect()
            cache.store(qv, rows, now=params.get("now"))
            return rows
        elif st == "limit":
            out = out.limit(int(stage["k"]))
        else:
            raise PipelineError(f"unknown stage type: {st!r}")
    return out


# ------------------------------------------------- pipeline management ---

def validate_pipeline(config: dict[str, Any]) -> list[str]:
    """search_pipeline.rs validate (:203): no stages / first stage not
    search / multiple search stages."""
    issues: list[str] = []
    stages = config.get("stages") or []
    if not stages:
        return ["Pipeline has no stages"]
    first = stages[0].get("type")
    if first not in ("search", "text_search", "hybrid", "cache"):
        issues.append("First stage should be 'search'")
    n_search = sum(1 for s in stages if s.get("type") == "search")
    if n_search > 1:
        issues.append("Multiple search stages detected")
    return issues


def optimize_pipeline(config: dict[str, Any]) -> dict[str, Any]:
    """search_pipeline.rs optimize (:231): move filter stages directly
    after the search stage so expensive stages see fewer candidates.
    (When the plan stays lazy, Catalyst performs the real pushdown —
    this keeps the declarative form canonical.)"""
    search, filters, rest = [], [], []
    for s in config.get("stages", []):
        t = s.get("type")
        (search if t in ("search", "text_search", "hybrid", "cache")
         else filters if t == "filter" else rest).append(s)
    out = dict(config)
    out["stages"] = search + filters + rest
    return out


def pipeline_summary(config: dict[str, Any]) -> str:
    """search_pipeline.rs summary (:271)."""
    names = " → ".join(s.get("type", "?") for s in config.get("stages", []))
    return (f"{config.get('name', 'pipeline')} "
            f"({config.get('version', 1)}): {names}")


def pipeline_to_json(config: dict[str, Any]) -> str:
    import json

    return json.dumps(config, indent=2, sort_keys=True)


def pipeline_from_json(data: str) -> dict[str, Any]:
    import json

    cfg = json.loads(data)
    issues = validate_pipeline(cfg)
    if any("no stages" in i for i in issues):
        raise PipelineError(issues[0])
    return cfg


# ----------------------------------------------------------- templates ---

def template(name: str, k: int = 10, **kw) -> dict[str, Any]:
    """Built-in RAG pipeline templates (search_pipeline.rs:280-410),
    same names, oversampling factors, and stage orders."""
    t = {
        "simple_rag": lambda: [
            {"type": "search", "k": k * 3},
            {"type": "limit", "k": k},
        ],
        "filtered_rag": lambda: [
            {"type": "search", "k": k * 5},
            {"type": "filter", "filter": kw["filter"]},
            {"type": "limit", "k": k},
        ],
        "diverse_rag": lambda: [
            {"type": "search", "k": k * 5},
            {"type": "diversify", "k": k, "lambda": kw.get("lambda", 0.5)},
        ],
        "reranked_rag": lambda: [
            {"type": "search", "k": k * 10},
            {"type": "rerank_field", "field": kw.get("field", "score"),
             "k": k, "fetch_k": k * 10},
            {"type": "limit", "k": k},
        ],
        "high_recall": lambda: [
            {"type": "search", "k": k * 10},
            {"type": "threshold", "max_distance": kw["max_distance"]},
            {"type": "limit", "k": k},
        ],
        "cached_search": lambda: [
            {"type": "cache", "ttl_secs": kw.get("ttl_secs", 300),
             "max_entries": kw.get("max_entries", 1000)},
            {"type": "search", "k": k * 3},
            {"type": "limit", "k": k},
        ],
        "full_rag": lambda: [
            {"type": "search", "k": k * 10},
            {"type": "filter", "filter": kw["filter"]},
            {"type": "rerank_field", "field": kw.get("field", "score"),
             "k": k * 3, "fetch_k": k * 10},
            {"type": "diversify", "k": k, "lambda": kw.get("lambda", 0.7)},
        ],
        "semantic_dedup": lambda: [
            {"type": "search", "k": k * 5},
            {"type": "threshold", "max_distance": kw["max_distance"]},
            {"type": "diversify", "k": k, "lambda": kw.get("lambda", 0.3)},
        ],
    }
    if name not in t:
        raise PipelineError(f"unknown template: {name!r}")
    return {"name": name.replace("_", "-"), "version": 1, "stages": t[name]()}
