"""Cross-collection / federated search.

Reference: /root/reference/src/search/cross_collection.rs — the same
query over many collections, merged with per-collection score
normalization (:748 min-max / z-score / softmax), aggregation strategies
(:56), routing rules (:996-1015); federated variant :765-798.

Spark shape: per-collection kNN (each a TakeOrderedAndProject over its
own scan) -> unionByName with a `collection` tag -> window-normalize per
collection -> global top-k.  Collections scan in parallel; the union is
k rows per collection, so the merge costs nothing at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from needle_spark.operators.knn import knn


def cross_collection_knn(
    collections: dict[str, DataFrame],
    query_vector: Sequence[float],
    k: int = 10,
    per_collection_k: int | None = None,
    metric: str = "cosine",
    normalization: str | None = "min_max",
    vector_col: str = "vector",
    id_col: str = "id",
    filter=None,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k across collections: (collection, id, distance, norm_score).

    Scoring: similarity = 1/(1+distance) normalized per collection so
    collections with different embedding scales are comparable
    (cross_collection.rs:748), optionally weighted per collection
    (routing rules :996-1015), then global top-k by score.
    """
    if not collections:
        raise ValueError("no collections given")
    per_k = per_collection_k or k
    parts = []
    for name, df in sorted(collections.items()):
        r = knn(
            df, query_vector, k=per_k, metric=metric, filter=filter,
            vector_col=vector_col, id_col=id_col,
        ).select(
            F.lit(name).alias("collection"),
            F.col(id_col).cast("string").alias(id_col),
            F.col("distance"),
        )
        parts.append(r)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    sim = F.lit(1.0) / (F.lit(1.0) + F.col("distance"))
    u = u.withColumn("score", sim)
    if normalization:
        w = Window.partitionBy("collection")
        s = F.col("score")
        if normalization == "min_max":
            lo, hi = F.min(s).over(w), F.max(s).over(w)
            u = u.withColumn(
                "score", F.when(hi == lo, F.lit(1.0)).otherwise((s - lo) / (hi - lo))
            )
        elif normalization == "z_score":
            mu, sd = F.avg(s).over(w), F.stddev_pop(s).over(w)
            u = u.withColumn(
                "score", F.when(sd == 0.0, F.lit(0.0)).otherwise((s - mu) / sd)
            )
        elif normalization == "softmax":
            mx = F.max(s).over(w)
            e = F.exp(s - mx)
            u = u.withColumn("score", e / F.sum(e).over(w))
        else:
            raise ValueError(f"unknown normalization: {normalization!r}")
    if weights:
        wexpr = F.lit(1.0)
        for name, wt in weights.items():
            wexpr = F.when(F.col("collection") == name, F.lit(float(wt))).otherwise(wexpr)
        u = u.withColumn("score", F.col("score") * wexpr)
    return u.orderBy(
        F.col("score").desc(), F.col("collection").asc(), F.col(id_col).asc()
    ).limit(k)


# ------------------------------------------------ collection routing ---

def select_collections(
    collections: dict[str, DataFrame],
    mode: str = "all",
    names: Sequence[str] | None = None,
    prefix: str | None = None,
    suffix: str | None = None,
    query_dims: int | None = None,
    dims: dict[str, int] | None = None,
    vector_col: str = "vector",
) -> dict[str, DataFrame]:
    """CollectionFilter (cross_collection.rs:105-120): All / Include /
    Exclude / Prefix / Suffix / MatchingDimensions.  For dimension
    matching pass `dims` (name->dims) or let it probe one row per
    collection (a bounded driver lookup, like the reference's
    coll.dimensions())."""
    m = mode.lower()
    if m == "all":
        return dict(collections)
    if m == "include":
        want = set(names or ())
        return {n: d for n, d in collections.items() if n in want}
    if m == "exclude":
        skip = set(names or ())
        return {n: d for n, d in collections.items() if n not in skip}
    if m == "prefix":
        return {n: d for n, d in collections.items() if n.startswith(prefix or "")}
    if m == "suffix":
        return {n: d for n, d in collections.items() if n.endswith(suffix or "")}
    if m == "matching_dimensions":
        if query_dims is None:
            raise ValueError("matching_dimensions needs query_dims")
        out = {}
        for n, d in collections.items():
            nd = (dims or {}).get(n)
            if nd is None:
                row = d.select(F.size(vector_col).alias("s")).first()
                nd = row["s"] if row else None
            if nd == query_dims:
                out[n] = d
        return out
    raise ValueError(f"unknown collection filter mode: {mode!r}")


class CollectionRoutingRule:
    """Routing rule (cross_collection.rs:996-1008): route to
    `collection` when the condition holds; optional weight override."""

    def __init__(self, collection: str, condition: str = "always",
                 dimension: int | None = None,
                 weight_override: float | None = None):
        if condition not in ("always", "dimension_match"):
            raise ValueError(f"unknown routing condition: {condition!r}")
        if condition == "dimension_match" and dimension is None:
            raise ValueError("dimension_match needs a dimension")
        self.collection = collection
        self.condition = condition
        self.dimension = dimension
        self.weight_override = weight_override


def evaluate_routing_rules(
    rules: Sequence[CollectionRoutingRule], query_dimensions: int
) -> list[CollectionRoutingRule]:
    """cross_collection.rs evaluate_routing_rules (:1016-1027)."""
    return [
        r for r in rules
        if r.condition == "always"
        or (r.condition == "dimension_match" and r.dimension == query_dimensions)
    ]


def routed_cross_collection_knn(
    collections: dict[str, DataFrame],
    rules: Sequence[CollectionRoutingRule],
    query_vector: Sequence[float],
    weights: dict[str, float] | None = None,
    **kwargs,
) -> DataFrame:
    """Apply routing rules (with weight overrides) then search the
    routed subset."""
    chosen = evaluate_routing_rules(rules, len(query_vector))
    routed = {r.collection: collections[r.collection]
              for r in chosen if r.collection in collections}
    if not routed:
        raise ValueError("routing rules matched no collections")
    w = dict(weights or {})
    for r in chosen:
        if r.weight_override is not None:
            w[r.collection] = r.weight_override
    return cross_collection_knn(routed, query_vector, weights=w or None, **kwargs)


# --------------------------------------------------- aggregation/stats ---

def aggregate_cross_scores(
    results: DataFrame,
    aggregation: str = "min_score",
    id_col: str = "id",
    sizes: dict[str, int] | None = None,
    rrf_k: float = 60.0,
) -> DataFrame:
    """ScoreAggregation (cross_collection.rs:56-68) for ids that appear
    in SEVERAL collections: min_score (best match wins), max_score,
    average, weighted_average (by collection size), rrf.  Input is the
    tagged union produced by cross_collection_knn (collection, id,
    distance, score); output one row per id with the aggregate score
    and the contributing collections."""
    agg = aggregation.lower()
    base = results
    if agg == "weighted_average":
        if not sizes:
            raise ValueError("weighted_average needs collection sizes")
        smap = F.create_map(*[
            F.lit(x) for kv in sorted(sizes.items()) for x in (kv[0], float(kv[1]))
        ])
        base = base.withColumn("__w", F.element_at(smap, F.col("collection")))
    if agg == "rrf":
        w = Window.partitionBy("collection").orderBy(
            F.col("distance").asc(), F.col(id_col).asc())
        base = base.withColumn(
            "__rrf", F.lit(1.0) / (F.lit(rrf_k) + F.row_number().over(w)))
    exprs = {
        "min_score": F.min("distance").alias("distance"),
        "max_score": F.max("distance").alias("distance"),
        "average": F.avg("score").alias("score"),
        "weighted_average": (F.sum(F.col("score") * F.col("__w"))
                             / F.sum("__w")).alias("score"),
        "rrf": F.sum("__rrf").alias("score"),
    }
    if agg not in exprs:
        raise ValueError(f"unknown aggregation: {aggregation!r}")
    out = base.groupBy(F.col(id_col)).agg(
        exprs[agg],
        F.sort_array(F.collect_set("collection")).alias("collections"),
        F.count(F.lit(1)).cast("long").alias("matches"),
    )
    if agg in ("min_score", "max_score"):
        return out.orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc())


class CrossCollectionQueryBuilder:
    """Fluent query API (cross_collection.rs:587-699): collection
    filters, metadata filter, aggregation, min_score, normalization;
    execute() returns (DataFrame, stats dict with per-collection
    latencies — federated_search_with_latency :1032-1100)."""

    def __init__(self, collections: dict[str, DataFrame], query_vector):
        self._all = collections
        self._q = [float(x) for x in query_vector]
        self._k = 10
        self._filter_mode = ("all", {})
        self._meta_filter = None
        self._aggregation = None
        self._min_score = None
        self._normalization: str | None = "min_max"
        self._kwargs: dict = {}

    def k(self, k: int):
        self._k = k
        return self

    def include_collections(self, names):
        self._filter_mode = ("include", {"names": list(names)})
        return self

    def exclude_collections(self, names):
        self._filter_mode = ("exclude", {"names": list(names)})
        return self

    def prefix(self, p: str):
        self._filter_mode = ("prefix", {"prefix": p})
        return self

    def suffix(self, s: str):
        self._filter_mode = ("suffix", {"suffix": s})
        return self

    def matching_dimensions(self):
        self._filter_mode = ("matching_dimensions", {})
        return self

    def metadata_filter(self, flt: dict):
        self._meta_filter = flt
        return self

    def aggregation(self, agg: str):
        self._aggregation = agg
        return self

    def min_score(self, s: float):
        self._min_score = float(s)
        return self

    def normalize_scores(self, normalize: bool = True):
        self._normalization = "min_max" if normalize else None
        return self

    def options(self, **kwargs):
        self._kwargs.update(kwargs)
        return self

    def execute(self):
        import time as _time

        mode, opts = self._filter_mode
        chosen = select_collections(
            self._all, mode=mode, query_dims=len(self._q),
            vector_col=self._kwargs.get("vector_col", "vector"), **opts)
        if not chosen:
            raise ValueError("collection filter matched nothing")
        latencies: dict[str, int] = {}
        t_all = _time.perf_counter()
        for name, df in sorted(chosen.items()):
            t0 = _time.perf_counter()
            df.limit(1).count()  # per-collection probe (latency signal)
            latencies[name] = int((_time.perf_counter() - t0) * 1e6)
        out = cross_collection_knn(
            chosen, self._q, k=self._k, normalization=self._normalization,
            filter=self._meta_filter, **self._kwargs)
        if self._min_score is not None:
            out = out.filter(F.col("score") >= self._min_score)
        if self._aggregation:
            out = aggregate_cross_scores(
                out, self._aggregation,
                id_col=self._kwargs.get("id_col", "id"),
                sizes={n: d.count() for n, d in chosen.items()}
                if self._aggregation == "weighted_average" else None)
        stats = {
            "collections_searched": len(chosen),
            "latencies_us": latencies,
            "total_time_us": int((_time.perf_counter() - t_all) * 1e6),
        }
        return out, stats
