"""Locality-aware compaction: co-access tracking, clustered layout
planning, fragmentation-triggered scheduling (reference:
/root/reference/src/experimental/locality_compaction.rs —
CompactionConfig :27-57, CoAccessTracker :60-165, record_access
:80-101, top_pairs :113-124, fragmentation_ratio :140-153,
MiniBatchKMeans :222-330, LocalityCompactor::plan_compaction
:357-420, should_compact :434-437).

Spark-first mapping.  The reference mutates a driver HashMap on every
search and reorganizes pages in-place; in a Spark engine both halves
become data-parallel:

* **Co-access tracking is a QUERY over an access log** — one row per
  search carrying the ids returned together (`result_ids`).  The
  caller supplies the log (serve-path sinks can append one from each
  query's result set; `access_log_row()` builds a row); tracking is
  then one explode of within-result pairs + one map-side combined
  count.  No mutable tracker, no eviction heuristics: the log is the
  tracker, and `min_co_access_count` is a HAVING filter.

* **The compaction itself is a WRITE LAYOUT.**  On Spark, "maximize
  cache locality" means: co-accessed rows land in the same Parquet
  file/row-group so a top-k search touches few files.
  `plan_compaction` derives cluster assignments (distributed k-means
  via plans/clustering.py — Lloyd's on executors, the same objective
  as the reference's MiniBatchKMeans); `compacted_layout` then
  repartitions by cluster id and sorts within partitions — the COW
  page swap (:330-356) is Parquet's immutable-segment rewrite, which
  the catalog's `compact()` already performs atomically.

At 100 TB: pair counting shuffles only (a, b) id pairs (k^2/2 per
query, k ~ 10); the k-means fit samples/aggregates via Spark ML; the
rewrite is one repartition — all linear, nothing driver-bound.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CompactionConfig:
    """locality_compaction.rs:27-57 (page_size dropped — Parquet
    row-group sizing is `spark.sql.files.maxPartitionBytes` /
    `parquet.block.size` territory, not per-operator)."""

    num_clusters: int = 0          # 0 = auto sqrt(n/2)
    max_iterations: int = 100
    min_co_access_count: int = 5
    fragmentation_threshold: float = 0.3
    seed: int = 42


# ---------------------------------------------------------------------------
# Co-access tracking (CoAccessTracker :60-165)


def access_log_row(query_id, result_ids: list) -> tuple:
    """One access-log row for co_access_pairs: append these from the
    serve path (schema: query_id string, result_ids array<string>)."""
    return (str(query_id), [str(i) for i in result_ids])


def co_access_pairs(access_log: DataFrame,
                    result_ids_col: str = "result_ids",
                    min_count: int = 0) -> DataFrame:
    """Pair-count aggregation over an access log of searches, where
    each row carries the ids returned together (record_access
    :80-101).  Pairs are canonicalized a < b; output (id_a, id_b,
    n_co).  `min_count` maps the reference's min_co_access_count
    filter.  The explode emits |result|^2/2 rows per query — bounded
    by k — then ONE hash aggregation."""
    ids = F.array_distinct(F.col(result_ids_col))
    pair_arrays = F.transform(
        ids,
        lambda a: F.transform(
            F.filter(ids, lambda b: a < b),
            lambda b: F.struct(a.alias("id_a"), b.alias("id_b"))))
    pairs = access_log.select(
        F.explode(F.flatten(pair_arrays)).alias("p"))
    out = (pairs.groupBy(F.col("p.id_a").alias("id_a"),
                         F.col("p.id_b").alias("id_b"))
           .agg(F.count(F.lit(1)).alias("n_co")))
    if min_count > 0:
        out = out.filter(F.col("n_co") >= min_count)
    return out


def top_pairs(pairs: DataFrame, limit: int = 10) -> DataFrame:
    """Most co-accessed pairs (:113-124) — a TakeOrdered cut."""
    return pairs.orderBy(F.col("n_co").desc(), "id_a", "id_b").limit(limit)


def tracked_vectors(pairs: DataFrame) -> DataFrame:
    """Distinct ids with co-access data (:125-135)."""
    return (pairs.select(F.col("id_a").alias("id"))
            .unionByName(pairs.select(F.col("id_b").alias("id")))
            .distinct())


def fragmentation_ratio(pairs: DataFrame) -> float:
    """1 - sum(count) / (n_pairs * max(count)) (:140-153): 0 when
    every pair is hit equally (perfect locality once clustered), -> 1
    when a few hot pairs dominate.  ONE aggregation."""
    row = pairs.agg(
        F.sum("n_co").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.max("n_co").alias("mx")).collect()[0]
    if not row["n"]:
        return 0.0
    max_possible = row["n"] * (row["mx"] or 1)
    if max_possible == 0:
        return 0.0
    return 1.0 - (row["total"] / max_possible)


# ---------------------------------------------------------------------------
# Compaction planning (LocalityCompactor :330-437)


@dataclass
class CompactionPlan:
    assignments: DataFrame          # (vector_id, cluster_id)
    num_clusters: int
    estimated_improvement: float
    vectors_to_relocate: int
    recommended: bool


def auto_num_clusters(n: int) -> int:
    """sqrt(n/2) heuristic, clamped to [2, n] (:368-374)."""
    return max(2, min(n, int(math.sqrt(n / 2.0))))


def plan_compaction(vectors: DataFrame, pairs: DataFrame,
                    config: CompactionConfig | None = None,
                    id_col: str = "id",
                    vector_col: str = "vector") -> CompactionPlan:
    """Cluster assignments for a locality-ordered rewrite (:357-420).
    K-means runs distributed (Spark ML k-means|| — same objective as
    the reference's MiniBatchKMeans, executor-parallel instead of
    driver mini-batches); fragmentation gates the recommendation."""
    from needle_spark.plans.clustering import ClusteringConfig, KMeansModel

    cfg = config or CompactionConfig()
    n = vectors.count()
    if n == 0:
        empty = vectors.sparkSession.createDataFrame(
            [], "vector_id string, cluster_id int")
        return CompactionPlan(empty, 0, 0.0, 0, False)
    k = cfg.num_clusters if cfg.num_clusters > 0 else auto_num_clusters(n)
    k = min(k, n)
    model = KMeansModel.fit(
        vectors, k, vector_col=vector_col,
        config=ClusteringConfig(max_iterations=cfg.max_iterations,
                                seed=cfg.seed))
    assignments = model.predict(vectors).select(
        F.col(id_col).cast("string").alias("vector_id"),
        F.col("cluster").cast("int").alias("cluster_id"))
    frag = fragmentation_ratio(pairs)
    return CompactionPlan(
        assignments=assignments,
        num_clusters=k,
        estimated_improvement=frag * 0.7,     # :404 conservative estimate
        vectors_to_relocate=n,
        recommended=frag > cfg.fragmentation_threshold)


def should_compact(pairs: DataFrame,
                   config: CompactionConfig | None = None) -> bool:
    """Trigger check (:434-437)."""
    cfg = config or CompactionConfig()
    return fragmentation_ratio(pairs) > cfg.fragmentation_threshold


def compacted_layout(df: DataFrame, assignments: DataFrame,
                     id_col: str = "id") -> DataFrame:
    """The physical reorganization (:330-356's COW page swap, as a
    Spark write layout): join assignments, hash-partition by cluster,
    sort within partitions — co-accessed (= co-clustered) rows become
    contiguous in the output files.  Write with
    `.write.parquet(...)` (or hand to `Collection.compact()`); row-
    group min/max stats on cluster_id then prune unrelated files for
    cluster-local reads."""
    a = assignments.withColumnRenamed("vector_id", "__cl_id")
    joined = df.join(
        a, df[id_col].cast("string") == a["__cl_id"], "left"
    ).drop("__cl_id").fillna({"cluster_id": -1})
    return (joined.repartition("cluster_id")
            .sortWithinPartitions("cluster_id", id_col))
