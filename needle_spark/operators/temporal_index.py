"""Temporal vector index: versioned history, point-in-time and
time-range search, decayed scoring, version diffs, time partitions
(reference: /root/reference/src/experimental/temporal.rs —
DecayFunction :39-60, TemporalConfig :62-87, VectorVersion :89-110,
insert/update version capture :153-265, search_with_decay :266-330,
search_at :328-374, search_in_range :374-397, history/diff :397-433,
get_changes_in_range :433-455, calculate_decay :455-487, stats
:498-534, TemporalPartitionManager :667-810).

Spark-first mapping.  The reference maintains a driver HashMap of
per-id version vectors next to the collection; here the history IS a
table — append one row per write with (id, version, timestamp,
vector, metadata, change_type) — and every temporal query is a plain
DataFrame computation over it:

* current / as-of state   = ONE max_by aggregation per id (no replay)
* point-in-time search    = as-of state -> exact kNN (TakeOrdered)
* decayed search          = scan expression + TakeOrdered, no shuffle
* version diff            = two filtered rows -> one zip_with fold
* time partitions         = date_trunc bucketing (write-side
                            `partitionBy` on the same expression gives
                            partition pruning at 100 TB)

The reference's `search_at` materializes a valid-id list on the
driver and re-queries with an IN filter (temporal.rs:344-366) — at
scale that id list is the whole collection, so this engine keeps the
selection distributed: the anti-join/semi-join happens inside the
same plan.

Decay parity note: temporal.rs's Gaussian is exp(-(age/scale)^2)
(:476-479) — a DIFFERENT constant from pipeline.rs's exp(-x^2/2)
implemented in functions/timedecay.py; both are kept, each citing its
source.  Scoring also differs from the search pipeline: here
decayed_score = (1 - distance) * factor, sorted DESC (:301-323),
vs. the pipeline's distance / factor ASC — matching the reference's
two surfaces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.functions.distance import distance_expr

HISTORY_SCHEMA = (
    "id string, version long, timestamp long, vector array<float>, "
    "metadata string, change_type string"
)

GRANULARITIES = ("hour", "day", "week", "month")


# ---------------------------------------------------------------------------
# Decay (temporal.rs:455-487)


def decay_factor(kind: str, age: F.Column, **params) -> F.Column:
    k = kind.lower()
    age_d = age.cast("double")
    if k == "none":
        return F.lit(1.0)
    if k == "linear":
        ma = float(params["max_age_seconds"])
        return F.when(age_d >= ma, F.lit(0.0)) \
            .otherwise(F.lit(1.0) - age_d / F.lit(ma))
    if k == "exponential":
        hl = float(params["half_life_seconds"])
        return F.exp(-(F.log(F.lit(2.0)) / F.lit(hl)) * age_d)
    if k == "gaussian":
        sc = float(params["scale_seconds"])
        x = age_d / F.lit(sc)
        return F.exp(-(x * x))
    if k == "step":
        w = float(params["window_seconds"])
        return F.when(age_d <= w, F.lit(1.0)).otherwise(F.lit(0.0))
    raise ValueError(f"unknown temporal decay {kind!r}")


def duckdb_decay_sql(kind: str, age: str, **params) -> str:
    """DuckDB twin of `decay_factor` (same op order/constants)."""
    k = kind.lower()
    a = f"CAST({age} AS DOUBLE)"
    if k == "none":
        return "1.0"
    if k == "linear":
        ma = float(params["max_age_seconds"])
        return f"CASE WHEN {a} >= {ma!r} THEN 0.0 ELSE 1.0 - {a} / {ma!r} END"
    if k == "exponential":
        hl = float(params["half_life_seconds"])
        return f"exp(-(ln(2.0) / {hl!r}) * {a})"
    if k == "gaussian":
        sc = float(params["scale_seconds"])
        x = f"({a} / {sc!r})"
        return f"exp(-({x} * {x}))"
    if k == "step":
        w = float(params["window_seconds"])
        return f"CASE WHEN {a} <= {w!r} THEN 1.0 ELSE 0.0 END"
    raise ValueError(f"unknown temporal decay {kind!r}")


# ---------------------------------------------------------------------------
# State reconstruction


def state_at(history: DataFrame, as_of: int | None = None) -> DataFrame:
    """Collection state at a timestamp (current state when None): per
    id the highest version with timestamp <= as_of, dropped when that
    version is a delete (temporal.rs:344-366, without the driver-side
    id list).  ONE map-side-combined aggregation."""
    h = history
    if as_of is not None:
        h = h.filter(F.col("timestamp") <= F.lit(int(as_of)))
    cur = h.groupBy("id").agg(
        F.max_by(
            F.struct("version", "timestamp", "vector", "metadata",
                     "change_type"),
            F.col("version")).alias("w"))
    return (cur.filter(F.col("w.change_type") != "delete")
            .select("id", F.col("w.version").alias("version"),
                    F.col("w.timestamp").alias("timestamp"),
                    F.col("w.vector").alias("vector"),
                    F.col("w.metadata").alias("metadata")))


# ---------------------------------------------------------------------------
# Searches


def search_at(history: DataFrame, query_vector, k: int, as_of: int,
              metric: str = "cosine") -> DataFrame:
    """Point-in-time kNN (temporal.rs:328-374): exact top-k over the
    reconstructed as-of state — aggregation then TakeOrdered."""
    st = state_at(history, as_of)
    qv = [float(x) for x in query_vector]
    return (st.withColumn(
        "distance", distance_expr(metric, F.col("vector"), qv))
        .orderBy(F.col("distance").asc(), F.col("id").asc())
        .limit(k))


def search_with_decay(state: DataFrame, query_vector, k: int, now: int,
                      decay: str = "none", metric: str = "cosine",
                      candidates_factor: int = 3,
                      timestamp_col: str = "timestamp",
                      id_col: str = "id", vector_col: str = "vector",
                      **decay_params) -> DataFrame:
    """Decay-reweighted search (temporal.rs:266-330): fetch k*3
    candidates by raw similarity, then decayed_score =
    (1 - distance) * decay_factor(age), sort DESC, truncate to k.
    Both cuts are TakeOrdered reductions — no shuffle."""
    qv = [float(x) for x in query_vector]
    cand = (
        state.withColumn(
            "distance", distance_expr(metric, F.col(vector_col), qv))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k * max(candidates_factor, 1)))
    age = F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(now)) - F.col(timestamp_col).cast("long"))
    factor = decay_factor(decay, age, **decay_params)
    return (
        cand.withColumn("age_seconds", age)
        .withColumn("original_score", F.lit(1.0) - F.col("distance"))
        .withColumn("decay_factor", factor)
        .withColumn("decayed_score",
                    F.col("original_score") * F.col("decay_factor"))
        .orderBy(F.col("decayed_score").desc(), F.col(id_col).asc())
        .limit(k))


def search_in_range(state: DataFrame, query_vector, k: int,
                    start_ts: int, end_ts: int, now: int,
                    decay: str = "none", metric: str = "cosine",
                    timestamp_col: str = "timestamp",
                    **decay_params) -> DataFrame:
    """Range-restricted decay search (temporal.rs:374-397): the
    timestamp BETWEEN filter sits under the scan (partition-prunable
    when the history is written partitioned by time bucket)."""
    ranged = state.filter(
        (F.col(timestamp_col) >= F.lit(int(start_ts)))
        & (F.col(timestamp_col) <= F.lit(int(end_ts))))
    return search_with_decay(ranged, query_vector, k, now, decay=decay,
                             metric=metric, timestamp_col=timestamp_col,
                             **decay_params)


# ---------------------------------------------------------------------------
# History / diff (temporal.rs:397-455)


def get_history(history: DataFrame, id: str) -> DataFrame:
    return history.filter(F.col("id") == id).orderBy("version")


def get_at_version(history: DataFrame, id: str, version: int) -> DataFrame:
    return history.filter(
        (F.col("id") == id) & (F.col("version") == int(version)))


def diff_versions(history: DataFrame, id: str, v1: int, v2: int) -> DataFrame:
    """VersionDiff (temporal.rs:412-433): cosine similarity between
    the two version vectors (one zip_with/aggregate fold), whether
    metadata changed, and the time delta."""
    a = get_at_version(history, id, v1).select(
        F.col("id"), F.col("vector").alias("__v1"),
        F.col("metadata").alias("__m1"), F.col("timestamp").alias("__t1"))
    b = get_at_version(history, id, v2).select(
        F.col("id"), F.col("vector").alias("__v2"),
        F.col("metadata").alias("__m2"), F.col("timestamp").alias("__t2"))
    sim = F.lit(1.0) - distance_expr("cosine", F.col("__v1"), F.col("__v2"))
    return a.join(b, "id").select(
        "id",
        F.lit(int(v1)).alias("from_version"),
        F.lit(int(v2)).alias("to_version"),
        sim.alias("vector_similarity"),
        (~(F.col("__m1").eqNullSafe(F.col("__m2")))).alias("metadata_changed"),
        F.greatest(F.lit(0).cast("long"), F.col("__t2") - F.col("__t1"))
        .alias("time_diff_seconds"))


def changes_in_range(history: DataFrame, start_ts: int,
                     end_ts: int) -> DataFrame:
    """Versions written in [start, end], time-ordered
    (temporal.rs:433-455) — a pushdown-able range scan."""
    return (history.filter(
        (F.col("timestamp") >= F.lit(int(start_ts)))
        & (F.col("timestamp") <= F.lit(int(end_ts))))
        .orderBy("timestamp", "id", "version"))


def prune_history(history: DataFrame, max_versions: int) -> DataFrame:
    """Keep only each id's newest `max_versions` rows
    (temporal.rs:190-196 ring-buffer prune) — one window rank."""
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(F.col("version").desc())
    return (history.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= int(max_versions)).drop("__rk"))


def temporal_stats(history: DataFrame) -> DataFrame:
    """TemporalStats (temporal.rs:498-534) as one aggregation."""
    per_id = history.groupBy("id").agg(F.count(F.lit(1)).alias("nv"))
    return history.agg(
        F.countDistinct("id").alias("total_vectors"),
        F.count(F.lit(1)).alias("total_versions"),
        F.min("timestamp").alias("oldest_timestamp"),
        F.max("timestamp").alias("newest_timestamp"),
    ).crossJoin(per_id.agg(
        F.avg("nv").alias("avg_versions_per_vector")))


# ---------------------------------------------------------------------------
# Time partitions (TemporalPartitionManager, temporal.rs:667-810)


def time_bucket(timestamp_col, granularity: str) -> F.Column:
    """Partition key for a given granularity — use the SAME expression
    in `DataFrameWriter.partitionBy` so range filters prune files."""
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}")
    c = F.col(timestamp_col) if isinstance(timestamp_col, str) else timestamp_col
    ts = F.timestamp_seconds(c.cast("long"))
    return F.date_trunc(granularity, ts)


def partition_counts(df: DataFrame, granularity: str,
                     timestamp_col: str = "timestamp") -> DataFrame:
    """Rows per time partition (partition_count :776-782) — one
    aggregation on the bucket expression."""
    return (df.groupBy(time_bucket(timestamp_col, granularity)
                       .alias("partition_start"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("partition_start"))


def expire_before(df: DataFrame, cutoff_ts: int,
                  timestamp_col: str = "timestamp") -> DataFrame:
    """Drop whole partitions older than the cutoff (expire_before
    :782-799).  As a filter this is partition-pruned at the scan when
    the table is written partitioned by `time_bucket`."""
    return df.filter(F.col(timestamp_col) >= F.lit(int(cutoff_ts)))


def apply_ttl(df: DataFrame, ttl_seconds: int, now: int,
              timestamp_col: str = "timestamp") -> DataFrame:
    """TTL sweep (apply_ttl :799-810) = expire_before(now - ttl)."""
    return expire_before(df, int(now) - int(ttl_seconds), timestamp_col)
