"""Vector lineage & audit queries derived from the CDC log (reference:
/root/reference/src/observe/lineage.rs — VectorLineage :170-224,
LineageTracker :226-330, transformation chains :317-349, stats :587-610;
/root/reference/src/observe/audit.rs — AuditLog :265-530, AuditStats
:275-290, ComplianceReport :543-560, forget/GDPR trail :380-409).

Spark-first mapping: the reference keeps lineage in an in-memory
HashMap updated on every mutation; this engine already WRITES the raw
material — the collection's append-only `_cdc` Parquet log — so
lineage is a QUERY, not a second bookkeeping store: one groupBy over
the log builds every vector's insert→update→delete chain summary, a
per-id filter yields the full transformation chain, and the audit
report is a time-bucketed aggregation.  At 100 TB the log is an
ordinary partitioned table: one hash aggregation on vector_id, all
map-side combined; nothing collects to the driver.

Per-id mutation events are insert/upsert/update/delete; collection-
level markers (clear '*', restore '<version>', import '*') are
excluded from per-vector lineage and surfaced by the audit report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MUTATION_EVENTS = ("insert", "upsert", "update", "delete")


def lineage_from_cdc(events: DataFrame, id_col: str = "vector_id") -> DataFrame:
    """Per-vector lineage summary from a CDC event log
    (lineage.rs:170-224 VectorLineage + :587 LineageStats, as one
    distributed aggregation).

    Input schema: (sequence, timestamp_ms, event_type, vector_id, ...).
    Output per id: creation (first_*), latest state (last_*), per-op
    counts, and is_live (a trailing delete means the vector is gone —
    the audit trail the reference's forget() keeps, audit.rs:380-409).
    """
    ev = events.filter(F.col("event_type").isin(*MUTATION_EVENTS))
    n_of = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long").alias(f"n_{t}s")
        for t in ("insert", "upsert", "update", "delete")
    ]
    return ev.groupBy(F.col(id_col).alias("vector_id")).agg(
        F.min_by("event_type", "sequence").alias("first_op"),
        F.min("sequence").alias("first_seq"),
        F.min("timestamp_ms").alias("first_ts"),
        F.max_by("event_type", "sequence").alias("last_op"),
        F.max("sequence").alias("last_seq"),
        F.max("timestamp_ms").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        *n_of,
    ).withColumn("is_live", F.col("last_op") != F.lit("delete"))


def duckdb_lineage_sql(events_sql: str, id_col: str = "vector_id") -> str:
    """DuckDB twin of lineage_from_cdc over an events relation
    (subquery or CTE name) with the CDC schema."""
    types = ", ".join(f"'{t}'" for t in MUTATION_EVENTS)
    n_of = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{t}s"
        for t in ("insert", "upsert", "update", "delete")
    )
    return f"""
SELECT {id_col} AS vector_id,
       arg_min(event_type, sequence) AS first_op,
       min(sequence) AS first_seq,
       min(timestamp_ms) AS first_ts,
       arg_max(event_type, sequence) AS last_op,
       max(sequence) AS last_seq,
       max(timestamp_ms) AS last_ts,
       count(*) AS n_events,
       {n_of},
       arg_max(event_type, sequence) <> 'delete' AS is_live
FROM {events_sql}
WHERE event_type IN ({types})
GROUP BY {id_col}
"""


def transformation_chain(events: DataFrame, vector_id,
                         id_col: str = "vector_id") -> DataFrame:
    """One vector's full ordered mutation chain
    (lineage.rs:317-349 add_transformation history; the per-id analog
    of Collection.history with collection markers excluded)."""
    return (
        events.filter(F.col("event_type").isin(*MUTATION_EVENTS))
        .filter(F.col(id_col) == F.lit(str(vector_id)))
        .orderBy("sequence")
    )


def audit_report(events: DataFrame, bucket: str = "day") -> DataFrame:
    """Time-bucketed operation counts over the FULL log, collection
    markers included (audit.rs:275-290 AuditStats as a query).

    Output: (bucket_start_ms, event_type, n_events, n_vectors) where
    n_vectors counts distinct ids touched ('*' markers count as one).
    """
    ms = {"hour": 3_600_000, "day": 86_400_000, "week": 604_800_000}.get(bucket)
    if ms is None:
        raise ValueError(f"unknown bucket: {bucket!r} (hour/day/week)")
    b = (F.floor(F.col("timestamp_ms") / F.lit(ms)) * F.lit(ms)).cast("long")
    return (
        events.groupBy(b.alias("bucket_start_ms"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("vector_id").alias("n_vectors"),
        )
    )


def compliance_report(events: DataFrame, vector_id,
                      id_col: str = "vector_id") -> dict:
    """Driver-side per-vector compliance summary
    (audit.rs:446-477 generate_report): the id's chain plus whether the
    trail ends in a delete (the forget() proof).  One bounded collect —
    a single vector's history is human-scale by construction."""
    chain = [
        {"sequence": r["sequence"], "timestamp_ms": r["timestamp_ms"],
         "event_type": r["event_type"]}
        for r in transformation_chain(events, vector_id, id_col).collect()
    ]
    return {
        "vector_id": str(vector_id),
        "n_events": len(chain),
        "created_ms": chain[0]["timestamp_ms"] if chain else None,
        "last_modified_ms": chain[-1]["timestamp_ms"] if chain else None,
        "deleted": bool(chain) and chain[-1]["event_type"] == "delete",
        "chain": chain,
    }


# ---------------------------------------------------- lineage graph --

def lineage_edges(df: DataFrame, id_col: str = "vector_id",
                  parents_col: str = "parents") -> DataFrame:
    """(child, parent) edge table from a derived-from column
    (lineage.rs:106-155 Transformation::derived_from parents;
    LineageGraph export :506-545).  parents_col is array<string>."""
    return df.select(
        F.col(id_col).cast("string").alias("child"),
        F.explode(parents_col).alias("parent"),
    ).filter(F.col("parent").isNotNull())


def _frontier_walk(edges: DataFrame, start: str, max_depth: int,
                   key: str, nxt: str) -> DataFrame:
    """Bounded BFS over the edge table: each hop broadcast-joins the
    (small) frontier against the (huge) edges — the frontier never
    exceeds the reachable set, and edges are scanned once per hop with
    the join key pushed down (the graph.py traversal shape).  Returns
    (vector_id, depth) with the MIN depth per node (DAG-safe).

    Each hop is localCheckpoint(eager)'d: an iterative union otherwise
    builds a plan that re-evaluates every earlier hop per action —
    exponential planning by hop 10.  Checkpointing pins each round to
    one edges-scan job."""
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(str(start), 0)], "vector_id string, depth int"
    ).localCheckpoint(eager=True)
    seen = frontier
    for _ in range(max_depth):
        step = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("vector_id", key)), key)
            .select(F.col(nxt).alias("vector_id"),
                    (F.col("depth") + 1).alias("depth"))
            .join(F.broadcast(seen.select("vector_id")), "vector_id",
                  "left_anti")
            .groupBy("vector_id").agg(F.min("depth").alias("depth"))
        ).localCheckpoint(eager=True)
        if step.isEmpty():
            break
        seen = seen.unionByName(step).localCheckpoint(eager=True)
        frontier = step
    return seen.filter(F.col("depth") > 0)


def lineage_descendants(edges: DataFrame, source_id,
                        max_depth: int = 10) -> DataFrame:
    """Everything derived (transitively) from source_id, with hop depth
    (lineage.rs:450-478 get_descendants / explorer :952-980)."""
    return _frontier_walk(edges, str(source_id), max_depth,
                          key="parent", nxt="child")


def lineage_ancestors(edges: DataFrame, vector_id,
                      max_depth: int = 10) -> DataFrame:
    """The derivation chain above vector_id (lineage.rs:421-449 /
    explorer :923-951)."""
    return _frontier_walk(edges, str(vector_id), max_depth,
                          key="child", nxt="parent")


def impact_analysis(edges: DataFrame, source_id,
                    max_depth: int = 10) -> dict:
    """ImpactReport (lineage.rs:479-505 / :981-1024): how many vectors
    a source transitively feeds.  Counts aggregate distributed; only
    the summary lands on the driver."""
    desc = lineage_descendants(edges, source_id, max_depth)
    row = desc.agg(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum((F.col("depth") == 1).cast("long")), F.lit(0))
        .alias("direct"),
        F.coalesce(F.max("depth"), F.lit(0)).alias("deepest"),
    ).first()
    return {
        "source_id": str(source_id),
        "directly_affected": int(row["direct"]),
        "total_affected": int(row["total"]),
        "max_depth_reached": int(row["deepest"]),
    }


def lineage_path(edges: DataFrame, from_id, to_id,
                 max_depth: int = 20,
                 max_frontier: int = 100_000) -> list[str] | None:
    """Shortest derived-from path from_id -> to_id (explorer
    path_between :1025-1067): BFS over descendants carrying
    predecessor pointers.  Each hop collects at most `max_frontier`
    (child, parent) rows — a high-fanout node cannot pull an unbounded
    set onto the driver; hitting the cap raises rather than silently
    truncating the search."""
    frm, to = str(from_id), str(to_id)
    if frm == to:
        return [frm]
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(frm,)], "vector_id string")
    preds: dict[str, str] = {}
    seen = {frm}
    for _ in range(max_depth):
        step_df = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("vector_id", "parent")),
                "parent")
            .select(F.col("child"), F.col("parent"))
            .dropDuplicates(["child"])
        )
        # early exit: the target reached this hop needs only its row
        hit = step_df.filter(F.col("child") == to).take(1)
        if hit:
            preds[to] = hit[0]["parent"]
            path = [to]
            while path[-1] != frm:
                path.append(preds[path[-1]])
            return list(reversed(path))
        step = step_df.limit(max_frontier + 1).collect()
        if len(step) > max_frontier:
            raise ValueError(
                f"lineage frontier exceeds max_frontier={max_frontier}; "
                f"raise the cap or prune the edge set")
        nxt = []
        for r in step:
            if r["child"] not in seen:
                seen.add(r["child"])
                preds[r["child"]] = r["parent"]
                nxt.append((r["child"],))
        if to in preds:
            path = [to]
            while path[-1] != frm:
                path.append(preds[path[-1]])
            return list(reversed(path))
        if not nxt:
            return None
        frontier = spark.createDataFrame(nxt, "vector_id string")
    return None


def duckdb_descendants_sql(edges_sql: str, source_id,
                           max_depth: int = 10) -> str:
    """Recursive-CTE twin of lineage_descendants (min depth per node)."""
    return f"""
WITH RECURSIVE walk(vector_id, depth) AS (
  SELECT child, 1 FROM {edges_sql} WHERE parent = '{source_id}'
  UNION ALL
  SELECT e.child, w.depth + 1
  FROM {edges_sql} e JOIN walk w ON e.parent = w.vector_id
  WHERE w.depth < {int(max_depth)}
)
SELECT vector_id, CAST(min(depth) AS INT) AS depth
FROM walk GROUP BY vector_id
"""
