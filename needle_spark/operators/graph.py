"""Knowledge-graph traversal (GraphRAG surface).

Reference: /root/reference/src/search/graphrag.rs:19-39 (typed entities
with optional embeddings) and /root/reference/src/services/ai/
graph_query.rs:37-44 (TraversalOp: `->` out, `<-` in, `*..N` variable
hops, optional edge-type filter).

Spark shape (the GraphFrames pattern without the dependency): nodes and
edges are plain DataFrames; one hop is one equi-join frontier ⋈ edges;
`*..N` is N iterated joins with a visited-set union (BFS).  Frontiers
stay small relative to the edge table, so each hop is a broadcast join
of frontier ids against the (potentially huge, partitioned-by-src) edge
table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def traverse(
    edges: DataFrame,
    seed_ids: Sequence,
    direction: str = "out",
    max_hops: int = 1,
    edge_type: str | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    type_col: str = "edge_type",
) -> DataFrame:
    """BFS from seed ids: returns (id, hop) for every node reached within
    max_hops (seeds are hop 0).  direction: 'out' (->), 'in' (<-),
    'both'."""
    spark = edges.sparkSession
    if edge_type is not None:
        edges = edges.filter(F.col(type_col) == edge_type)

    if direction == "out":
        hop_edges = edges.select(F.col(src_col).alias("__from"), F.col(dst_col).alias("__to"))
    elif direction == "in":
        hop_edges = edges.select(F.col(dst_col).alias("__from"), F.col(src_col).alias("__to"))
    elif direction == "both":
        hop_edges = edges.select(
            F.col(src_col).alias("__from"), F.col(dst_col).alias("__to")
        ).unionByName(
            edges.select(F.col(dst_col).alias("__from"), F.col(src_col).alias("__to"))
        )
    else:
        raise ValueError(f"unknown direction: {direction!r}")

    # literal seed frame via range+explode: no driver-side conversion,
    # no schema inference — measurably cheaper plan construction than
    # createDataFrame on the repeated-traversal path
    visited = spark.range(1).select(
        F.explode(F.array(*[F.lit(str(s)) for s in seed_ids])).alias("id"),
        F.lit(0).alias("hop"),
    )
    frontier = visited.select("id")

    # Bounded short traversals (*..N, small N) chain the hop joins
    # LAZILY into one job — per-hop materialization costs an eager
    # checkpoint + isEmpty action each round, which dominates when N is
    # small.  Unbounded/deep walks keep the eager early-exit: it cuts
    # the exponentially-replaying lineage and stops on empty frontiers.
    eager = max_hops > 3

    for hop in range(1, max_hops + 1):
        nxt = (
            hop_edges.join(
                F.broadcast(frontier.withColumnRenamed("id", "__from")), "__from"
            )
            .select(F.col("__to").cast("string").alias("id"))
            .distinct()
            # visited is seeds + reached frontiers — small by the same
            # assumption that lets the frontier broadcast above; without
            # the hint this anti-join becomes a full sort-merge shuffle
            .join(F.broadcast(visited.select("id")), "id", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        if eager and hop < max_hops:
            # materialize the frontier once: cuts iterative-join lineage
            # AND gives the early-exit row count in the same job (vs a
            # separate isEmpty() action per hop)
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
        elif hop < max_hops:
            # lazy path: each hop is referenced by every later hop's
            # frontier AND anti-join; marking it cached makes the single
            # final job compute it once instead of replaying the whole
            # upstream chain per reference (cache registration is a
            # no-op call, unlike localCheckpoint's plan compilation)
            nxt = nxt.cache()
        visited = visited.unionByName(nxt)
        frontier = nxt.select("id")
    return visited


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Community detection via iterative min-label propagation
    (GraphRAG community building, graphrag.rs) — each node adopts the
    smallest component id among itself and its neighbors until fixpoint.

    Returns (id, component).  Each iteration is one join + aggregation;
    converges in O(diameter) rounds.  At real scale, persist labels
    each round and use large-star/small-star optimizations.
    """
    sym = edges.select(
        F.col(src_col).cast("string").alias("a"), F.col(dst_col).cast("string").alias("b")
    )
    sym = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut iterative lineage
        if changed == 0:
            break
    return labels


def seed_by_similarity(
    nodes: DataFrame,
    query_vector,
    k: int = 5,
    metric: str = "cosine",
    id_col: str = "id",
    vector_col: str = "vector",
) -> list:
    """GraphRAG entry: seed the traversal with the k nodes nearest to the
    query embedding (graphrag.rs search-then-walk)."""
    from needle_spark.operators.knn import knn

    return [
        r[id_col]
        for r in knn(nodes, query_vector, k=k, metric=metric,
                     vector_col=vector_col, id_col=id_col).collect()
    ]
