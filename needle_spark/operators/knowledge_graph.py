"""Typed knowledge graph over DataFrames: entities + relations,
graph-context-boosted vector search, shortest paths, and subgraphs.

Reference: /root/reference/src/experimental/knowledge_graph.rs —
Entity/Relation (:41-71), get_neighbors (:304-335),
search_with_context (:388-438: combined = similarity_weight * cosine +
graph_weight * graph_score where reachable-from-anchors scores 1.0,
others their normalized degree centrality, :577-585), get_reachable
(:440-466 BFS both directions), find_path (:468-548 BFS shortest
path), extract_subgraph (:550-603), get_by_type (:605-620).

Spark mapping: entities and relations are DataFrames; reachability
reuses the broadcast-frontier BFS from operators/graph.py; degree
centrality is one aggregation; the combined score is a scan expression
over a left join against the (small, broadcast) reachable set; path
finding tracks parents per hop and reconstructs on the driver (bounded
by max_hops rows of frontier state)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.functions.distance import distance_expr
from needle_spark.operators.graph import traverse


@dataclass
class KnowledgeGraphConfig:
    """knowledge_graph.rs:123-147."""

    similarity_weight: float = 0.7
    graph_weight: float = 0.3
    max_context_hops: int = 2


class KnowledgeGraph:
    """entities: (id, entity_type, vector, props?);
    relations: (src, dst, edge_type, weight?)."""

    def __init__(self, entities: DataFrame, relations: DataFrame,
                 config: KnowledgeGraphConfig | None = None,
                 id_col: str = "id", vector_col: str = "vector"):
        self.entities = entities
        self.relations = relations
        self.config = config or KnowledgeGraphConfig()
        self.id_col = id_col
        self.vector_col = vector_col

    # ----------------------------------------------------- lookups --
    def get_by_type(self, entity_type: str) -> DataFrame:
        return self.entities.filter(F.col("entity_type") == entity_type)

    def relations_by_type(self, edge_type: str) -> DataFrame:
        return self.relations.filter(F.col("edge_type") == edge_type)

    def neighbors(self, entity_id) -> DataFrame:
        """get_neighbors (:304-335): outgoing + incoming with relation
        type and direction."""
        out = (self.relations.filter(F.col("src") == entity_id)
               .select(F.col("dst").alias("neighbor"), "edge_type",
                       F.lit("out").alias("direction")))
        inc = (self.relations.filter(F.col("dst") == entity_id)
               .select(F.col("src").alias("neighbor"), "edge_type",
                       F.lit("in").alias("direction")))
        return out.unionByName(inc)

    def degree_scores(self) -> DataFrame:
        """Degree centrality normalized by entity count (:577-585)."""
        deg = (self.relations.select(F.col("src").alias("nid"))
               .unionByName(self.relations.select(F.col("dst").alias("nid")))
               .groupBy("nid").agg(F.count(F.lit(1)).alias("degree")))
        n = self.entities.count()
        return deg.select(
            "nid", (F.least(F.col("degree") / float(max(n, 1)), F.lit(1.0)))
            .alias("graph_score"))

    def reachable(self, anchors: Sequence, max_hops: int | None = None
                  ) -> DataFrame:
        """get_reachable (:440-466): both-direction BFS from anchors."""
        hops = max_hops if max_hops is not None else \
            self.config.max_context_hops
        return traverse(self.relations, [str(a) for a in anchors],
                        direction="both", max_hops=hops).select(
            F.col("id").alias("nid"), "hop")

    # ------------------------------------------------------ search --
    def search(self, query_vector, k: int = 10) -> DataFrame:
        from needle_spark.operators.knn import knn

        return knn(self.entities, query_vector, k=k,
                   vector_col=self.vector_col, id_col=self.id_col)

    def search_with_context(self, query_vector, k: int = 10,
                            anchors: Sequence = ()) -> DataFrame:
        """search_with_context (:388-438): cosine similarity blended
        with a graph score — 1.0 for entities reachable from the
        anchors, degree centrality otherwise.  The reachable set and
        degree table broadcast; scoring is a scan expression."""
        c = self.config
        sim = 1.0 - distance_expr("cosine", F.col(self.vector_col),
                                  [float(x) for x in query_vector])
        scored = self.entities.withColumn("similarity", sim)
        scored = scored.join(
            F.broadcast(self.degree_scores()),
            scored[self.id_col] == F.col("nid"), "left").drop("nid")
        base_graph = F.coalesce(F.col("graph_score"), F.lit(0.0))
        if anchors:
            reach = self.reachable(anchors).select(
                F.col("nid"), F.lit(True).alias("__reach"))
            scored = scored.join(
                F.broadcast(reach),
                scored[self.id_col] == F.col("nid"), "left").drop("nid")
            graph_score = F.when(F.col("__reach"), 1.0).otherwise(base_graph)
        else:
            graph_score = base_graph
        combined = (F.lit(c.similarity_weight) * F.col("similarity")
                    + F.lit(c.graph_weight) * graph_score)
        return (scored
                .withColumn("graph_score", graph_score)
                .withColumn("combined_score", combined)
                .select(self.id_col, "entity_type", "similarity",
                        "graph_score", "combined_score")
                .orderBy(F.col("combined_score").desc(),
                         F.col(self.id_col).asc())
                .limit(int(k)))

    # -------------------------------------------------------- paths --
    def find_path(self, source, target, max_hops: int = 6) -> list | None:
        """find_path (:468-548): BFS with parent tracking; each hop is
        one broadcast join, parents collect per hop (frontier-sized),
        reconstruction on the driver."""
        src, dst = str(source), str(target)
        if src == dst:
            return [src]
        edges = (self.relations.select(F.col("src").alias("a"),
                                       F.col("dst").alias("b"))
                 .unionByName(self.relations.select(
                     F.col("dst").alias("a"), F.col("src").alias("b"))))
        parents: dict[str, str] = {}
        visited = {src}
        frontier = [src]
        for _hop in range(max_hops):
            spark = self.relations.sparkSession
            fdf = spark.range(1).select(F.explode(F.array(
                *[F.lit(x) for x in frontier])).alias("a"))
            step = (edges.join(F.broadcast(fdf), "a")
                    .select("a", F.col("b").cast("string").alias("b"))
                    .distinct().collect())
            nxt = []
            for r in step:
                b = r["b"]
                if b not in visited:
                    visited.add(b)
                    parents[b] = r["a"]
                    nxt.append(b)
            if dst in visited:
                path = [dst]
                while path[-1] != src:
                    path.append(parents[path[-1]])
                return list(reversed(path))
            if not nxt:
                return None
            frontier = nxt
        return None

    # ----------------------------------------------------- subgraph --
    def subgraph(self, centers: Sequence, hops: int = 1
                 ) -> tuple[DataFrame, DataFrame]:
        """extract_subgraph (:550-603): nodes within `hops` of the
        centers plus the induced relations."""
        nodes = self.reachable(centers, hops).select("nid")
        ents = self.entities.join(
            F.broadcast(nodes),
            self.entities[self.id_col] == F.col("nid")).drop("nid")
        a = nodes.select(F.col("nid").alias("src"))
        b = nodes.select(F.col("nid").alias("dst"))
        rels = (self.relations.join(F.broadcast(a), "src")
                .join(F.broadcast(b), "dst"))
        return ents, rels
