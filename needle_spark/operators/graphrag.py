"""GraphRAG: entity/relationship extraction, community detection,
weighted traversal, importance, community summaries.

Reference: /root/reference/src/search/graphrag.rs —
extract_entities_from_text (:188-218: capitalized non-sentence-initial
words, >=2 chars, punctuation-trimmed, first occurrence wins),
extract_relationships_from_entities (:222-244: co-occurrence pairs),
detect_communities (label propagation :246-327), weighted_traversal
(:625-686: best-accumulated-weight BFS, score = w/(1+depth)),
compute_importance (:686-723: PageRank), community_summary (:724-760).

Spark shapes: extraction is pure Catalyst (split/slice/regexp — runs
inside the scan at any scale); co-occurrence is a per-document
self-join of the extracted entity set; traversal/PageRank/label
propagation are the classic iterative join+aggregate loops with bounded
rounds, frontiers broadcast like operators/graph.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CLEAN_RE = r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$"


def extract_entities(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, entity_id, name) — graphrag.rs:188-218 semantics: for every
    sentence ('. ' split), every word except the sentence-initial one,
    raw length >= 2, trimmed of non-alphanumerics, kept when the result
    is non-empty and starts with an uppercase letter; one row per
    distinct cleaned name per document."""
    sent = F.explode(F.split(F.col(text_col), r"\. ")).alias("__sent")
    out = docs.select(F.col(id_col), sent)
    words = F.split(F.col("__sent"), r"\s+")
    # skip the sentence-initial capital: slice from the 2nd word
    out = out.select(
        id_col, F.explode(F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))))
        .alias("__w"),
    ).filter(F.length("__w") >= 2)
    clean = F.regexp_replace(F.col("__w"), _CLEAN_RE, "")
    out = (
        out.withColumn("name", clean)
        .filter((F.length("name") > 0) & F.col("name").rlike("^[A-Z]"))
        .select(
            id_col,
            F.concat(F.lit("entity_"), F.lower("name")).alias("entity_id"),
            "name",
        )
        .distinct()
    )
    return out


def entity_cooccurrences(
    entities: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Co-occurrence relationships (graphrag.rs:222-244): every pair of
    entities extracted from the same document, aggregated over the
    corpus with a co-occurrence count as the edge weight."""
    a = entities.select(F.col(id_col), F.col("entity_id").alias("src"))
    b = entities.select(F.col(id_col), F.col("entity_id").alias("dst"))
    return (
        a.join(b, id_col)
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def weighted_traversal(
    edges: DataFrame,
    start_id: str,
    max_hops: int = 3,
    k: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Best-accumulated-weight BFS (graphrag.rs:625-686): follow edges
    multiplying weights, keep the best accumulated weight per node, and
    score reached nodes as acc_weight / (1 + depth); top-k by score.
    Returns (id, graph_score, hop, path)."""
    spark = edges.sparkSession
    sym = edges.select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
        F.col(weight_col).cast("double").alias("w"),
    )
    frontier = spark.range(1).select(
        F.lit(str(start_id)).alias("id"),
        F.lit(1.0).alias("acc"),
        F.array(F.lit(str(start_id))).alias("path"),
    )
    best = frontier.select("id", "acc")
    reached = None
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(F.broadcast(frontier.withColumnRenamed("id", "a")), "a")
            .select(
                F.col("b").alias("id"),
                (F.col("acc") * F.col("w")).alias("acc"),
                F.concat(F.col("path"), F.array(F.col("b"))).alias("path"),
            )
        )
        # keep only strictly-better accumulated weights (visited check)
        w_best = Window.partitionBy("id").orderBy(
            F.col("acc").desc(), F.col("path").asc())
        nxt = (
            nxt.withColumn("__rn", F.row_number().over(w_best))
            .filter(F.col("__rn") == 1).drop("__rn")
            .join(F.broadcast(best.withColumnRenamed("acc", "__prev")),
                  "id", "left")
            .filter(F.col("__prev").isNull() | (F.col("acc") > F.col("__prev")))
            .drop("__prev")
        )
        nxt = nxt.cache()
        scored = nxt.select(
            "id", (F.col("acc") / F.lit(1.0 + hop)).alias("graph_score"),
            F.lit(hop).alias("hop"), "path",
        )
        reached = scored if reached is None else reached.unionByName(scored)
        best = (
            best.unionByName(nxt.select("id", "acc"))
            .groupBy("id").agg(F.max("acc").alias("acc"))
        )
        frontier = nxt
    if reached is None:
        return spark.createDataFrame(
            [], "id string, graph_score double, hop int, path array<string>")
    w = Window.partitionBy("id").orderBy(
        F.col("graph_score").desc(), F.col("hop").asc())
    return (
        reached.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
        .orderBy(F.col("graph_score").desc(), F.col("id").asc())
        .limit(k)
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 20,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank-style importance (graphrag.rs compute_importance
    :686-723): uniform init 1/n, each round every node keeps
    (1-d)/n and receives d * share from in-neighbors (share =
    score/out_degree).  Dangling mass is dropped, exactly like the
    reference.  Returns (id, importance) sorted descending."""
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct().cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("importance", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    adj = e.join(out_deg, "src").cache()
    scores = nodes.withColumn("importance", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (
            adj.join(scores.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("importance") / F.col("__deg")).alias("__in"))
        )
        scores = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                 ).alias("importance"),
            )
        )
        if (i + 1) % 5 == 0 or i == iterations - 1:
            scores = scores.localCheckpoint(eager=True)  # bound lineage
    return scores.orderBy(F.col("importance").desc(), F.col("id").asc())


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 10,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10**15,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bit-reproducible PageRank (graphrag.rs compute_importance
    :686-723 semantics) in fixed-point integer arithmetic: scores are
    BIGINT micro-units (`scale` = 1.0), shares use integer division,
    and the damped sum is `(contrib * num) DIV den` — every operation
    is order-independent, so the result is IDENTICAL regardless of
    partitioning, cluster size, or reduction order.  That's the
    variant you run when two clusters (or a cluster and an oracle)
    must agree on the last bit; the float `pagerank` above is the
    throughput variant.  Bounds: node mass <= scale <= 2^53 keeps the
    final int->double conversion exact; contrib*num <= ~2e16 fits
    BIGINT with 100x headroom.  Returns (id, importance) descending."""
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct().cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("importance", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    adj = e.join(out_deg, "src").cache()
    base = (scale * (damping_den - damping_num)) // damping_den // n
    scores = nodes.withColumn("imp", F.lit(scale // n).cast("long"))
    for i in range(iterations):
        contrib = (
            adj.join(scores.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("imp DIV __deg")).alias("__in"))
        )
        scores = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base).cast("long")
                 + F.expr(f"coalesce(__in, 0L) * {damping_num} "
                          f"DIV {damping_den}")).alias("imp"),
            )
        )
        if (i + 1) % 5 == 0 or i == iterations - 1:
            scores = scores.localCheckpoint(eager=True)  # bound lineage
    return (
        scores.select(
            "id", (F.col("imp").cast("double") / F.lit(float(scale))
                   ).alias("importance"))
        .orderBy(F.col("importance").desc(), F.col("id").asc())
    )


def label_propagation(
    edges: DataFrame,
    max_iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "weight",
) -> DataFrame:
    """Weighted label propagation (graphrag.rs detect_communities
    :246-327): every node starts with its own label; each round a node
    adopts the label with the largest total neighbor weight (smallest
    label breaks ties); stops at fixpoint.  Returns (id, community)."""
    w = (F.col(weight_col).cast("double") if weight_col and weight_col in edges.columns
         else F.lit(1.0))
    sym = edges.select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
        w.alias("w"),
    )
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("community", F.col("id"))
    )
    for _ in range(max_iterations):
        # neighbor votes + a self-vote (weight 1.0): synchronous updates
        # oscillate on symmetric pairs without it (the reference's
        # sequential in-place updates break that symmetry implicitly);
        # ties resolve to the smallest label
        nbr = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .select(F.col("a").alias("id"), "community", F.col("w"))
        )
        votes = (
            nbr.unionByName(
                labels.select("id", "community", F.lit(1.0).alias("w")))
            .groupBy("id", "community")
            .agg(F.sum("w").alias("__votes"))
        )
        rank = Window.partitionBy("id").orderBy(
            F.col("__votes").desc(), F.col("community").asc())
        new_labels = (
            votes.withColumn("__rn", F.row_number().over(rank))
            .filter(F.col("__rn") == 1)
            .select("id", "community")
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "id")
            .filter(F.col("n.community") != F.col("o.community")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def community_summaries(
    labels: DataFrame,
    entities: DataFrame,
    relationships: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community summaries (graphrag.rs community_summary :724-760):
    per community, the sorted member names and the internal
    relationship triples 'src --> dst'.  One aggregation per side, no
    driver loops.  Returns (community, member_count, members,
    internal_relationships)."""
    names = entities.select(
        F.col("entity_id").alias("id"), "name").distinct()
    members = (
        labels.join(names, "id", "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("member_count"),
            F.sort_array(F.collect_set(F.coalesce("name", "id"))).alias("members"),
        )
    )
    lab_s = labels.select(F.col("id").alias(src_col), F.col("community"))
    lab_d = labels.select(F.col("id").alias(dst_col),
                          F.col("community").alias("__cd"))
    internal = (
        relationships.join(lab_s, src_col).join(lab_d, dst_col)
        .filter(F.col("community") == F.col("__cd"))
        .select(
            "community",
            F.concat(F.col(src_col), F.lit(" --> "), F.col(dst_col)).alias("rel"),
        )
        .groupBy("community")
        .agg(F.sort_array(F.collect_set("rel")).alias("internal_relationships"))
    )
    return members.join(internal, "community", "left").orderBy("community")


def graphrag_search(
    entities: DataFrame,
    edges: DataFrame,
    query_vector,
    k: int = 10,
    max_hops: int = 2,
    vector_weight: float = 0.7,
    graph_weight: float = 0.3,
    metric: str = "cosine",
    id_col: str = "id",
    vector_col: str = "vector",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Combined vector + graph search (graphrag.rs search :329-430):

    1. ANN over entity embeddings; vector_score = 1 - dist/max(dist)
       within the seed set (max clamped to 1e-6).
    2. Undirected BFS expansion from every seed (adjacency is
       symmetric, :175-176): a node reached at `hop` from a seed scores
       graph_score = 1/(1+hop), vector_score = that seed's score,
       combined = vw*vector_score + gw*graph_score; the best combined
       wins per node.  Seeds themselves enter at hop 0, graph_score 1.
    3. Top-k by combined score.

    Returns (id, vector_score, graph_score, combined_score, hop_count,
    path).  Frontiers are k-seed-bounded and broadcast per hop, like
    operators/graph.py."""
    from needle_spark.operators.knn import knn

    ann = knn(entities, query_vector, k=k, metric=metric,
              vector_col=vector_col, id_col=id_col
              ).select(F.col(id_col).cast("string").alias("id"), "distance")
    wmax = Window.partitionBy()
    seeds = ann.select(
        "id",
        (F.lit(1.0) - F.col("distance")
         / F.greatest(F.max("distance").over(wmax), F.lit(1e-6)))
        .alias("seed_vs"),
    ).withColumn("seed_id", F.col("id"))
    seeds = seeds.cache()

    sym = edges.select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"))
    sym = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))

    results = seeds.select(
        "id", F.col("seed_vs").alias("vector_score"),
        F.lit(1.0).alias("graph_score"),
        (F.lit(vector_weight) * F.col("seed_vs") + F.lit(graph_weight)).alias("combined_score"),
        F.lit(0).alias("hop_count"), F.array(F.col("id")).alias("path"),
    )
    frontier = seeds.select("seed_id", "seed_vs", F.col("id"),
                            F.array(F.col("id")).alias("path"))
    visited = frontier.select("seed_id", "id")
    for hop in range(1, max_hops + 1):
        gs = 1.0 / (1.0 + hop)
        nxt = (
            sym.join(F.broadcast(frontier.withColumnRenamed("id", "a")), "a")
            .select("seed_id", "seed_vs", F.col("b").alias("id"),
                    F.concat("path", F.array(F.col("b"))).alias("path"))
        )
        w_first = Window.partitionBy("seed_id", "id").orderBy(F.col("path").asc())
        nxt = (
            nxt.withColumn("__rn", F.row_number().over(w_first))
            .filter(F.col("__rn") == 1).drop("__rn")
            .join(F.broadcast(visited), ["seed_id", "id"], "left_anti")
            .cache()
        )
        results = results.unionByName(nxt.select(
            "id", F.col("seed_vs").alias("vector_score"),
            F.lit(gs).alias("graph_score"),
            (F.lit(vector_weight) * F.col("seed_vs")
             + F.lit(graph_weight * gs)).alias("combined_score"),
            F.lit(hop).alias("hop_count"), "path",
        ))
        visited = visited.unionByName(nxt.select("seed_id", "id"))
        frontier = nxt
    w_best = Window.partitionBy("id").orderBy(
        F.col("combined_score").desc(), F.col("hop_count").asc(),
        F.col("path").asc())
    return (
        results.withColumn("__rn", F.row_number().over(w_best))
        .filter(F.col("__rn") == 1).drop("__rn")
        .orderBy(F.col("combined_score").desc(), F.col("id").asc())
        .limit(k)
    )
