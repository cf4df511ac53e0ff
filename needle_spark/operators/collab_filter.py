"""Collaborative filtering: implicit-feedback recommendations from
interaction events.

Reference: /root/reference/src/experimental/collaborative_filtering.rs —
InteractionType weights (:27-51), InteractionEvent (:55-67), CfConfig
(:70-100: ALS factors/regularization/iterations, confidence alpha,
cf_weight), train (:222-297: implicit-feedback ALS, c = 1 + alpha*r),
recommend (:357-423), recommend_hybrid (:425-469: cf_weight blend),
recommend_session (:471-543), CfStats (:116-143).

Spark mapping — two engines, both distributed:

1. **ALS** (the reference's algorithm): `pyspark.ml.recommendation.ALS`
   with `implicitPrefs=True` IS Hu-Koren-Volinsky implicit ALS — the
   exact model the reference hand-rolls — running as JVM block-to-block
   alternating least squares.  Used by `CollaborativeFilter.train`.
2. **Item-kNN CF** (Sarwar et al.): item-item cosine over the sparse
   user-weight matrix as pure DataFrame algebra — a self-join on
   user_id (co-occurring pairs only, never the dense item x item
   cross), aggregate to dot products, normalize.  Deterministic, so it
   is the oracle-checked path (`cf_item_similarity`,
   `cf_recommend_itemknn` driver queries).

At 100 TB the interaction matrix aggregation is one map-side-combined
groupBy; the similarity self-join shuffles on user_id and its output
is bounded by co-occurrence (plus `min_common`/`top_n` pruning), the
standard scale shape for item-based CF."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# InteractionType::weight (collaborative_filtering.rs:42-51); `view`
# plays SearchResult's discovery role in the events schema
DEFAULT_WEIGHTS = {"click": 1.0, "purchase": 5.0, "view": 0.5}


def interaction_matrix(events: DataFrame, user_col: str = "user_id",
                       item_col: str = "item_id",
                       type_col: str = "event_type",
                       weights: dict[str, float] | None = None) -> DataFrame:
    """Aggregate events into the sparse (user, item, weight) matrix:
    weights sum per cell like record_interaction's accumulation
    (collaborative_filtering.rs:244-253).  One map-side-combined
    groupBy."""
    w = weights or DEFAULT_WEIGHTS
    wexpr = None
    for t, wt in sorted(w.items()):
        case = F.when(F.col(type_col) == t, F.lit(float(wt)))
        wexpr = case if wexpr is None else wexpr.when(
            F.col(type_col) == t, F.lit(float(wt)))
    wexpr = wexpr.otherwise(F.lit(0.0))
    return (events.select(F.col(user_col).alias("user"),
                          F.col(item_col).alias("item"),
                          wexpr.alias("w"))
            .filter(F.col("w") > 0)
            .groupBy("user", "item").agg(F.sum("w").alias("weight")))


def item_similarity(inter: DataFrame, min_common: int = 1,
                    top_n: int | None = None) -> DataFrame:
    """Item-item cosine over user-weight vectors: only co-occurring
    pairs materialize (self-join on user), normalized by per-item L2
    norms.  `min_common` prunes coincidental pairs; `top_n` keeps the
    strongest neighbors per item (both standard at scale)."""
    norms = inter.groupBy("item").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm"))
    a = inter.select(F.col("user"), F.col("item").alias("item_a"),
                     F.col("weight").alias("w_a"))
    b = inter.select(F.col("user"), F.col("item").alias("item_b"),
                     F.col("weight").alias("w_b"))
    pairs = (a.join(b, "user")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"),
                  F.count(F.lit(1)).alias("common_users"))
             .filter(F.col("common_users") >= int(min_common)))
    na = norms.select(F.col("item").alias("item_a"),
                      F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("item").alias("item_b"),
                      F.col("norm").alias("norm_b"))
    sims = (pairs.join(na, "item_a").join(nb, "item_b")
            .select("item_a", "item_b", "common_users",
                    (F.col("dot") / (F.col("norm_a") * F.col("norm_b")))
                    .alias("similarity")))
    if top_n is not None:
        both = sims.unionByName(sims.select(
            F.col("item_b").alias("item_a"), F.col("item_a").alias("item_b"),
            "common_users", "similarity"))
        w = Window.partitionBy("item_a").orderBy(
            F.col("similarity").desc(), F.col("item_b").asc())
        return (both.withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") <= int(top_n)).drop("__r"))
    return sims


def recommend_itemknn(inter: DataFrame, sims: DataFrame, user,
                      limit: int = 10) -> DataFrame:
    """Item-based CF recommendation: score(j) = sum over the user's
    items i of sim(i, j) * weight(u, i), excluding already-seen items
    (the reference's recommend also skips interacted items,
    collaborative_filtering.rs:389-400).  `sims` may be the symmetric
    or the a<b triangular frame."""
    tri = sims.select("item_a", "item_b", "similarity")
    sym = tri.unionByName(tri.select(
        F.col("item_b").alias("item_a"), F.col("item_a").alias("item_b"),
        "similarity")).dropDuplicates(["item_a", "item_b"])
    mine = inter.filter(F.col("user") == user).select(
        F.col("item").alias("item_a"), F.col("weight"))
    seen = mine.select(F.col("item_a").alias("item_b"))
    scored = (mine.join(sym, "item_a")
              .join(seen, "item_b", "left_anti")
              .groupBy("item_b")
              .agg(F.sum(F.col("similarity") * F.col("weight"))
                   .alias("cf_score"))
              .select(F.col("item_b").alias("item"), "cf_score"))
    return scored.orderBy(F.col("cf_score").desc(),
                          F.col("item").asc()).limit(int(limit))


def hybrid_scores(cf: DataFrame, vector_scores: DataFrame,
                  cf_weight: float = 0.3, item_col: str = "item",
                  vec_score_col: str = "vector_score") -> DataFrame:
    """recommend_hybrid (collaborative_filtering.rs:425-469): min-max
    normalize both signals over the candidate union, blend with
    cf_weight."""
    joined = cf.join(vector_scores.select(
        F.col(item_col), F.col(vec_score_col)), item_col, "full_outer")
    c = F.coalesce(F.col("cf_score"), F.lit(0.0))
    v = F.coalesce(F.col(vec_score_col), F.lit(0.0))
    stats = joined.agg(F.min(c).alias("c0"), F.max(c).alias("c1"),
                       F.min(v).alias("v0"), F.max(v).alias("v1")).first()
    c0, c1, v0, v1 = (stats["c0"] or 0.0, stats["c1"] or 0.0,
                      stats["v0"] or 0.0, stats["v1"] or 0.0)
    cn = (c - c0) / (c1 - c0) if c1 > c0 else F.lit(0.0)
    vn = (v - v0) / (v1 - v0) if v1 > v0 else F.lit(0.0)
    wcf = float(cf_weight)
    return joined.select(
        item_col, c.alias("cf_score"), v.alias("vector_score"),
        (F.lit(wcf) * cn + F.lit(1.0 - wcf) * vn).alias("hybrid_score"),
    ).orderBy(F.col("hybrid_score").desc(), F.col(item_col).asc())


@dataclass
class CfConfig:
    """collaborative_filtering.rs:70-100."""

    num_factors: int = 32
    regularization: float = 0.1
    num_iterations: int = 10
    confidence_alpha: float = 40.0
    cf_weight: float = 0.3
    seed: int = 42


class CollaborativeFilter:
    """ALS engine on pyspark.ml (implicit-feedback ALS — the same
    Hu-Koren-Volinsky model the reference trains, distributed)."""

    def __init__(self, config: CfConfig | None = None):
        self.config = config or CfConfig()
        self.model = None
        self._inter: DataFrame | None = None
        self._user_type = self._item_type = "long"

    def train(self, inter: DataFrame) -> "CollaborativeFilter":
        """Fit implicit ALS on the (user, item, weight) matrix.  Spark
        ALS needs integer ids; string ids should be pre-indexed with
        StringIndexer (documented, matches the reference's index maps)."""
        from pyspark.ml.recommendation import ALS

        c = self.config
        self._inter = inter
        als = ALS(rank=c.num_factors, regParam=c.regularization,
                  maxIter=c.num_iterations, implicitPrefs=True,
                  alpha=c.confidence_alpha, seed=c.seed,
                  userCol="user", itemCol="item", ratingCol="weight",
                  coldStartStrategy="drop")
        df = inter.select(F.col("user").cast("int"),
                          F.col("item").cast("int"),
                          F.col("weight").cast("float"))
        self.model = als.fit(df)
        return self

    def is_trained(self) -> bool:
        return self.model is not None

    def recommend(self, user, limit: int = 10,
                  exclude_seen: bool = True) -> DataFrame:
        """collaborative_filtering.rs:357-423."""
        if self.model is None:
            raise ValueError("train() first")
        spark = self._inter.sparkSession
        users = spark.createDataFrame([(int(user),)], "user int")
        fetch = int(limit) + (50 if exclude_seen else 0)
        recs = (self.model.recommendForUserSubset(users, fetch)
                .select(F.explode("recommendations").alias("r"))
                .select(F.col("r.item").alias("item"),
                        F.col("r.rating").cast("double").alias("cf_score")))
        if exclude_seen:
            seen = self._inter.filter(F.col("user") == user).select("item")
            recs = recs.join(seen, "item", "left_anti")
        return recs.orderBy(F.col("cf_score").desc(),
                            F.col("item").asc()).limit(int(limit))

    def item_factors_df(self) -> DataFrame:
        """Latent item vectors — feed them to the kNN operators for
        similar-item / session recommendation
        (collaborative_filtering.rs:471-543 scores session items via
        factor similarity)."""
        if self.model is None:
            raise ValueError("train() first")
        return self.model.itemFactors.select(
            F.col("id").alias("item"),
            F.col("features").cast("array<float>").alias("vector"))

    def recommend_session(self, session_items, limit: int = 10) -> DataFrame:
        """Session-based: average the session items' latent factors and
        rank other items by cosine to that centroid."""
        import numpy as np

        from needle_spark.operators.knn import knn

        factors = self.item_factors_df()
        rows = factors.filter(F.col("item").isin([int(i) for i in
                                                  session_items])).collect()
        if not rows:
            return factors.select("item").limit(0).withColumn(
                "cf_score", F.lit(0.0))
        centroid = np.mean([r["vector"] for r in rows], axis=0)
        hits = knn(factors.filter(~F.col("item").isin(
            [int(i) for i in session_items])), centroid.tolist(),
            k=limit, id_col="item")
        return hits.select("item", (1.0 - F.col("distance"))
                           .alias("cf_score"))

    def stats(self) -> dict:
        """CfStats (collaborative_filtering.rs:116-143) in one agg."""
        if self._inter is None:
            return {"num_users": 0, "num_items": 0, "total_interactions": 0,
                    "is_trained": False, "sparsity": 0.0}
        row = self._inter.agg(
            F.countDistinct("user").alias("u"),
            F.countDistinct("item").alias("i"),
            F.count(F.lit(1)).alias("n")).first()
        dense = row["u"] * row["i"]
        return {
            "num_users": row["u"], "num_items": row["i"],
            "total_interactions": row["n"],
            "is_trained": self.is_trained(),
            "num_factors": self.config.num_factors,
            "sparsity": 1.0 - row["n"] / dense if dense else 0.0,
        }
