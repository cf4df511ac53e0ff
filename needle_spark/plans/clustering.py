"""K-means clustering over vector collections.

Reference: /root/reference/src/experimental/clustering.rs — KMeans
fit/predict/centroids/inertia (:82-360, Lloyd's with k-means++ init,
euclidean or cosine), ClusteringConfig (:32-80), and
src/experimental/vector_aggregation.rs cluster_vectors (:186).

Spark mapping: `pyspark.ml.clustering.KMeans` IS distributed Lloyd's
with k-means|| initialization running JVM-side (assignment is a map
stage, centroid recomputation a tree aggregate) — the hand-rolled loop
the reference runs per-process, at cluster scale.  This module adapts
it to the engine's `array<float>` convention, exposes
inertia/silhouette, and feeds the per-cluster summaries through
vector_agg's centroid engines."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ClusteringConfig:
    """clustering.rs:32-80."""

    distance: str = "euclidean"   # euclidean | cosine
    max_iterations: int = 20
    seed: int = 42
    tol: float = 1e-4


class KMeansModel:
    """Fitted k-means over an array<float> column."""

    def __init__(self, ml_model, vector_col: str, config: ClusteringConfig):
        self._m = ml_model
        self.vector_col = vector_col
        self.config = config

    @classmethod
    def fit(cls, df: DataFrame, k: int, vector_col: str = "vector",
            config: ClusteringConfig | None = None) -> "KMeansModel":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c = config or ClusteringConfig()
        if c.distance not in ("euclidean", "cosine"):
            raise ValueError(f"unsupported distance: {c.distance!r}")
        feat = df.withColumn(
            "__features", array_to_vector(F.col(vector_col)
                                          .cast("array<double>")))
        km = KMeans(k=int(k), seed=c.seed, maxIter=c.max_iterations,
                    tol=c.tol, featuresCol="__features",
                    predictionCol="cluster",
                    distanceMeasure=c.distance)
        return cls(km.fit(feat), vector_col, c)

    # ------------------------------------------------------ predict --
    def predict(self, df: DataFrame) -> DataFrame:
        """Map-only assignment: input columns + `cluster` int."""
        from pyspark.ml.functions import array_to_vector

        feat = df.withColumn(
            "__features", array_to_vector(F.col(self.vector_col)
                                          .cast("array<double>")))
        return self._m.transform(feat).drop("__features")

    @property
    def centroids(self) -> list[list[float]]:
        return [[float(x) for x in c] for c in self._m.clusterCenters()]

    @property
    def k(self) -> int:
        return len(self._m.clusterCenters())

    @property
    def inertia(self) -> float:
        """Training cost (sum of squared distances — clustering.rs
        inertia :330)."""
        return float(self._m.summary.trainingCost)

    def silhouette(self, df: DataFrame) -> float:
        """Silhouette score via the distributed evaluator."""
        from pyspark.ml.evaluation import ClusteringEvaluator

        measure = ("cosine" if self.config.distance == "cosine"
                   else "squaredEuclidean")
        ev = ClusteringEvaluator(featuresCol="__features",
                                 predictionCol="cluster",
                                 distanceMeasure=measure)
        from pyspark.ml.functions import array_to_vector

        feat = df.withColumn(
            "__features", array_to_vector(F.col(self.vector_col)
                                          .cast("array<double>")))
        return float(ev.evaluate(self._m.transform(feat)))


def cluster_vectors(df: DataFrame, k: int, vector_col: str = "vector",
                    id_col: str = "id",
                    config: ClusteringConfig | None = None) -> DataFrame:
    """vector_aggregation.rs:186 cluster_vectors: (id, cluster)
    assignments in one fit + one map-only transform."""
    model = KMeansModel.fit(df, k, vector_col, config)
    return model.predict(df).select(id_col, "cluster")


def cluster_summary(df: DataFrame, model: KMeansModel,
                    vector_col: str = "vector") -> DataFrame:
    """Per-cluster rollup: size + exact centroid + spread (reuses the
    vector_agg engines)."""
    from needle_spark.operators.vector_agg import group_centroids, group_spread

    assigned = model.predict(df).withColumn(
        "cluster", F.col("cluster").cast("string"))
    cents = group_centroids(assigned, "cluster", vector_col)
    spread = group_spread(assigned, "cluster", vector_col, centroids=cents)
    return (cents.join(spread.select("group", "spread"), "group")
            .select(F.col("group").alias("cluster"), "count", "centroid",
                    "spread").orderBy("cluster"))
