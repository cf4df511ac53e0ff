"""IVF (inverted-file) approximate nearest neighbor — the Spark-native
ANN index.

The reference's ANN stack is HNSW (+ IVF variants, /root/reference/src/
indexing/{hnsw.rs,ivf.rs}).  HNSW is a pointer-chasing graph — wrong
shape for a distributed columnar engine.  IVF is the natural Spark
mapping (SURVEY §4.2): KMeans centroids become a partition-prunable
`centroid_id` column; a query probes its `nprobe` nearest centroids and
scans only those rows.

At 100 TB: write the indexed table partitioned by `centroid_id`
(`.write.partitionBy("centroid_id")`) so the probe filter becomes
partition pruning — the scan reads nprobe/nlist of the data.  Recall is
tunable with nprobe and measured against the exact oracle (recall
harness below, mirroring src/recall_benchmark.rs).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IvfIndex:
    """KMeans-centroid IVF index over an array<float> column."""

    def __init__(self, centroids: np.ndarray, vector_col: str, id_col: str):
        self.centroids = centroids  # (nlist, dim) float64
        self.vector_col = vector_col
        self.id_col = id_col

    @property
    def nlist(self) -> int:
        return len(self.centroids)

    # -- build --------------------------------------------------------
    @classmethod
    def fit(
        cls,
        df: DataFrame,
        nlist: int = 64,
        vector_col: str = "vector",
        id_col: str = "id",
        seed: int = 42,
        max_iter: int = 20,
        sample_fraction: float | None = None,
    ) -> "IvfIndex":
        """Train centroids with MLlib KMeans (distributed, seeded).

        `sample_fraction` trains on a sample — at 100 TB you fit on ~1e6
        sampled rows; assignment is still exact over everything.
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = df
        if sample_fraction is not None:
            train = df.sample(fraction=sample_fraction, seed=seed)
        feats = train.select(array_to_vector(F.col(vector_col).cast("array<double>")).alias("features"))
        model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(feats)
        centroids = np.asarray([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
        return cls(centroids, vector_col, id_col)

    # -- assign -------------------------------------------------------
    def assign(self, df: DataFrame, out_col: str = "centroid_id") -> DataFrame:
        """Attach the nearest-centroid id (L2) to each row via an Arrow
        kernel — one map-only pass; write partitioned by this column."""
        from pyspark.sql.functions import pandas_udf

        C = self.centroids
        vector_col = self.vector_col

        @pandas_udf("int")
        def _nearest(s: pd.Series) -> pd.Series:
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
            if len(V) == 0:
                return pd.Series([], dtype="int32")
            d = (
                (V * V).sum(axis=1, keepdims=True)
                - 2.0 * (V @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            return pd.Series(d.argmin(axis=1).astype("int32"))

        return df.withColumn(out_col, _nearest(F.col(vector_col)))

    # -- search -------------------------------------------------------
    def probe_ids(self, query_vector: Sequence[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vector, dtype=np.float64)
        d = ((self.centroids - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]

    def search(
        self,
        indexed_df: DataFrame,
        query_vector: Sequence[float],
        k: int = 10,
        nprobe: int = 8,
        metric: str = "cosine",
        centroid_col: str = "centroid_id",
        filter=None,
        **knn_kwargs,
    ) -> DataFrame:
        """Approximate kNN: restrict the scan to nprobe nearest centroid
        buckets, then run the exact kNN pipeline inside them.  The
        centroid_id IN (...) predicate partition-prunes a
        partitionBy(centroid_id) table."""
        from needle_spark.operators.knn import knn

        probes = self.probe_ids(query_vector, nprobe)
        pruned = indexed_df.filter(F.col(centroid_col).isin(probes))
        return knn(
            pruned, query_vector, k=k, metric=metric, filter=filter,
            vector_col=self.vector_col, id_col=self.id_col, **knn_kwargs,
        )


def recall_at_k(
    df: DataFrame,
    index: IvfIndex,
    indexed_df: DataFrame,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    nprobe: int = 8,
    metric: str = "cosine",
) -> float:
    """Recall harness vs the exact oracle (src/recall_benchmark.rs:1-50):
    |approx ∩ exact| / k averaged over queries."""
    from needle_spark.operators.knn import knn

    total = 0.0
    for qv in queries:
        exact = {
            r[index.id_col]
            for r in knn(
                df, qv, k=k, metric=metric,
                vector_col=index.vector_col, id_col=index.id_col,
            ).collect()
        }
        approx = {
            r[index.id_col]
            for r in index.search(indexed_df, qv, k=k, nprobe=nprobe, metric=metric).collect()
        }
        total += len(exact & approx) / k
    return total / len(queries)
