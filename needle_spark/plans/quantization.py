"""Scalar quantization (SQ8) with exact rescoring.

Reference: /root/reference/src/indexing/quantization.rs (SQ8 = 4x
compression, int8 codes + per-collection min/max scale; PQ/binary are
further variants).  Spark mapping: a `array<tinyint>` codes column plus
(lo, hi) scale stored table-wide.  Search runs two stages:

1. coarse: distance on dequantized codes (cheap, scan-friendly — reads
   the 1-byte column instead of the 4-byte float column);
2. rescore: exact distance on the float column for the top
   (k * rescore_factor) coarse candidates only.

At 100 TB the win is IO: the coarse pass reads 1/4 the bytes; the exact
pass touches only candidates.  Recall is governed by rescore_factor and
measured with plans.ivf.recall_at_k-style comparison in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SQ8:
    """Symmetric per-collection scalar quantizer."""

    def __init__(self, lo: float, hi: float, vector_col: str = "vector",
                 codes_col: str = "codes"):
        if hi <= lo:
            hi = lo + 1.0
        self.lo, self.hi = float(lo), float(hi)
        self.vector_col, self.codes_col = vector_col, codes_col

    @classmethod
    def fit(cls, df: DataFrame, vector_col: str = "vector", **kw) -> "SQ8":
        row = df.select(
            F.min(F.array_min(vector_col)).alias("lo"),
            F.max(F.array_max(vector_col)).alias("hi"),
        ).first()
        return cls(row["lo"], row["hi"], vector_col=vector_col, **kw)

    def _scale(self) -> float:
        return (self.hi - self.lo) / 255.0

    def encode(self, df: DataFrame) -> DataFrame:
        """Attach int8 codes: round((x - lo) / scale) - 128."""
        s = self._scale()
        codes = F.transform(
            F.col(self.vector_col),
            lambda x: (
                F.round((x.cast("double") - self.lo) / s).cast("int") - 128
            ).cast("tinyint"),
        )
        return df.withColumn(self.codes_col, codes)

    def dequantize_expr(self, codes=None):
        """codes -> approximate float64 array."""
        c = codes if codes is not None else F.col(self.codes_col)
        s = self._scale()
        return F.transform(c, lambda b: (b.cast("double") + 128.0) * s + self.lo)

    def search(
        self,
        encoded_df: DataFrame,
        query_vector,
        k: int = 10,
        rescore_factor: int = 4,
        metric: str = "euclidean",
        id_col: str = "id",
        filter=None,
    ) -> DataFrame:
        """Two-stage quantized search: coarse top-(k*factor) on codes,
        exact rescore + top-k on floats."""
        from needle_spark.functions.distance import distance_expr
        from needle_spark.operators.knn import knn, validate_query_vector

        qv = validate_query_vector(query_vector)
        coarse_dist = distance_expr(metric, self.dequantize_expr(), qv)
        candidates = (
            (encoded_df.filter(filter) if filter is not None else encoded_df)
            .withColumn("__coarse", coarse_dist)
            .orderBy(F.col("__coarse").asc(), F.col(id_col).asc())
            .limit(k * rescore_factor)
            .drop("__coarse")
        )
        return knn(candidates, qv, k=k, metric=metric,
                   vector_col=self.vector_col, id_col=id_col)


def compression_ratio() -> float:
    """float32 -> int8."""
    return 4.0
