"""Dimensionality reduction: PCA and random projection (reference:
/root/reference/src/ml/dimreduce.rs — PCA fit/transform :29-120,
RandomProjection :150+; t-SNE-style embedding is out of scope for a
batch engine).

Scale design:
- PCA fit: the d x d scatter matrix accumulates DISTRIBUTED — each
  Arrow batch contributes (count, sum, X^T X) partials, the driver sums
  a handful of d^2-sized rows and eigendecomposes locally.  No row data
  reaches the driver; cost is one scan.
- transforms: map-only projections.  Small output dims compile to pure
  Catalyst dot-product folds (oracle-checkable in SQL); larger ones use
  an Arrow-batched matmul kernel.
- RandomProjection matrices derive from a counter-hash PRNG, so the
  same seed yields the same matrix in any engine/process — the SQL twin
  embeds identical literals.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_expr(vec: Column, weights: list[float]) -> Column:
    """Fixed-order dot product of an array column with literal weights."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec, w, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _duckdb_dot_sql(vec: str, weights: list[float]) -> str:
    lits = ", ".join(repr(float(x)) for x in weights)
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({vec}, [{lits}]), "
        f"z -> CAST(z[1] AS DOUBLE) * z[2])), (acc, x) -> acc + x)"
    )


# ------------------------------------------------------ random projection --

def _hash_unit(seed: int, i: int, j: int) -> float:
    """Deterministic uniform(-1,1) from a counter hash (engine-portable,
    no RNG state)."""
    h = (seed * 1_000_003 + i * 8191 + j * 127) * 2654435761 % (1 << 32)
    return h / float((1 << 32) - 1) * 2.0 - 1.0


@dataclass
class RandomProjection:
    """Seeded JL projection (dimreduce.rs RandomProjection): matrix
    entries uniform(-1,1)/sqrt(out_dim), reproducible from the seed."""

    in_dim: int
    out_dim: int
    seed: int = 7

    def matrix(self) -> list[list[float]]:
        s = math.sqrt(self.out_dim)
        return [
            [_hash_unit(self.seed, i, j) / s for i in range(self.in_dim)]
            for j in range(self.out_dim)
        ]

    def transform(self, df: DataFrame, vector_col: str = "vector",
                  out_prefix: str = "p") -> DataFrame:
        cols = [
            _dot_expr(F.col(vector_col), row).alias(f"{out_prefix}{j}")
            for j, row in enumerate(self.matrix())
        ]
        return df.select("*", *cols)

    def duckdb_transform_sql(self, vec: str = "embedding",
                             out_prefix: str = "p") -> list[str]:
        """One SQL expression per output dim (identical literals)."""
        return [
            f"{_duckdb_dot_sql(vec, row)} AS {out_prefix}{j}"
            for j, row in enumerate(self.matrix())
        ]


# ------------------------------------------------------------------- PCA --

@dataclass
class PCA:
    """PCA fitted distributively; transform is a map-only projection.

    Attributes mirror dimreduce.rs PCA: components (rows = PCs), mean,
    explained_variance (descending), total_variance."""

    components: np.ndarray        # (k, d)
    mean: np.ndarray              # (d,)
    explained_variance: np.ndarray
    total_variance: float

    @classmethod
    def fit(cls, df: DataFrame, n_components: int,
            vector_col: str = "vector") -> "PCA":
        import pandas as pd

        first = df.select(vector_col).first()
        if first is None or first[0] is None:
            raise ValueError("cannot fit PCA on an empty dataset")
        d_probe = len(first[0])

        def partials(batches):
            for pdf in batches:
                x = np.array(pdf[vector_col].tolist(), dtype=np.float64)
                if x.size == 0:
                    continue
                yield pd.DataFrame({
                    "n": [float(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).reshape(-1).tolist()],
                })

        parts = df.select(vector_col).mapInPandas(
            partials, schema="n double, s array<double>, ss array<double>"
        ).collect()
        if not parts:
            raise ValueError("cannot fit PCA on an empty dataset")
        n = sum(r["n"] for r in parts)
        s = np.sum([np.array(r["s"]) for r in parts], axis=0)
        ss = np.sum([np.array(r["ss"]) for r in parts], axis=0).reshape(
            d_probe, d_probe)
        mean = s / n
        # scatter -> covariance via E[xx^T] - mu mu^T (population)
        cov = ss / n - np.outer(mean, mean)
        evals, evecs = np.linalg.eigh(cov)       # ascending
        order = np.argsort(evals)[::-1][:n_components]
        return cls(
            components=evecs[:, order].T.copy(),
            mean=mean,
            explained_variance=np.maximum(evals[order], 0.0),
            total_variance=float(np.maximum(evals, 0.0).sum()),
        )

    def explained_variance_ratio(self) -> np.ndarray:
        if self.total_variance <= 0:
            return np.zeros_like(self.explained_variance)
        return self.explained_variance / self.total_variance

    def transform(self, df: DataFrame, vector_col: str = "vector",
                  out_prefix: str = "pc") -> DataFrame:
        """Map-only (x - mean) @ components^T as Catalyst folds."""
        centered_dot = []
        for j, row in enumerate(self.components):
            # (x - mean) . row == x . row - mean . row (constant folded)
            const = float(np.dot(self.mean, row))
            centered_dot.append(
                (_dot_expr(F.col(vector_col), row.tolist()) - F.lit(const))
                .alias(f"{out_prefix}{j}")
            )
        return df.select("*", *centered_dot)
