"""Named vector fields: documents carrying SEVERAL embeddings (title,
body, image, ...) searched per-field or fused.

Reference: /root/reference/src/services/collection/vector_namespace.rs —
VectorFieldDef/NamespaceSchema (:51-146: per-field dims + metric,
duplicate-field rejection, field validation), search_field (:228-266:
dimension-checked single-field search), fusion_search (:271-305:
per-field over-fetch k*3, reciprocal-rank fusion weight/(rank+60) with
0-based ranks, top-k by fused score).

Spark shape: each named field is just an array<float> column, so a
field search is the ordinary kNN plan on that column, and fusion is a
union of per-field rank windows + one groupBy sum — all lazy, no new
machinery."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class NamespaceError(ValueError):
    pass


@dataclass
class VectorFieldDef:
    """vector_namespace.rs:51-63."""

    name: str
    dimensions: int
    metric: str = "cosine"


class NamespaceSchema:
    """vector_namespace.rs:66-146."""

    def __init__(self, collection: str):
        self.collection = collection
        self.fields: dict[str, VectorFieldDef] = {}

    def add_field(self, field: VectorFieldDef) -> "NamespaceSchema":
        if field.name in self.fields:
            raise NamespaceError(f"duplicate field: {field.name!r}")
        if field.dimensions <= 0:
            raise NamespaceError("dimensions must be positive")
        self.fields[field.name] = field
        return self

    def get_field(self, name: str) -> VectorFieldDef | None:
        return self.fields.get(name)

    def field_names(self) -> list[str]:
        return list(self.fields)

    def validate_fields(self, provided: Sequence[str]) -> None:
        unknown = [f for f in provided if f not in self.fields]
        if unknown:
            raise NamespaceError(f"unknown fields: {unknown}")


def search_field(
    df: DataFrame,
    schema: NamespaceSchema,
    field: str,
    query_vector: Sequence[float],
    k: int = 10,
    id_col: str = "id",
    flt=None,
) -> DataFrame:
    """Dimension-checked single-field search (search_field :228):
    (id, distance, field)."""
    fd = schema.get_field(field)
    if fd is None:
        raise NamespaceError(f"unknown field: {field!r}")
    if len(query_vector) != fd.dimensions:
        raise NamespaceError(
            f"dimension mismatch for {field!r}: expected {fd.dimensions}, "
            f"got {len(query_vector)}")
    from needle_spark.operators.knn import knn

    return knn(
        df.filter(F.col(field).isNotNull()), query_vector, k=k,
        metric=fd.metric, filter=flt, vector_col=field, id_col=id_col,
    ).select(id_col, "distance", F.lit(field).alias("field"))


def fusion_search(
    df: DataFrame,
    schema: NamespaceSchema,
    queries: Sequence[tuple[str, Sequence[float], float]],
    k: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Weighted RRF across fields (fusion_search :271-305): each
    (field, vector, weight) query over-fetches k*3, contributes
    weight/(rank+60) with 0-based ranks, fused per document.  Returns
    (id, score) top-k."""
    if not queries:
        raise NamespaceError("fusion_search needs at least one field query")
    schema.validate_fields([f for f, _, _ in queries])
    per_field_k = k * 3
    parts = []
    for field, qv, weight in queries:
        hits = search_field(df, schema, field, qv, k=per_field_k, id_col=id_col)
        w = Window.orderBy(F.col("distance").asc(), F.col(id_col).asc())
        parts.append(hits.select(
            F.col(id_col),
            (F.lit(float(weight))
             / (F.row_number().over(w).cast("double") - 1.0 + 60.0)
             ).alias("__c"),
        ))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col).agg(F.sum("__c").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
