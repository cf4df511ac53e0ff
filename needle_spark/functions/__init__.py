from needle_spark.functions.distance import (
    DISTANCE_METRICS,
    distance_expr,
    l2_normalize_expr,
    similarity_from_distance,
)

__all__ = [
    "DISTANCE_METRICS",
    "distance_expr",
    "l2_normalize_expr",
    "similarity_from_distance",
]
