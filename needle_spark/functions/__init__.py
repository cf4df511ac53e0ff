from needle_spark.functions.distance import (
    DISTANCE_METRICS,
    distance_expr,
    l2_normalize_expr,
    similarity_from_distance,
)
from needle_spark.functions.sequence import (
    SEQ_PARALLEL_THRESHOLD,
    distributed_cumsum,
    distributed_row_number,
)

__all__ = [
    "DISTANCE_METRICS",
    "SEQ_PARALLEL_THRESHOLD",
    "distance_expr",
    "distributed_cumsum",
    "distributed_row_number",
    "l2_normalize_expr",
    "similarity_from_distance",
]
