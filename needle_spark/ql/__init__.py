from needle_spark.ql.executor import QueryExecutor
from needle_spark.ql.parser import parse

__all__ = ["QueryExecutor", "parse"]
