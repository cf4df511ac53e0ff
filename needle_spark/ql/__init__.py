from needle_spark.ql.executor import ExecutionStats, QueryExecutor, QueryResponse
from needle_spark.ql.parser import parse

__all__ = ["QueryExecutor", "QueryResponse", "ExecutionStats", "parse"]
