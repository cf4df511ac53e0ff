"""needle_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `needle` embedded vector database
(reference: /root/reference, josedab/needle).

Architecture is Spark-first: every operator is declared with the
DataFrame/SQL API so Catalyst/Tungsten choose the physical strategy
(predicate pushdown, column pruning, broadcast joins, TakeOrderedAndProject
top-k, whole-stage codegen).  Python UDFs appear only where the semantics
genuinely cannot be expressed with built-in functions (Porter stemming,
MMR's sequential greedy loop) and are Arrow-batched pandas UDFs.

Layout:
    session      - SparkSession factory tuned for the engine
    filters      - MongoDB-style filter-JSON -> Column compiler
    functions/   - distance metrics, text tokenization, time decay
    operators/   - kNN, analytics, hybrid/BM25, dedup, text analysis, ...
    plans/       - access-path planner (exact scan vs IVF) + EXPLAIN
    streaming/   - Structured Streaming ingestion + CDC conventions
"""

from needle_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
