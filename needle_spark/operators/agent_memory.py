"""Agentic memory: typed memory tiers with importance decay,
relevance-scored recall, consolidation, and expiry.

Reference: /root/reference/src/experimental/agentic_memory.rs —
MemoryType (:57-76: short_term/long_term/working/episodic/semantic/
procedural), DecayFunction (:80-127: none/exponential/linear/step/
power_law), Memory.effective_importance (:285-289: importance x
decay(age)), recall (:452-523: relevance = 0.7*similarity +
0.3*effective_importance above a threshold, access marking),
consolidate (:580-618: short-term memories whose decayed importance
clears the threshold promote to long-term), clear_expired (:621-644),
MemoryStats (:330-350).

Spark mapping: memories are rows of a needle_spark collection (typed
columns, not driver dicts), decay and relevance are scan expressions,
recall is the ordinary top-k plan, and consolidation/expiry are
bounded upsert/delete batches derived from distributed filters — an
agent fleet's shared memory scales like any other table."""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEMORY_TYPES = ("short_term", "long_term", "working", "episodic",
                "semantic", "procedural")

MEMORY_SCHEMA = ("id string, vector array<float>, memory_type string, "
                 "content string, importance double, created_at long, "
                 "last_accessed long, access_count long, "
                 "tags array<string>, source string")


def decay_factor_expr(kind: str, age_hours: Column, **params) -> Column:
    """DecayFunction::decay_factor (:106-127) as an expression."""
    k = kind.lower()
    if k == "none":
        return F.lit(1.0)
    if k == "exponential":
        hl = float(params.get("half_life_hours", 168.0))
        return F.pow(F.lit(0.5), age_hours / hl)
    if k == "linear":
        r = float(params.get("decay_rate_per_hour", 0.01))
        return F.greatest(1.0 - F.lit(r) * age_hours, F.lit(0.0))
    if k == "step":
        iv = float(params.get("interval_hours", 24.0))
        d = float(params.get("decay_per_step", 0.1))
        return F.greatest(1.0 - F.lit(d) * F.floor(age_hours / iv),
                          F.lit(0.0))
    if k == "power_law":
        e = float(params.get("exponent", 1.0))
        return 1.0 / F.pow(1.0 + age_hours, F.lit(e))
    raise ValueError(f"unknown decay function: {kind!r}")


def recall_scores(memories: DataFrame, query_vector, now: int,
                  decay: str = "exponential",
                  decay_params: dict | None = None,
                  recall_threshold: float = 0.0,
                  similarity_weight: float = 0.7,
                  importance_weight: float = 0.3) -> DataFrame:
    """Relevance scoring (:452-523) as pure scan expressions: cosine
    similarity, decayed importance, 0.7/0.3 blend, threshold filter."""
    from needle_spark.functions.distance import distance_expr

    sim = 1.0 - distance_expr("cosine", F.col("vector"),
                              [float(x) for x in query_vector])
    age_h = (F.lit(int(now)) - F.col("created_at")) / 3600.0
    eff = F.col("importance") * decay_factor_expr(
        decay, F.greatest(age_h, F.lit(0.0)), **(decay_params or {}))
    return (memories
            .withColumn("similarity", sim)
            .withColumn("effective_importance", eff)
            .withColumn("relevance",
                        F.lit(similarity_weight) * F.col("similarity")
                        + F.lit(importance_weight)
                        * F.col("effective_importance"))
            .filter(F.col("similarity") >= float(recall_threshold)))


@dataclass
class MemoryConfig:
    """agentic_memory.rs:129-220."""

    dimensions: int
    decay: str = "exponential"
    decay_params: dict | None = None
    recall_threshold: float = 0.0
    consolidation_threshold: float = 0.6
    short_term_ttl_secs: int = 3600


class AgentMemory:
    """Memory tiers over a needle_spark collection."""

    def __init__(self, db, config: MemoryConfig,
                 collection_name: str = "agent_memory"):
        self.db = db
        self.config = config
        names = set(db.list_collections())
        if collection_name not in names:
            db.create_collection(collection_name, dims=config.dimensions,
                                 schema=MEMORY_SCHEMA)
        self.collection = db.collection(collection_name)
        self.total_recalls = 0
        self.recall_hits = 0
        self.consolidations = 0

    # ----------------------------------------------------- remember --
    def remember(self, content: str, embedding, memory_type: str = "long_term",
                 importance: float = 0.5, tags: list[str] | None = None,
                 source: str | None = None, now: int | None = None) -> str:
        if memory_type not in MEMORY_TYPES:
            raise ValueError(f"unknown memory type: {memory_type!r}")
        now = int(now if now is not None else time.time())
        mid = f"mem_{uuid.uuid4().hex[:12]}"
        spark = self.db.spark
        row = spark.createDataFrame(
            [(mid, [float(x) for x in embedding], memory_type, content,
              float(importance), now, now, 0, tags or [], source)],
            MEMORY_SCHEMA)
        self.collection.insert(row)
        return mid

    # ------------------------------------------------------- recall --
    def recall(self, query_embedding, limit: int = 5,
               memory_types: list[str] | None = None,
               now: int | None = None,
               mark_accessed: bool = True) -> list[dict]:
        now = int(now if now is not None else time.time())
        c = self.config
        df = self.collection.df()
        if memory_types:
            df = df.filter(F.col("memory_type").isin(memory_types))
        scored = recall_scores(df, query_embedding, now, c.decay,
                               c.decay_params, c.recall_threshold)
        rows = (scored.orderBy(F.col("relevance").desc(), F.col("id").asc())
                .limit(int(limit)).collect())
        self.total_recalls += 1
        if rows:
            self.recall_hits += 1
        if mark_accessed and rows:
            ids = [r["id"] for r in rows]
            hit = self.collection.df().filter(F.col("id").isin(ids))
            self.collection.upsert(
                hit.withColumn("last_accessed", F.lit(now))
                   .withColumn("access_count", F.col("access_count") + 1))
        return [r.asDict() for r in rows]

    # ------------------------------------------------- maintenance --
    def consolidate(self, now: int | None = None) -> int:
        """Promote decayed-importance-qualified short-term memories to
        long-term (:580-618): one distributed filter, one upsert."""
        now = int(now if now is not None else time.time())
        c = self.config
        age_h = (F.lit(now) - F.col("created_at")) / 3600.0
        eff = F.col("importance") * decay_factor_expr(
            c.decay, F.greatest(age_h, F.lit(0.0)), **(c.decay_params or {}))
        qualified = (self.collection.df()
                     .filter((F.col("memory_type") == "short_term")
                             & (eff >= c.consolidation_threshold)))
        n = qualified.count()
        if n:
            self.collection.upsert(
                qualified.withColumn("memory_type", F.lit("long_term")))
            self.consolidations += n
        return n

    def clear_expired(self, now: int | None = None) -> int:
        """Forget short-term memories past their TTL (:621-644)."""
        now = int(now if now is not None else time.time())
        expired = (self.collection.df()
                   .filter((F.col("memory_type") == "short_term")
                           & (F.lit(now) - F.col("created_at")
                              > self.config.short_term_ttl_secs)))
        ids = [r["id"] for r in expired.select("id").collect()]
        if ids:
            self.collection.delete(ids=ids)
        return len(ids)

    def forget(self, memory_id: str) -> bool:
        before = self.collection.df().filter(
            F.col("id") == memory_id).count()
        if before:
            self.collection.delete(ids=[memory_id])
        return bool(before)

    def working_memory(self) -> list[dict]:
        return [r.asDict() for r in self.collection.df().filter(
            F.col("memory_type") == "working").collect()]

    def stats(self) -> dict:
        """MemoryStats (:330-350) in one aggregation."""
        rows = (self.collection.df().groupBy("memory_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.avg("importance").alias("avg_imp")).collect())
        by_type = {r["memory_type"]: r["n"] for r in rows}
        total = sum(by_type.values())
        return {
            "total_memories": total,
            "by_type": by_type,
            "total_recalls": self.total_recalls,
            "recall_hits": self.recall_hits,
            "consolidations": self.consolidations,
        }
