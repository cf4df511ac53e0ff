"""Query recording + replay regression testing.

Reference: /root/reference/src/services/search/query_replay.rs —
RecordedQuery (:42-75), QueryRecorder with bounded buffer + sampling
(:80-160, serialize :141-158), QueryReplayer (:205-236) and
ReplayReport (:183-320): per-query recall@k vs the recorded results,
latency deltas, regression counting against a recall threshold.

Spark fit: record production queries once, replay them after an index
rebuild / quantization change / Spark upgrade, and gate the rollout on
the report — the same harness this repo uses for IVF recall, packaged
as an operator.  Sampling is seeded for determinism."""

from __future__ import annotations

import json
import random
import time
from dataclasses import dataclass, field


@dataclass
class RecordedQuery:
    """query_replay.rs:42-75."""

    collection: str
    query: list[float]
    k: int
    results: list[tuple[str, float]]  # (id, distance)
    latency_ms: float
    timestamp: int = 0

    def __post_init__(self):
        if not self.timestamp:
            self.timestamp = int(time.time())


class QueryRecorder:
    """Bounded, optionally sampling recorder (:80-160)."""

    def __init__(self, max_queries: int = 1000, sample_rate: float = 1.0,
                 seed: int | None = None):
        self.max_queries = max_queries
        self.sample_rate = sample_rate
        self._rng = random.Random(seed)
        self._queries: list[RecordedQuery] = []

    def record(self, query: RecordedQuery) -> bool:
        if self.sample_rate < 1.0 and self._rng.random() > self.sample_rate:
            return False
        if len(self._queries) >= self.max_queries:
            self._queries.pop(0)
        self._queries.append(query)
        return True

    @property
    def queries(self) -> list[RecordedQuery]:
        return list(self._queries)

    def __len__(self) -> int:
        return len(self._queries)

    def clear(self) -> None:
        self._queries.clear()

    def to_json(self) -> str:
        """serialize (:141)."""
        return json.dumps([
            {"collection": q.collection, "query": q.query, "k": q.k,
             "results": [[i, d] for i, d in q.results],
             "latency_ms": q.latency_ms, "timestamp": q.timestamp}
            for q in self._queries
        ])

    @classmethod
    def from_json(cls, data: str, max_queries: int = 1000) -> "QueryRecorder":
        rec = cls(max_queries=max_queries)
        for q in json.loads(data)[:max_queries]:
            rec._queries.append(RecordedQuery(
                collection=q["collection"], query=q["query"], k=q["k"],
                results=[(i, float(d)) for i, d in q["results"]],
                latency_ms=q["latency_ms"], timestamp=q["timestamp"],
            ))
        return rec


@dataclass
class ReplayResult:
    """:162-180."""

    index: int
    recall: float
    original_latency_ms: float
    new_latency_ms: float
    latency_change_pct: float
    missing_ids: list[str]
    new_ids: list[str]


@dataclass
class ReplayReport:
    """:183-205."""

    total_queries: int
    avg_recall: float
    min_recall: float
    avg_latency_change_pct: float
    regressions: int
    details: list[ReplayResult]
    regression_threshold: float
    passed: bool


class QueryReplayer:
    """Replay recorded queries and diff the answers (:205-320)."""

    def __init__(self, queries: list[RecordedQuery],
                 regression_threshold: float = 0.8):
        self.original = list(queries)
        self.results: list[tuple[list[tuple[str, float]], float] | None] = \
            [None] * len(self.original)
        self.regression_threshold = regression_threshold

    def add_result(self, index: int, new_results: list[tuple[str, float]],
                   latency_ms: float) -> None:
        if 0 <= index < len(self.results):
            self.results[index] = (list(new_results), latency_ms)

    def replay_against(self, df, vector_col: str = "vector",
                       id_col: str = "id", metric: str = "cosine") -> None:
        """Convenience executor: run every recorded query as a kNN over
        `df`, timing each (the reference leaves execution to the
        caller; this wires the engine in)."""
        from needle_spark.operators.knn import knn

        for i, q in enumerate(self.original):
            t0 = time.perf_counter()
            rows = knn(df, q.query, k=q.k, metric=metric,
                       vector_col=vector_col, id_col=id_col).collect()
            ms = (time.perf_counter() - t0) * 1000.0
            self.add_result(i, [(str(r[id_col]), float(r["distance"]))
                                for r in rows], ms)

    def report(self) -> ReplayReport:
        details: list[ReplayResult] = []
        total_recall = 0.0
        min_recall = 1.0
        total_latency_change = 0.0
        regressions = 0
        count = 0
        for i, orig in enumerate(self.original):
            if self.results[i] is None:
                continue
            new_results, new_latency = self.results[i]
            orig_ids = {str(x) for x, _ in orig.results}
            new_ids_set = {str(x) for x, _ in new_results}
            overlap = len(orig_ids & new_ids_set)
            recall = 1.0 if not orig_ids else overlap / len(orig_ids)
            latency_change = (
                (new_latency - orig.latency_ms) / orig.latency_ms * 100.0
                if orig.latency_ms > 0 else 0.0)
            if recall < self.regression_threshold:
                regressions += 1
            total_recall += recall
            min_recall = min(min_recall, recall)
            total_latency_change += latency_change
            count += 1
            details.append(ReplayResult(
                index=i, recall=recall,
                original_latency_ms=orig.latency_ms,
                new_latency_ms=new_latency,
                latency_change_pct=latency_change,
                missing_ids=sorted(orig_ids - new_ids_set),
                new_ids=sorted(new_ids_set - orig_ids),
            ))
        return ReplayReport(
            total_queries=count,
            avg_recall=(total_recall / count) if count else 1.0,
            min_recall=min_recall,
            avg_latency_change_pct=(total_latency_change / count) if count else 0.0,
            regressions=regressions,
            details=details,
            regression_threshold=self.regression_threshold,
            passed=regressions == 0,
        )
