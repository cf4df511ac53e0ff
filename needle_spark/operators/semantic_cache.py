"""Semantic query cache (reference: /root/reference/src/search/
semantic_cache.rs, config collection/config.rs:97-135): serve cached
results when a NEW query vector is within a similarity threshold of a
PREVIOUSLY answered one.

Spark shape: the cache is a small driver-side store of
(query_vector, result rows); lookup is a numpy nearest-neighbor over the
cached query matrix (caches hold ~1e2-1e4 entries — driver scale by
construction).  The expensive thing being saved is the cluster-wide
scan, so a driver-side index is the right altitude.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np


class ExactQueryCache:
    """Exact query-result cache (reference: src/collection/cache.rs —
    sharded exact cache keyed by query signature).  Keys are
    (rounded query vector, k, metric, filter-json); values are collected
    result rows.  Invalidate on collection version change."""

    def __init__(self, max_entries: int = 1000, round_decimals: int = 9):
        self.max_entries = max_entries
        self.round_decimals = round_decimals
        self._store: dict = {}
        self.hits = 0
        self.misses = 0

    def _key(self, query_vector, k, metric, filter_doc, version):
        import json as _json

        qv = tuple(round(float(x), self.round_decimals) for x in query_vector)
        f = _json.dumps(filter_doc, sort_keys=True) if filter_doc else ""
        return (qv, int(k), metric, f, version)

    def get(self, query_vector, k, metric="cosine", filter_doc=None, version=0):
        key = self._key(query_vector, k, metric, filter_doc, version)
        if key in self._store:
            self.hits += 1
            return self._store[key]
        self.misses += 1
        return None

    def put(self, result, query_vector, k, metric="cosine", filter_doc=None, version=0):
        if len(self._store) >= self.max_entries:
            self._store.pop(next(iter(self._store)))  # FIFO
        self._store[self._key(query_vector, k, metric, filter_doc, version)] = result

    def stats(self):
        return {"entries": len(self._store), "hits": self.hits, "misses": self.misses}


class SemanticCache:
    def __init__(self, similarity_threshold: float = 0.98, max_entries: int = 1000):
        self.threshold = similarity_threshold
        self.max_entries = max_entries
        self._vecs: list[np.ndarray] = []
        self._results: list[Any] = []
        self.hits = 0
        self.misses = 0

    def _best(self, qv: np.ndarray) -> tuple[int, float]:
        M = np.asarray(self._vecs)
        nm = np.linalg.norm(M, axis=1) * (np.linalg.norm(qv) or 1.0)
        sims = np.where(nm == 0, 0.0, (M @ qv) / np.where(nm == 0, 1.0, nm))
        i = int(np.argmax(sims))
        return i, float(sims[i])

    def lookup(self, query_vector: Sequence[float]):
        """Return the cached result if a stored query is similar enough,
        else None."""
        if not self._vecs:
            self.misses += 1
            return None
        qv = np.asarray(query_vector, dtype=np.float64)
        i, sim = self._best(qv)
        if sim >= self.threshold:
            self.hits += 1
            return self._results[i]
        self.misses += 1
        return None

    def store(self, query_vector: Sequence[float], result: Any) -> None:
        if any(not math.isfinite(x) for x in query_vector):
            raise ValueError("non-finite query vector")
        self._vecs.append(np.asarray(query_vector, dtype=np.float64))
        self._results.append(result)
        if len(self._vecs) > self.max_entries:  # FIFO eviction
            self._vecs.pop(0)
            self._results.pop(0)

    def cached_knn(self, df, query_vector, k=10, **knn_kwargs):
        """knn with cache-aside: hit -> stored rows, miss -> run + store.
        Results are collected rows (the cache serves materialized
        answers, not plans)."""
        from needle_spark.operators.knn import knn

        hit = self.lookup(query_vector)
        if hit is not None:
            return hit
        rows = knn(df, query_vector, k=k, **knn_kwargs).collect()
        self.store(query_vector, rows)
        return rows

    def stats(self) -> dict:
        return {"entries": len(self._vecs), "hits": self.hits, "misses": self.misses}
