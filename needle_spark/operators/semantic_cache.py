"""Semantic query cache (reference: /root/reference/src/services/ai/
semantic_cache.rs; exact cache src/collection/cache.rs, config
collection/config.rs:97-135): serve cached results when a NEW query
vector is within a similarity threshold of a PREVIOUSLY answered one.

Ported behavior surface (semantic_cache.rs):
- CacheConfig (:69-130): threshold, per-entry TTL, max entries,
  eviction policy (LRU / LFU / FIFO, default LFU).
- get (:286-348): nearest-entry match with optional threshold
  override; expired entries removed on touch; hit counts + running
  average hit distance.
- put with eviction (:232-286), invalidate (:348), clear (:361),
  sweep_expired (:388), invalidate_for_vector (:461),
  invalidate_drifted (:491 — drop entries farther than a drift
  threshold from every reference embedding), warm_up (:551),
  CacheAnalytics (:172-205) with hit_rate and estimated savings.

Spark shape: the cache is a small driver-side store of
(query_vector, result rows); lookup is a numpy nearest-neighbor over
the cached query matrix (caches hold ~1e2-1e4 entries — driver scale
by construction).  The expensive thing being saved is the cluster-wide
scan, so a driver-side index is the right altitude.  `now` is
injectable everywhere for deterministic tests.
"""

from __future__ import annotations

import math
import time as _time
from dataclasses import dataclass, field
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


@dataclass
class CacheEntry:
    """semantic_cache.rs:134-152."""

    entry_id: str
    vec: np.ndarray
    response: Any
    query_text: str | None = None
    model: str | None = None
    created_at: int = 0
    expires_at: int | None = None
    hit_count: int = 0
    last_access: int = 0
    insert_seq: int = 0


@dataclass
class CacheAnalytics:
    """semantic_cache.rs:172-205."""

    total_lookups: int = 0
    total_hits: int = 0
    total_misses: int = 0
    total_expirations: int = 0
    avg_hit_distance: float = 0.0

    def hit_rate(self) -> float:
        return (self.total_hits / self.total_lookups) if self.total_lookups else 0.0

    def estimated_savings_usd(self, cost_per_query: float) -> float:
        return self.total_hits * float(cost_per_query)


@dataclass
class CacheHit:
    """semantic_cache.rs:155-168."""

    response: Any
    distance: float
    cached_query: str | None
    entry_id: str
    model: str | None = None


class SemanticCache:
    """Similarity cache with TTL, eviction policies, drift
    invalidation, and analytics (semantic_cache.rs:207-560).

    `similarity_threshold` keeps this module's cosine-SIMILARITY
    convention (>= threshold is a hit); the reference's distance
    threshold 0.15 corresponds to similarity 0.85."""

    def __init__(self, similarity_threshold: float = 0.98,
                 max_entries: int = 1000,
                 default_ttl_seconds: int | None = None,
                 eviction_policy: str = "lfu"):
        if eviction_policy not in ("lru", "lfu", "fifo"):
            raise ValueError(f"unknown eviction policy: {eviction_policy!r}")
        self.threshold = similarity_threshold
        self.max_entries = max_entries
        self.default_ttl = default_ttl_seconds
        self.eviction_policy = eviction_policy
        self.entries: dict[str, CacheEntry] = {}
        self.analytics = CacheAnalytics()
        self._seq = 0

    # kept for backward compatibility with the round-1 API
    @property
    def hits(self) -> int:
        return self.analytics.total_hits

    @property
    def misses(self) -> int:
        return self.analytics.total_misses

    @staticmethod
    def _now(now) -> int:
        return int(now) if now is not None else int(_time.time())

    def _best(self, qv: np.ndarray) -> tuple[str, float]:
        ids = list(self.entries)
        M = np.asarray([self.entries[i].vec for i in ids])
        nm = np.linalg.norm(M, axis=1) * (np.linalg.norm(qv) or 1.0)
        sims = np.where(nm == 0, 0.0, (M @ qv) / np.where(nm == 0, 1.0, nm))
        j = int(np.argmax(sims))
        return ids[j], float(sims[j])

    def lookup(self, query_vector: Sequence[float], now: int | None = None,
               threshold_override: float | None = None,
               detailed: bool = False):
        """Nearest-entry lookup (get :286): a hit requires similarity
        >= threshold AND a live TTL; expired entries are removed on
        touch.  `detailed=True` returns a CacheHit instead of the bare
        response."""
        self.analytics.total_lookups += 1
        if not self.entries:
            self.analytics.total_misses += 1
            return None
        t = self._now(now)
        qv = np.asarray(query_vector, dtype=np.float64)
        eid, sim = self._best(qv)
        threshold = threshold_override if threshold_override is not None else self.threshold
        if sim >= threshold:
            e = self.entries[eid]
            if e.expires_at is not None and t > e.expires_at:
                self.analytics.total_expirations += 1
                self.analytics.total_misses += 1
                del self.entries[eid]
                return None
            e.hit_count += 1
            e.last_access = t
            self.analytics.total_hits += 1
            h = self.analytics.total_hits
            dist = 1.0 - sim
            self.analytics.avg_hit_distance = (
                self.analytics.avg_hit_distance * ((h - 1) / h) + dist / h)
            if detailed:
                return CacheHit(response=e.response, distance=dist,
                                cached_query=e.query_text, entry_id=eid,
                                model=e.model)
            return e.response
        self.analytics.total_misses += 1
        return None

    def _evict_one(self) -> None:
        key = {
            "lru": lambda e: (e.last_access, e.insert_seq),
            "lfu": lambda e: (e.hit_count, e.insert_seq),
            "fifo": lambda e: e.insert_seq,
        }[self.eviction_policy]
        victim = min(self.entries.values(), key=key)
        del self.entries[victim.entry_id]

    def store(self, query_vector: Sequence[float], result: Any,
              query_text: str | None = None, model: str | None = None,
              ttl_seconds: int | None = None, now: int | None = None) -> str:
        """put (:232): stores with optional per-entry TTL (falling back
        to the config default); evicts by policy when full.  Returns
        the entry id."""
        if any(not math.isfinite(x) for x in query_vector):
            raise ValueError("non-finite query vector")
        t = self._now(now)
        ttl = ttl_seconds if ttl_seconds is not None else self.default_ttl
        if len(self.entries) >= self.max_entries:
            self._evict_one()
        self._seq += 1
        eid = f"entry_{self._seq}"
        self.entries[eid] = CacheEntry(
            entry_id=eid, vec=np.asarray(query_vector, dtype=np.float64),
            response=result, query_text=query_text, model=model,
            created_at=t, expires_at=(t + ttl) if ttl is not None else None,
            last_access=t, insert_seq=self._seq,
        )
        return eid

    # -------------------------------------------------- invalidation --
    def invalidate(self, entry_id: str) -> bool:
        """:348."""
        return self.entries.pop(entry_id, None) is not None

    def clear(self) -> None:
        self.entries.clear()

    def sweep_expired(self, now: int | None = None) -> int:
        """:388 — remove every expired entry."""
        t = self._now(now)
        dead = [i for i, e in self.entries.items()
                if e.expires_at is not None and t > e.expires_at]
        for i in dead:
            del self.entries[i]
        self.analytics.total_expirations += len(dead)
        return len(dead)

    def invalidate_drifted(self, reference_embeddings: Sequence[Sequence[float]],
                           drift_threshold: float) -> int:
        """:491 — drop entries whose MIN cosine distance to every
        reference embedding exceeds the drift threshold (the corpus has
        moved; those cached answers are stale)."""
        if not len(reference_embeddings) or not self.entries:
            return 0
        R = np.asarray(reference_embeddings, dtype=np.float64)
        rn = np.linalg.norm(R, axis=1)
        stale = []
        for eid, e in self.entries.items():
            en = np.linalg.norm(e.vec) or 1.0
            denom = np.where(rn * en == 0, 1.0, rn * en)
            sims = (R @ e.vec) / denom
            if 1.0 - float(np.max(sims)) > drift_threshold:
                stale.append(eid)
        for eid in stale:
            del self.entries[eid]
        return len(stale)

    def warm_up(self, items: Sequence[tuple[Sequence[float], Any]],
                now: int | None = None) -> int:
        """:551 — pre-populate from known (query_vector, response)
        pairs."""
        for qv, resp in items:
            self.store(qv, resp, now=now)
        return len(items)

    # -------------------------------------------------------- execute --
    def cached_knn(self, df, query_vector, k=10, now: int | None = None,
                   **knn_kwargs):
        """knn with cache-aside: hit -> stored rows, miss -> run + store.
        Results are collected rows (the cache serves materialized
        answers, not plans)."""
        from needle_spark.operators.knn import knn

        hit = self.lookup(query_vector, now=now)
        if hit is not None:
            return hit
        rows = knn(df, query_vector, k=k, **knn_kwargs).collect()
        self.store(query_vector, rows, now=now)
        return rows

    def stats(self) -> dict:
        return {"entries": len(self.entries), "hits": self.hits,
                "misses": self.misses}

    def stats_summary(self) -> dict:
        """:535 — analytics snapshot."""
        a = self.analytics
        return {
            "entries": len(self.entries),
            "total_lookups": a.total_lookups,
            "total_hits": a.total_hits,
            "total_misses": a.total_misses,
            "total_expirations": a.total_expirations,
            "hit_rate": a.hit_rate(),
            "avg_hit_distance": a.avg_hit_distance,
            "eviction_policy": self.eviction_policy,
        }
