"""Embedding provider routing: health-aware selection across providers
with cost/latency strategies, per-collection pins, and fallback.

Reference: /root/reference/src/services/embedding/embedding_router.rs —
RouterConfig/RoutingStrategy (:33-66: priority_chain / lowest_cost /
lowest_latency / round_robin), ProviderEntry with health tracking
(:70-126: consecutive-failure unhealthy marking, EMA latency),
route (:165-207: pin first, then strategy over healthy providers),
record_success/record_failure (:209-224), stats (:226-250).

Spark mapping: routing is driver-side control-plane state (providers
are API endpoints, not data); the routed provider's embed function
runs as the usual Arrow-batched pandas UDF over the corpus
(operators/federated.embedding_provider_udf), so the router decides
WHICH closure ships to executors.  `embed_with_fallback` wraps a
document batch embed with automatic failover down the healthy chain —
per-BATCH failover, not per-row, so one flaky provider can't melt a
100 TB ingest."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

STRATEGIES = ("priority_chain", "lowest_cost", "lowest_latency",
              "round_robin")


@dataclass
class ProviderEntry:
    """embedding_router.rs:70-126."""

    name: str
    dimensions: int
    cost_per_token: float
    embed_fn: object = None          # text -> vector callable
    healthy: bool = True
    avg_latency_ms: float = 0.0
    consecutive_failures: int = 0
    total_calls: int = 0

    def record_success(self, latency_ms: float) -> None:
        self.total_calls += 1
        self.consecutive_failures = 0
        self.healthy = True
        # EMA like the reference
        self.avg_latency_ms = (0.8 * self.avg_latency_ms + 0.2 * latency_ms
                               if self.total_calls > 1 else latency_ms)

    def record_failure(self, max_failures: int) -> None:
        self.total_calls += 1
        self.consecutive_failures += 1
        if self.consecutive_failures >= max_failures:
            self.healthy = False


@dataclass
class RouterConfig:
    """embedding_router.rs:33-53."""

    max_failures: int = 3
    strategy: str = "priority_chain"

    def __post_init__(self):
        if self.strategy not in STRATEGIES:
            raise ValueError(f"unknown routing strategy: {self.strategy!r}")


class EmbeddingRouter:
    """embedding_router.rs:128-250."""

    def __init__(self, config: RouterConfig | None = None):
        self.config = config or RouterConfig()
        self._providers: list[ProviderEntry] = []
        self._pins: dict[str, str] = {}
        self._rr = 0

    def register(self, entry: ProviderEntry) -> None:
        self._providers = [p for p in self._providers
                           if p.name != entry.name] + [entry]

    def pin_collection(self, collection: str, provider: str) -> None:
        self._pins[collection] = provider

    def unpin_collection(self, collection: str) -> None:
        self._pins.pop(collection, None)

    def get(self, name: str) -> ProviderEntry | None:
        return next((p for p in self._providers if p.name == name), None)

    # -------------------------------------------------------- route --
    def route(self, collection: str | None = None) -> str | None:
        """Pin first (falls through when unhealthy), then the configured
        strategy over healthy providers (:165-207)."""
        if collection is not None and collection in self._pins:
            p = self.get(self._pins[collection])
            if p is not None and p.healthy:
                return p.name
        healthy = [p for p in self._providers if p.healthy]
        if not healthy:
            return None
        s = self.config.strategy
        if s == "priority_chain":
            return healthy[0].name
        if s == "lowest_cost":
            return min(healthy, key=lambda p: (p.cost_per_token, p.name)).name
        if s == "lowest_latency":
            return min(healthy, key=lambda p: (p.avg_latency_ms, p.name)).name
        idx = self._rr % len(healthy)
        self._rr += 1
        return healthy[idx].name

    def record_success(self, provider: str, latency_ms: float) -> None:
        p = self.get(provider)
        if p is not None:
            p.record_success(latency_ms)

    def record_failure(self, provider: str) -> None:
        p = self.get(provider)
        if p is not None:
            p.record_failure(self.config.max_failures)

    def stats(self) -> list[dict]:
        return [{
            "name": p.name, "dimensions": p.dimensions,
            "healthy": p.healthy, "cost_per_token": p.cost_per_token,
            "avg_latency_ms": p.avg_latency_ms,
            "error_rate": (p.consecutive_failures / p.total_calls
                           if p.total_calls else 0.0),
            "total_calls": p.total_calls,
        } for p in self._providers]

    # ------------------------------------------------- Spark bridge --
    def embed_udf(self, collection: str | None = None):
        """Resolve the routed provider and wrap its embed function as
        the Arrow-batched UDF the ingest pipeline uses."""
        from needle_spark.operators.federated import embedding_provider_udf

        name = self.route(collection)
        if name is None:
            raise RuntimeError("no healthy embedding provider")
        return embedding_provider_udf(self.get(name).embed_fn), name

    def _route_excluding(self, collection: str | None,
                         tried: set[str]) -> str | None:
        """Strategy selection skipping providers already tried THIS
        batch — a transient failure fails over immediately even while
        the provider stays globally healthy."""
        if collection is not None and collection in self._pins:
            p = self.get(self._pins[collection])
            if p is not None and p.healthy and p.name not in tried:
                return p.name
        healthy = [p for p in self._providers
                   if p.healthy and p.name not in tried]
        if not healthy:
            return None
        s = self.config.strategy
        if s == "priority_chain":
            return healthy[0].name
        if s == "lowest_cost":
            return min(healthy, key=lambda p: (p.cost_per_token, p.name)).name
        if s == "lowest_latency":
            return min(healthy, key=lambda p: (p.avg_latency_ms, p.name)).name
        idx = self._rr % len(healthy)
        self._rr += 1
        return healthy[idx].name

    def embed_with_fallback(self, texts: list[str],
                            collection: str | None = None) -> tuple[list, str]:
        """Embed one bounded batch with automatic failover down the
        healthy chain; success/failure feed the health stats.  Each
        provider is tried at most once per batch regardless of its
        global health counters."""
        tried: set[str] = set()
        while True:
            name = self._route_excluding(collection, tried)
            if name is None:
                raise RuntimeError(
                    f"all providers failed for this batch (tried {sorted(tried)})")
            tried.add(name)
            p = self.get(name)
            t0 = time.time()
            try:
                out = [p.embed_fn(t) for t in texts]
            except Exception:  # noqa: BLE001 — fail over, record, retry
                self.record_failure(name)
                continue
            self.record_success(name, (time.time() - t0) * 1000.0)
            return out, name
