"""Workload-driven adaptive index selection with migration planning.

Reference: /root/reference/src/services/search/adaptive_index_selector.rs
— WorkloadProfile observations (:39-61), latency percentile tracking
(:131-153), recommend (:204-310: size/workload/memory/budget/latency
scoring, confidence = max_score/6, suggested parameters per strategy),
should_migrate (:154), migration_plan (:310).

Strategy mapping (this engine has no HNSW/DiskANN — Spark's physical
options replace them, same decision problem):
- `brute_force`      exact TakeOrdered scan (reference BruteForce/Hnsw
                     territory — Spark's fused scan is the low-latency
                     exact path at these sizes)
- `filter_then_scan` pushed-down predicate + exact scan (HnswPreFilter)
- `ivf`              KMeans-partitioned parquet with partition pruning
                     (reference Ivf and the disk-based DiskAnn role —
                     IVF-on-parquet IS disk-native search)
- `ivf_quantized`    IVF + SQ8/PQ codes (HnswQuantized role: memory-
                     bound corpora)
"""

from __future__ import annotations

from dataclasses import dataclass, field

QUERY_TYPES = ("point", "batch", "filtered", "range", "hybrid")


@dataclass
class WorkloadProfile:
    """adaptive_index_selector.rs:39-61."""

    query_type: str
    dims: int
    k: int
    selectivity: float | None = None
    batch_size: int = 1

    @classmethod
    def point_query(cls, dims: int, k: int) -> "WorkloadProfile":
        return cls("point", dims, k)

    @classmethod
    def filtered_query(cls, dims: int, k: int, selectivity: float) -> "WorkloadProfile":
        return cls("filtered", dims, k, selectivity=selectivity)

    @classmethod
    def batch_query(cls, dims: int, k: int, batch: int) -> "WorkloadProfile":
        return cls("batch", dims, k, batch_size=batch)


@dataclass
class SelectionResult:
    """:64-72."""

    strategy: str
    confidence: float
    rationale: list[str]
    alternatives: list[tuple[str, float]]
    suggested_params: dict[str, str]


@dataclass
class MigrationPlan:
    """:74-81."""

    from_strategy: str
    to_strategy: str
    steps: list[str]
    estimated_minutes: float
    downtime_free: bool = True


class AdaptiveSelector:
    """:105-360 — observe workload, recommend, plan migrations."""

    def __init__(self, max_observations: int = 10_000):
        self.observations: list[WorkloadProfile] = []
        self.max_observations = max_observations
        self.current_strategy: str | None = None
        self.memory_budget_bytes: int | None = None
        self.latency_target_ms: float | None = None
        self.latency_samples: list[float] = []

    def with_memory_budget(self, bytes_: int) -> "AdaptiveSelector":
        self.memory_budget_bytes = bytes_
        return self

    def with_latency_target(self, ms: float) -> "AdaptiveSelector":
        self.latency_target_ms = ms
        return self

    def observe_query(self, profile: WorkloadProfile) -> None:
        if profile.query_type not in QUERY_TYPES:
            raise ValueError(f"unknown query type: {profile.query_type!r}")
        self.observations.append(profile)
        del self.observations[:-self.max_observations]

    def record_latency(self, latency_ms: float) -> None:
        self.latency_samples.append(float(latency_ms))
        del self.latency_samples[:-self.max_observations]

    def latency_stats(self) -> tuple[float, float, float] | None:
        """(p50, p95, p99) — :139-153."""
        if not self.latency_samples:
            return None
        s = sorted(self.latency_samples)

        def pct(p: float) -> float:
            return s[min(int(len(s) * p), len(s) - 1)]

        return pct(0.50), pct(0.95), pct(0.99)

    # ----------------------------------------------------- recommend --
    def recommend(self, vector_count: int, dimensions: int) -> SelectionResult:
        scores: dict[str, float] = {}
        rationale: list[str] = []

        def bump(strategy: str, amt: float) -> None:
            scores[strategy] = scores.get(strategy, 0.0) + amt

        # size-based scoring (:209-222), on Spark's cost cliffs: exact
        # scans win far later than single-node engines
        if vector_count < 100_000:
            bump("brute_force", 3.0)
            rationale.append(
                f"Small dataset ({vector_count} vectors): exact scan optimal")
        elif vector_count < 10_000_000:
            bump("ivf", 2.0)
            bump("ivf_quantized", 2.5)
            rationale.append(
                "Large dataset: IVF (+quantization for memory efficiency)")
        else:
            bump("ivf", 3.0)
            rationale.append(
                "Very large dataset: IVF-partitioned parquet (disk-native search)")

        # workload-based scoring (:224-237)
        total = max(len(self.observations), 1)
        filtered_ratio = sum(
            1 for o in self.observations if o.query_type == "filtered") / total
        batch_ratio = sum(
            1 for o in self.observations if o.query_type == "batch") / total
        if filtered_ratio > 0.5:
            bump("filter_then_scan", 1.0)
            rationale.append(
                f"{filtered_ratio * 100:.0f}% filtered queries: pushed-down "
                "filter-then-scan")
        if batch_ratio > 0.3:
            bump("ivf", 1.0)
            rationale.append(
                f"{batch_ratio * 100:.0f}% batch queries: IVF amortizes probes")

        # memory scoring (:239-258)
        mem_gb = vector_count * dimensions * 4.0 / (1 << 30)
        if mem_gb > 4.0:
            bump("ivf_quantized", 2.0)
            rationale.append(f"Memory {mem_gb:.1f}GB: quantization reduces by 4x")
        if self.memory_budget_bytes is not None:
            est = vector_count * dimensions * 4
            if est > self.memory_budget_bytes:
                bump("ivf_quantized", 3.0)
                bump("ivf", 2.0)
                rationale.append(
                    f"Exceeds memory budget ({est / 1048576:.0f}MB > "
                    f"{self.memory_budget_bytes / 1048576:.0f}MB): prefer "
                    "quantized/disk")

        # latency target (:260-272)
        if self.latency_target_ms is not None:
            stats = self.latency_stats()
            if stats and stats[0] > self.latency_target_ms:
                bump("ivf", 1.5)
                rationale.append(
                    f"Latency p50 {stats[0]:.1f}ms > target "
                    f"{self.latency_target_ms:.1f}ms: prefer pruned probes")

        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        best, max_score = ranked[0] if ranked else ("brute_force", 1.0)
        params: dict[str, str] = {}
        if best in ("ivf", "ivf_quantized"):
            nlist = min(max(int(vector_count ** 0.5), 16), 65536)
            params["nlist"] = str(nlist)
            params["nprobe"] = str(min(max(nlist // 10, 1), 256))
            if best == "ivf_quantized":
                params["quantizer"] = "sq8"
        return SelectionResult(
            strategy=best,
            confidence=min(max_score / 6.0, 1.0),
            rationale=rationale,
            alternatives=ranked[1:],
            suggested_params=params,
        )

    def should_migrate(self, vector_count: int,
                       dimensions: int) -> SelectionResult | None:
        """:154 — a recommendation differing from the current strategy."""
        rec = self.recommend(vector_count, dimensions)
        if self.current_strategy is None or rec.strategy == self.current_strategy:
            return None
        return rec

    def migration_plan(self, from_strategy: str, to_strategy: str,
                       vector_count: int) -> MigrationPlan:
        """:310 — zero-downtime online migration: versioned catalog
        commits make the cutover a manifest flip."""
        steps = [
            f"snapshot current collection (named snapshot 'pre-{to_strategy}')",
            f"build {to_strategy} layout as a new table version "
            "(partitionBy/encode job)",
            "tail the CDC log into the new layout until caught up",
            "replay recorded queries against both layouts; gate on recall",
            "flip the manifest pointer (atomic), keep the snapshot for rollback",
        ]
        minutes = max(0.5, vector_count / 2_000_000)  # ~2M rows/min rebuild
        return MigrationPlan(
            from_strategy=from_strategy, to_strategy=to_strategy,
            steps=steps, estimated_minutes=minutes, downtime_free=True,
        )
