"""Query profiling + plan-shape optimization hints.

Reference: /root/reference/src/observe/profiler.rs — OptimizationHint /
HintSeverity (:254-277), QueryProfile with explain / explain_analyze
(:280-405), QueryProfiler (:407+), PlanNode.format_tree (:215).

Spark mapping: the physical plan IS the profile's plan tree (Catalyst
formatted explain), so hints are derived from the plan text — the
exact signals this repo's PLANS.md audits by hand: sort-merge joins
that could broadcast, cartesian products, row-at-a-time Python in a
hot path, filters that did not reach the Parquet scan, exchange
counts, full-width scans.  Stage-level execution evidence comes from
the SparkContext status tracker under a per-profile job group: task
counts per stage plus wall time (per-stage CPU time needs the Spark
event log / REST API in production — documented on StageTiming)."""

from __future__ import annotations

import re
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from needle_spark.plans.planner import explain_text

SEVERITIES = ("info", "warning", "critical")


@dataclass
class OptimizationHint:
    """profiler.rs:254-266."""

    severity: str
    category: str
    message: str
    suggestion: str
    estimated_improvement: float | None = None


@dataclass
class StageTiming:
    """profiler.rs:101-123.  Spark's status tracker exposes per-stage
    task counts; duration_us covers the whole action (per-stage wall
    time requires the event log / REST API outside local mode)."""

    stage_id: int
    name: str
    num_tasks: int
    num_completed: int
    num_failed: int


@dataclass
class QueryProfile:
    """profiler.rs:280-330."""

    query_id: str
    query_desc: str = ""
    total_time_us: int = 0
    plan: str = ""
    stages: list[StageTiming] = field(default_factory=list)
    hints: list[OptimizationHint] = field(default_factory=list)
    result_count: int = 0
    metrics: dict[str, float] = field(default_factory=dict)

    def explain(self) -> str:
        """profiler.rs:327-391 EXPLAIN formatting."""
        out = [f"Query Profile: {self.query_id}",
               f"Total Time: {self.total_time_us / 1000.0:.3f} ms",
               f"Results: {self.result_count}", ""]
        if self.plan:
            out += ["Execution Plan:", self.plan, ""]
        out.append("Stage Breakdown:")
        for s in self.stages:
            out.append(f"  stage {s.stage_id:<4} {s.name[:50]:<50} "
                       f"{s.num_completed}/{s.num_tasks} tasks"
                       + (f" ({s.num_failed} failed)" if s.num_failed else ""))
        if self.hints:
            out.append("\nOptimization Hints:")
            tag = {"info": "INFO", "warning": "WARN", "critical": "CRIT"}
            for h in self.hints:
                out.append(f"  [{tag[h.severity]}] {h.category}: {h.message}")
                out.append(f"        -> {h.suggestion}")
        return "\n".join(out)

    def explain_analyze(self) -> str:
        """profiler.rs:393-405: explain + the detailed metric map."""
        out = self.explain() + "\n\n--- Detailed Metrics ---"
        for k in sorted(self.metrics):
            out += f"\n  {k}: {self.metrics[k]:.4f}"
        return out


# ===================================================================
# Plan-shape hints
# ===================================================================

def analyze_plan(df: DataFrame, *,
                 plan_text: str | None = None) -> list[OptimizationHint]:
    """Derive optimization hints from the formatted physical plan —
    the automated version of the PLANS.md audit this repo runs per
    round.  Pure plan-text analysis: no job is executed.  Pass
    `plan_text` when the caller already rendered the formatted plan
    (profile() does) to avoid a second explain pass."""
    p = plan_text if plan_text is not None \
        else explain_text(df, mode="formatted")
    hints: list[OptimizationHint] = []

    if "CartesianProduct" in p:
        hints.append(OptimizationHint(
            "critical", "join",
            "CartesianProduct in the plan: output rows = |left| x |right|",
            "Add an equi-join key, or broadcast() the small side to get a "
            "BroadcastNestedLoopJoin at worst"))
    # count details headers "(N) SortMergeJoin" — the tree line AND
    # the details section each mention the node, so a raw substring
    # count reports 2x the real joins
    n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p))
    if n_smj == 0 and "SortMergeJoin" in p:  # simple-mode plan text
        n_smj = p.count("SortMergeJoin")
    if n_smj:
        hints.append(OptimizationHint(
            "warning", "join",
            f"{n_smj} SortMergeJoin(s): both sides shuffle AND sort on the key",
            "broadcast() the small side if it fits the driver; pre-bucket "
            "both tables on the join key to drop the exchange entirely",
            estimated_improvement=0.3))
    if "BatchEvalPython" in p:
        hints.append(OptimizationHint(
            "critical", "python",
            "Row-at-a-time Python UDF in the plan (BatchEvalPython): "
            "~10-100x slower than Arrow or built-ins",
            "Rewrite with pyspark.sql.functions, or at minimum a pandas_udf "
            "(ArrowEvalPython)"))
    if "ArrowEvalPython" in p or "FlatMapGroupsInPandas" in p or \
            "MapInPandas" in p or "PythonMapInArrow" in p:
        hints.append(OptimizationHint(
            "info", "python",
            "Arrow-batched Python stage present",
            "Fine where built-ins can't express the kernel; keep it off the "
            "per-row hot path"))
    # filters that stayed above the scan instead of pushing down
    if "PushedFilters: []" in p and re.search(r"\(\d+\) Filter", p):
        hints.append(OptimizationHint(
            "warning", "pushdown",
            "A Parquet scan has no pushed filters while the plan "
            "filters rows above it",
            "Express the predicate on raw columns (not UDF output) so "
            "Catalyst can push it into the scan"))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
    if n_exchange >= 4:
        hints.append(OptimizationHint(
            "warning", "shuffle",
            f"{n_exchange} exchanges: each one is a full shuffle of its input",
            "Reuse one partitioning across stages (repartition once on the "
            "common key) or pre-bucket the storage",
            estimated_improvement=0.2))
    elif n_exchange:
        hints.append(OptimizationHint(
            "info", "shuffle", f"{n_exchange} exchange(s) in the plan",
            "Expected for joins/aggregations; verify AQE coalesces the "
            "partitions (spark.sql.adaptive.enabled)"))
    # full-width scans under narrow projections.  ReadSchema is its
    # own line in the details section — it is NEVER on the "Scan
    # parquet" header line, so it must be matched over the whole text.
    for rs in re.findall(r"ReadSchema: struct<([^>]*)>", p):
        if rs.count(",") + 1 > 24:
            hints.append(OptimizationHint(
                "info", "pruning",
                "A scan reads >24 columns — check column pruning survived",
                "Select only needed columns before wide transforms"))
            break
    if "InMemoryTableScan" in p:
        hints.append(OptimizationHint(
            "info", "cache", "Plan reads a cached relation",
            "Confirm the cache is still warranted at production scale "
            "(executor storage memory)"))
    return hints


# ===================================================================
# Profiler (profiler.rs:407+)
# ===================================================================

class QueryProfiler:
    """Profile DataFrame actions: wall time, result count, per-stage
    task counts (status tracker under a job group), the physical plan,
    and plan-shape hints.  Keeps a bounded history like the reference's
    ProfilerConfig.max_profiles."""

    def __init__(self, max_profiles: int = 100):
        self.max_profiles = int(max_profiles)
        self.history: list[QueryProfile] = []

    def profile(self, df: DataFrame, query_id: str | None = None,
                query_desc: str = "", action=None) -> QueryProfile:
        """Run `action(df)` (default: collect) inside a job group and
        assemble the QueryProfile."""
        qid = query_id or f"q-{uuid.uuid4().hex[:8]}"
        sc = df.sparkSession.sparkContext
        group = f"profile-{qid}"
        plan = explain_text(df, mode="formatted")
        hints = analyze_plan(df, plan_text=plan)
        sc.setJobGroup(group, query_desc or qid)
        t0 = time.time()
        try:
            result = (action or (lambda d: d.collect()))(df)
        finally:
            sc.setJobGroup(None, None)
        elapsed_us = int((time.time() - t0) * 1e6)

        stages: list[StageTiming] = []
        tracker = sc.statusTracker()
        try:
            for job_id in tracker.getJobIdsForGroup(group):
                info = tracker.getJobInfo(job_id)
                if info is None:
                    continue
                for sid in info.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is None:
                        continue
                    stages.append(StageTiming(
                        stage_id=sid, name=si.name,
                        num_tasks=si.numTasks,
                        num_completed=si.numCompletedTasks,
                        num_failed=si.numFailedTasks))
        except Exception:  # status tracker variations across masters
            pass

        n = len(result) if isinstance(result, list) else 0
        prof = QueryProfile(
            query_id=qid, query_desc=query_desc,
            total_time_us=elapsed_us, plan=plan, stages=stages,
            hints=hints, result_count=n,
            metrics={
                "stages": float(len(stages)),
                "tasks": float(sum(s.num_tasks for s in stages)),
                "wall_ms": elapsed_us / 1000.0,
                "hints_critical": float(
                    sum(1 for h in hints if h.severity == "critical")),
            })
        self.history.append(prof)
        del self.history[: max(0, len(self.history) - self.max_profiles)]
        return prof

    def slowest(self, limit: int = 5) -> list[QueryProfile]:
        return sorted(self.history, key=lambda p: -p.total_time_us)[:limit]
