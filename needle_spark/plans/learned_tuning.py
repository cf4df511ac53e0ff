"""Learned parameter tuning: UCB1 bandit over ef_search arms, online
latency/recall models, workload profiling, exploit/explore
recommendation (reference:
/root/reference/src/experimental/learned_tuning.rs — TunerConfig
:50-120, QueryFeedback :123-156, RecommendedParams :159-174,
BanditArm + UCB1 :176-214, WorkloadProfile :216-231, OnlineModel
:233-339 (SGD latency regression, logistic recall), LearnedTuner
:359-708 (recommend_params :414-543, record_feedback reward
:544-640, stats :638-686, export/import :708-730), AdaptiveExecutor
:745-810).

Altitude: the tuner is driver-side online state, exactly like the
reference — each sample is O(1) work on scalars, and the thing being
tuned (ef/nprobe for the IVF batch index, `plans/ivf.py`) is consumed
at plan-build time on the driver.  What Spark adds is the WARM START:
`fit_from_log` replays a cluster-sized query history by computing the
bandit-arm reward sums and the workload profile in ONE distributed
aggregation (no sequential replay of millions of rows), then
fine-tunes the SGD models on a bounded driver-side sample.

Exploration randomness is injected (`rng`) so tests and replays are
deterministic.  All formulas/constants mirror the reference lines
cited inline.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field, asdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ARMS = (10, 20, 30, 40, 50, 75, 100, 150, 200, 300, 500)


@dataclass
class TunerConfig:
    """learned_tuning.rs:50-120."""

    learning_rate: float = 0.1
    exploration_rate: float = 0.15
    min_samples: int = 50
    max_history: int = 10_000
    workload_aware: bool = True
    decay_factor: float = 0.99
    target_latency_ms: float | None = None
    target_recall: float | None = 0.95


@dataclass
class QueryFeedback:
    """learned_tuning.rs:123-156."""

    ef_search: int = 50
    k: int = 10
    latency_ms: float = 0.0
    estimated_recall: float = 0.0
    satisfied: bool = True
    query_norm: float = 1.0
    filter_complexity: int = 0
    timestamp: int = 0


@dataclass
class RecommendedParams:
    ef_search: int
    confidence: float
    predicted_latency_ms: float
    predicted_recall: float
    is_exploration: bool
    reasoning: str


@dataclass
class BanditArm:
    """UCB1 arm (learned_tuning.rs:176-214)."""

    ef_search: int
    total_reward: float = 0.0
    pull_count: int = 0
    avg_reward: float = 0.0
    ucb: float = float("inf")

    def update(self, reward: float, total_pulls: int) -> None:
        self.pull_count += 1
        self.total_reward += reward
        self.avg_reward = self.total_reward / self.pull_count
        if total_pulls > 0 and self.pull_count > 0:
            explore = math.sqrt(
                2.0 * math.log(total_pulls) / self.pull_count)
            self.ucb = self.avg_reward + explore


@dataclass
class WorkloadProfile:
    """learned_tuning.rs:216-231."""

    avg_k: float = 0.0
    avg_filter_complexity: float = 0.0
    avg_query_norm: float = 0.0
    query_rate: float = 0.0
    recall_sensitivity: float = 0.0
    latency_sensitivity: float = 0.0


class OnlineModel:
    """SGD latency regression + logistic recall model
    (learned_tuning.rs:233-339), same init weights and updates."""

    def __init__(self, learning_rate: float):
        self.latency_weights = [0.5, 0.02, 0.001, 0.1, 0.01]
        self.recall_weights = [0.5, 0.005, -0.001, 0.1]
        self.learning_rate = float(learning_rate)
        self.sample_count = 0

    def predict_latency(self, ef_search: int, k: int,
                        filter_complexity: int, query_norm: float) -> float:
        feats = [1.0, float(ef_search), float(k),
                 float(filter_complexity), float(query_norm)]
        return sum(f * w for f, w in zip(feats, self.latency_weights))

    def predict_recall(self, ef_search: int, k: int) -> float:
        feats = [1.0, float(ef_search), float(k), math.log(ef_search)]
        raw = sum(f * w for f, w in zip(feats, self.recall_weights))
        return 1.0 / (1.0 + math.exp(-raw))

    def update(self, fb: QueryFeedback) -> None:
        # Documented deviation: the reference's raw SGD step
        # (lr * err * feature, :305-312) diverges for ef_search-scale
        # features — its f32 arithmetic silently saturates to inf.
        # This uses normalized LMS (step scaled by 1/||features||^2),
        # which targets the same least-squares solution and stays
        # finite for any feature magnitude.
        self.sample_count += 1
        err = fb.latency_ms - self.predict_latency(
            fb.ef_search, fb.k, fb.filter_complexity, fb.query_norm)
        feats = [1.0, float(fb.ef_search), float(fb.k),
                 float(fb.filter_complexity), float(fb.query_norm)]
        norm2 = sum(f * f for f in feats)
        for i, f in enumerate(feats):
            self.latency_weights[i] += self.learning_rate * err * f / norm2
        if fb.estimated_recall > 0.0:
            p = self.predict_recall(fb.ef_search, fb.k)
            r_err = fb.estimated_recall - p
            grad = r_err * p * (1.0 - p)
            r_feats = [1.0, float(fb.ef_search), float(fb.k),
                       math.log(fb.ef_search)]
            for i, f in enumerate(r_feats):
                self.recall_weights[i] += self.learning_rate * grad * f


def reward_for(fb: QueryFeedback) -> float:
    """0.6*recall + 0.3/(1 + 0.1*latency) + 0.2*satisfied
    (learned_tuning.rs:556-561)."""
    recall_reward = fb.estimated_recall
    latency_reward = 1.0 / (1.0 + fb.latency_ms * 0.1)
    bonus = 0.2 if fb.satisfied else 0.0
    return recall_reward * 0.6 + latency_reward * 0.3 + bonus


class LearnedTuner:
    """learned_tuning.rs:359-730 with injectable randomness."""

    def __init__(self, config: TunerConfig | None = None,
                 rng: random.Random | None = None):
        self.config = config or TunerConfig()
        self.rng = rng or random.Random()
        self.model = OnlineModel(self.config.learning_rate)
        self.arms: dict[int, BanditArm] = {
            ef: BanditArm(ef) for ef in DEFAULT_ARMS}
        self.total_pulls = 0
        self.history: list[QueryFeedback] = []
        self.workload = WorkloadProfile()
        self.explorations = 0
        self.exploitations = 0
        self._latency_sum = 0.0
        self._recall_sum = 0.0
        self._pred_err_sum = 0.0

    # -------------------------------------------------- recommend --

    def recommend_params(self, k: int,
                         target_recall: float) -> RecommendedParams:
        n = len(self.history)
        if n < self.config.min_samples:
            return RecommendedParams(
                50, 0.0, 5.0, 0.9, True,
                f"Not enough samples ({n}/{self.config.min_samples}), "
                "using default with exploration")
        explore = self.rng.random() < self.config.exploration_rate
        if explore:
            self.explorations += 1
            ef = max(self.arms.values(), key=lambda a: a.ucb).ef_search
            is_exp, reason = True, f"UCB1 exploration, selected ef_search={ef}"
        else:
            self.exploitations += 1
            best_ef, best_score = 50, -float("inf")
            for cand in DEFAULT_ARMS:
                pr = self.model.predict_recall(cand, k)
                pl = self.model.predict_latency(
                    cand, k, int(self.workload.avg_filter_complexity),
                    self.workload.avg_query_norm)
                recall_diff = pr - target_recall
                if self.config.target_latency_ms is not None:
                    lat_pen = max(pl - self.config.target_latency_ms,
                                  0.0) * 0.1
                else:
                    lat_pen = pl * 0.01
                score = (recall_diff - lat_pen if recall_diff >= 0.0
                         else recall_diff * 10.0 - lat_pen)
                if score > best_score:
                    best_score, best_ef = score, cand
            ef, is_exp = best_ef, False
            reason = (f"Model exploitation: predicted optimal "
                      f"ef_search={ef} for recall={target_recall:.2f}")
        pl = max(self.model.predict_latency(
            ef, k, int(self.workload.avg_filter_complexity),
            self.workload.avg_query_norm), 0.1)
        pr = min(max(self.model.predict_recall(ef, k), 0.0), 1.0)
        arm_pulls = self.arms.get(ef, BanditArm(ef)).pull_count
        conf = 0.0
        if self.total_pulls > 0:
            conf = min(
                (arm_pulls / self.total_pulls)
                * min(n / self.config.min_samples, 1.0), 1.0)
        return RecommendedParams(ef, conf, pl, pr, is_exp, reason)

    # --------------------------------------------------- feedback --

    def record_feedback(self, fb: QueryFeedback) -> None:
        self.model.update(fb)
        self.total_pulls += 1
        arm = self.arms.setdefault(fb.ef_search, BanditArm(fb.ef_search))
        arm.update(reward_for(fb), self.total_pulls)

        w, d = self.workload, self.config.decay_factor
        w.avg_k = w.avg_k * d + fb.k * (1 - d)
        w.avg_filter_complexity = (
            w.avg_filter_complexity * d + fb.filter_complexity * (1 - d))
        w.avg_query_norm = w.avg_query_norm * d + fb.query_norm * (1 - d)
        if not fb.satisfied:
            if fb.estimated_recall < 0.9:
                w.recall_sensitivity = min(
                    w.recall_sensitivity * 0.9 + 0.1, 1.0)
            if fb.latency_ms > 10.0:
                w.latency_sensitivity = min(
                    w.latency_sensitivity * 0.9 + 0.1, 1.0)
        if self.history:
            dur = max((fb.timestamp - self.history[0].timestamp) / 1000.0,
                      1.0)
            w.query_rate = len(self.history) / dur

        pred = self.model.predict_latency(
            fb.ef_search, fb.k, fb.filter_complexity, fb.query_norm)
        self._pred_err_sum += (pred - fb.latency_ms) ** 2
        self._latency_sum += fb.latency_ms
        self._recall_sum += fb.estimated_recall
        if len(self.history) >= self.config.max_history:
            self.history.pop(0)
        self.history.append(fb)

    # ------------------------------------------------------ stats --

    def stats(self) -> dict:
        n = len(self.history)
        pulled = [a for a in self.arms.values() if a.pull_count > 0]
        best = max(pulled, key=lambda a: a.avg_reward).ef_search \
            if pulled else 50
        return {
            "total_samples": n,
            "explorations": self.explorations,
            "exploitations": self.exploitations,
            "avg_latency_ms": self._latency_sum / n if n else 0.0,
            "avg_recall": self._recall_sum / n if n else 0.0,
            "best_ef_search": best,
            "workload": asdict(self.workload),
            "latency_rmse": math.sqrt(self._pred_err_sum / n) if n else 0.0,
        }

    def reset(self) -> None:
        self.__init__(self.config, self.rng)

    # ------------------------------------------- persist / restore --

    def export_state(self) -> dict:
        return {
            "config": asdict(self.config),
            "arms": {ef: asdict(a) for ef, a in self.arms.items()},
            "total_pulls": self.total_pulls,
            "latency_weights": list(self.model.latency_weights),
            "recall_weights": list(self.model.recall_weights),
            "sample_count": self.model.sample_count,
            "workload": asdict(self.workload),
        }

    def import_state(self, state: dict) -> None:
        self.arms = {int(ef): BanditArm(**a)
                     for ef, a in state["arms"].items()}
        self.total_pulls = int(state["total_pulls"])
        self.model.latency_weights = list(state["latency_weights"])
        self.model.recall_weights = list(state["recall_weights"])
        self.model.sample_count = int(state["sample_count"])
        self.workload = WorkloadProfile(**state["workload"])

    # --------------------------------------- distributed warm start --

    def fit_from_log(self, log: DataFrame,
                     model_sample: int = 2000) -> "LearnedTuner":
        """Warm-start from a query-feedback log of any size.  The
        bandit state and workload profile come from ONE distributed
        aggregation (per-arm reward sums via the exact reward
        expression; means for the profile) — no sequential replay.
        The SGD models then fine-tune on a bounded, newest-first
        driver sample (SGD is inherently sequential; the sample is
        capped at `model_sample` rows).

        Log schema: (ef_search int, k int, latency_ms double,
        estimated_recall double, satisfied boolean, query_norm double,
        filter_complexity int, timestamp long)."""
        reward = (F.col("estimated_recall") * 0.6
                  + F.lit(0.3) / (F.lit(1.0) + F.col("latency_ms") * 0.1)
                  + F.when(F.col("satisfied"), 0.2).otherwise(0.0))
        per_arm = (log.groupBy("ef_search")
                   .agg(F.sum(reward).alias("total_reward"),
                        F.count(F.lit(1)).alias("pulls"))
                   .collect())
        total = sum(int(r["pulls"]) for r in per_arm)
        self.total_pulls = total
        for r in per_arm:
            ef = int(r["ef_search"])
            arm = self.arms.setdefault(ef, BanditArm(ef))
            arm.pull_count = int(r["pulls"])
            arm.total_reward = float(r["total_reward"])
            arm.avg_reward = arm.total_reward / arm.pull_count
            arm.ucb = arm.avg_reward + math.sqrt(
                2.0 * math.log(max(total, 2)) / arm.pull_count)

        prof = log.agg(
            F.avg("k").alias("k"),
            F.avg("filter_complexity").alias("fc"),
            F.avg("query_norm").alias("qn"),
            F.avg("latency_ms").alias("lat"),
            F.avg("estimated_recall").alias("rec"),
            F.count(F.lit(1)).alias("n"),
            ((F.max("timestamp") - F.min("timestamp")) / 1000.0)
            .alias("dur")).collect()[0]
        n = int(prof["n"])
        if n:
            self.workload.avg_k = float(prof["k"])
            self.workload.avg_filter_complexity = float(prof["fc"])
            self.workload.avg_query_norm = float(prof["qn"])
            self.workload.query_rate = n / max(float(prof["dur"] or 0.0), 1.0)
            self._latency_sum = float(prof["lat"]) * n
            self._recall_sum = float(prof["rec"]) * n

        sample = (log.orderBy(F.col("timestamp").desc())
                  .limit(int(model_sample)).collect())
        for row in reversed(sample):      # oldest-first SGD replay
            fb = QueryFeedback(
                ef_search=int(row["ef_search"]), k=int(row["k"]),
                latency_ms=float(row["latency_ms"]),
                estimated_recall=float(row["estimated_recall"]),
                satisfied=bool(row["satisfied"]),
                query_norm=float(row["query_norm"]),
                filter_complexity=int(row["filter_complexity"]),
                timestamp=int(row["timestamp"]))
            self.model.update(fb)
            self.history.append(fb)
            if len(self.history) > self.config.max_history:
                self.history.pop(0)
        return self


class AdaptiveExecutor:
    """Bounded wrapper (learned_tuning.rs:745-810): clamp the
    recommendation, report execution back as feedback."""

    def __init__(self, tuner: LearnedTuner, min_ef: int = 10,
                 max_ef: int = 500):
        self.tuner = tuner
        self.min_ef, self.max_ef = int(min_ef), int(max_ef)

    def get_ef_search(self, k: int, target_recall: float) -> int:
        rec = self.tuner.recommend_params(k, target_recall)
        return max(self.min_ef, min(self.max_ef, rec.ef_search))

    def record_execution(self, ef_search: int, k: int, latency_ms: float,
                         estimated_recall: float = 0.0,
                         satisfied: bool = True,
                         timestamp: int = 0) -> None:
        self.tuner.record_feedback(QueryFeedback(
            ef_search=ef_search, k=k, latency_ms=latency_ms,
            estimated_recall=estimated_recall, satisfied=satisfied,
            timestamp=timestamp))
