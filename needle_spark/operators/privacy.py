"""Differential privacy for vector queries: Laplace/Gaussian noise on
distance scores as JVM column expressions, per-session privacy budgets
with composition theorems, per-collection policies, and compliance
reports.

Reference: /root/reference/src/enterprise/privacy.rs — NoiseMechanism
(:27-41), PrivacyConfig (:44-102: ε/δ/sensitivity/max budget,
defaults ε=1.0 δ=1e-5 sens=1.0 budget=10.0), PrivacyBudget
(:106-156: basic-composition accounting per session),
PrivacyMechanism (:159-235: perturb = distance + noise clamped at 0;
Laplace scale = sens/ε via inverse-CDF of a centered uniform;
Gaussian σ = sens·√(2·ln(1.25/δ))/ε), PrivacyExplain (:238-255),
CompositionTheorem basic/advanced/Rényi (:257-264, :357-381),
CollectionPrivacyPolicy (:274-318: enforced flag, per-field
sensitivity), PrivacyPolicyRegistry (:323-484: apply_privacy = budget
gate -> perturb -> re-sort; compliance_report :447-484).

Spark shape (100 TB posture): the noise rides the row as a Catalyst
expression — `rand(seed)`/`randn(seed)` evaluate JVM-side inside
whole-stage codegen, so perturbing a billion distances is a map-only
pass with zero Python and zero shuffle (the final noisy top-k re-sort
is the same TakeOrderedAndProject every search already plans).  Budget
state is O(sessions) on the driver — the right altitude."""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LAPLACE = "laplace"
GAUSSIAN = "gaussian"

BASIC = "basic"
ADVANCED = "advanced"
RENYI = "renyi"


class PrivacyError(ValueError):
    pass


class BudgetExhausted(PrivacyError):
    pass


@dataclass
class PrivacyConfig:
    """privacy.rs:44-102."""

    epsilon: float = 1.0
    delta: float = 1e-5
    mechanism: str = LAPLACE
    sensitivity: float = 1.0
    max_budget_per_session: float = 10.0
    budget_tracking: bool = True

    def __post_init__(self):
        if self.mechanism not in (LAPLACE, GAUSSIAN):
            raise PrivacyError("mechanism must be laplace|gaussian")
        if self.epsilon <= 0:
            raise PrivacyError("epsilon must be positive")


class PrivacyBudget:
    """privacy.rs:106-156 — basic composition: spent ε accumulates."""

    def __init__(self):
        self._budgets: dict[str, float] = {}
        self.total_queries = 0

    def has_budget(self, session_id: str, epsilon: float,
                   max_budget: float) -> bool:
        return self._budgets.get(session_id, 0.0) + epsilon <= max_budget

    def consume(self, session_id: str, epsilon: float,
                max_budget: float) -> bool:
        if not self.has_budget(session_id, epsilon, max_budget):
            return False
        self._budgets[session_id] = self._budgets.get(session_id, 0.0) + epsilon
        self.total_queries += 1
        return True

    def remaining(self, session_id: str, max_budget: float) -> float:
        return max(0.0, max_budget - self._budgets.get(session_id, 0.0))

    def reset(self, session_id: str) -> None:
        self._budgets.pop(session_id, None)

    def summary(self) -> list[tuple[str, float]]:
        return sorted(self._budgets.items())


def composed_epsilon(single_epsilon: float, delta: float, k: int,
                     theorem: str = BASIC) -> float:
    """privacy.rs:357-381 — identical formulas."""
    kf = float(k)
    if theorem == BASIC:
        return single_epsilon * kf
    if theorem == ADVANCED:
        delta_prime = delta / 2.0
        term1 = math.sqrt(2.0 * kf * math.log(1.0 / delta_prime)) * single_epsilon
        term2 = kf * single_epsilon * (math.exp(single_epsilon) - 1.0)
        return term1 + term2
    if theorem == RENYI:
        alpha = 1.0 + 1.0 / (single_epsilon + 1e-10)
        rdp = kf * single_epsilon ** 2 / (2.0 * (alpha - 1.0))
        return rdp + math.log(1.0 / delta) / (alpha - 1.0)
    raise PrivacyError(f"unknown composition theorem {theorem!r}")


class PrivacyMechanism:
    """privacy.rs:159-235."""

    def __init__(self, config: PrivacyConfig):
        self.config = config

    # -- noise scales --

    def noise_scale(self, sensitivity: float | None = None) -> float:
        s = self.config.sensitivity if sensitivity is None else sensitivity
        if self.config.mechanism == LAPLACE:
            return s / self.config.epsilon
        return (s * math.sqrt(2.0 * math.log(1.25 / self.config.delta))
                / self.config.epsilon)

    # -- distributed path --

    def noise_column(self, sensitivity: float | None = None,
                     seed: int | None = None) -> F.Column:
        """Calibrated noise as a pure Catalyst expression.  Laplace by
        inverse-CDF of `rand() - 0.5` (the same transform the
        reference applies to its uniform draw, privacy.rs:189-195);
        Gaussian as `randn() * sigma` (privacy.rs:197-207 uses
        Box-Muller — randn IS that transform, JVM-side)."""
        scale = self.noise_scale(sensitivity)
        if self.config.mechanism == LAPLACE:
            u = (F.rand(seed) if seed is not None else F.rand()) - F.lit(0.5)
            return (-F.lit(scale) * F.signum(u)
                    * F.log(F.lit(1.0) - 2.0 * F.abs(u)))
        g = F.randn(seed) if seed is not None else F.randn()
        return g * F.lit(scale)

    def perturb_distances(
        self,
        df: DataFrame,
        distance_col: str = "distance",
        sensitivity: float | None = None,
        seed: int | None = None,
    ) -> DataFrame:
        """privacy.rs:173-187 distributed: distance + noise, clamped at
        0, map-only."""
        noisy = F.greatest(
            F.lit(0.0),
            F.col(distance_col) + self.noise_column(sensitivity, seed))
        return df.withColumn(distance_col, noisy)

    # -- driver-side parity shim --

    def perturb_distance(self, distance: float,
                         sensitivity: float | None = None,
                         rng: np.random.Generator | None = None) -> float:
        rng = rng or np.random.default_rng()
        scale = self.noise_scale(sensitivity)
        if self.config.mechanism == LAPLACE:
            u = rng.random() - 0.5
            noise = -scale * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))
        else:
            noise = rng.normal() * scale
        return max(0.0, distance + noise)

    def explain(self) -> dict:
        """privacy.rs:209-229."""
        return {
            "mechanism": self.config.mechanism,
            "epsilon": self.config.epsilon,
            "delta": self.config.delta,
            "sensitivity": self.config.sensitivity,
            "noise_scale": self.noise_scale(),
            "budget_tracking": self.config.budget_tracking,
            "max_budget": self.config.max_budget_per_session,
        }


@dataclass
class CollectionPrivacyPolicy:
    """privacy.rs:274-318."""

    collection_name: str
    config: PrivacyConfig
    composition: str = BASIC
    enforced: bool = True
    field_sensitivities: dict[str, float] = field(default_factory=dict)

    def sensitivity_for(self, fld: str | None) -> float:
        if fld is not None and fld in self.field_sensitivities:
            return self.field_sensitivities[fld]
        return self.config.sensitivity


class PrivacyPolicyRegistry:
    """privacy.rs:323-484."""

    def __init__(self):
        self._policies: dict[str, CollectionPrivacyPolicy] = {}
        self.budget = PrivacyBudget()
        self._collection_sessions: dict[str, set[str]] = {}

    def register(self, policy: CollectionPrivacyPolicy) -> None:
        self._policies[policy.collection_name] = policy

    def unregister(self, name: str) -> CollectionPrivacyPolicy | None:
        return self._policies.pop(name, None)

    def get_policy(self, name: str) -> CollectionPrivacyPolicy | None:
        return self._policies.get(name)

    def list_policies(self) -> list[CollectionPrivacyPolicy]:
        return list(self._policies.values())

    def apply_privacy(
        self,
        collection_name: str,
        session_id: str,
        results: DataFrame,
        *,
        distance_col: str = "distance",
        field: str | None = None,
        seed: int | None = None,
    ) -> DataFrame:
        """privacy.rs:385-434: no policy -> passthrough; enforced +
        exhausted budget -> error; else consume ε, perturb distances
        (map-only expression), re-sort by the noisy score."""
        policy = self._policies.get(collection_name)
        if policy is None:
            return results
        cfg = policy.config
        if policy.enforced and not self.budget.has_budget(
                session_id, cfg.epsilon, cfg.max_budget_per_session):
            raise BudgetExhausted(
                f"Privacy budget exhausted for session {session_id!r} on "
                f"collection {collection_name!r}")
        self.budget.consume(session_id, cfg.epsilon,
                            cfg.max_budget_per_session)
        self._collection_sessions.setdefault(
            collection_name, set()).add(session_id)
        mech = PrivacyMechanism(cfg)
        noisy = mech.perturb_distances(
            results, distance_col, policy.sensitivity_for(field), seed)
        return noisy.orderBy(distance_col)

    def composed_epsilon(self, single_epsilon: float, delta: float, k: int,
                         theorem: str) -> float:
        return composed_epsilon(single_epsilon, delta, k, theorem)

    def compliance_report(self, now: float | None = None) -> dict:
        """privacy.rs:447-484 — only sessions that actually queried
        each collection appear under it."""
        policies = []
        all_sessions = dict(self.budget.summary())
        for name, policy in sorted(self._policies.items()):
            relevant = self._collection_sessions.get(name, set())
            sessions = [
                {"session_id": s,
                 "epsilon_consumed": all_sessions[s],
                 "remaining": self.budget.remaining(
                     s, policy.config.max_budget_per_session)}
                for s in sorted(relevant) if s in all_sessions
            ]
            policies.append({
                "collection_name": name,
                "epsilon": policy.config.epsilon,
                "delta": policy.config.delta,
                "mechanism": policy.config.mechanism,
                "sensitivity": policy.config.sensitivity,
                "max_budget": policy.config.max_budget_per_session,
                "enforced": policy.enforced,
                "composition": policy.composition,
                "sessions": sessions,
            })
        ts = time.time() if now is None else now
        return {
            "generated_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(ts)),
            "total_queries": self.budget.total_queries,
            "total_policies": len(self._policies),
            "policies": policies,
        }

    def compliance_json(self, now: float | None = None) -> str:
        return json.dumps(self.compliance_report(now), indent=2)
