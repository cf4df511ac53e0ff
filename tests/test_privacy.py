"""Differential privacy — privacy.rs parity: noise calibration (both
mechanisms, distributed + driver paths), budget composition, policy
registry gate, compliance reports."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.privacy import (
    ADVANCED,
    BASIC,
    GAUSSIAN,
    LAPLACE,
    RENYI,
    BudgetExhausted,
    CollectionPrivacyPolicy,
    PrivacyBudget,
    PrivacyConfig,
    PrivacyError,
    PrivacyMechanism,
    PrivacyPolicyRegistry,
    composed_epsilon,
)


def test_config_validation_and_defaults():
    c = PrivacyConfig()
    assert (c.epsilon, c.delta, c.mechanism) == (1.0, 1e-5, LAPLACE)
    assert c.max_budget_per_session == 10.0
    with pytest.raises(PrivacyError):
        PrivacyConfig(mechanism="uniform")
    with pytest.raises(PrivacyError):
        PrivacyConfig(epsilon=0.0)


def test_noise_scales():
    # privacy.rs:189-207: Laplace scale = sens/eps; Gaussian sigma =
    # sens*sqrt(2 ln(1.25/delta))/eps
    lap = PrivacyMechanism(PrivacyConfig(epsilon=2.0, sensitivity=4.0))
    assert lap.noise_scale() == pytest.approx(2.0)
    gau = PrivacyMechanism(PrivacyConfig(
        epsilon=1.0, delta=1e-5, mechanism=GAUSSIAN, sensitivity=1.0))
    assert gau.noise_scale() == pytest.approx(
        math.sqrt(2.0 * math.log(1.25 / 1e-5)))


def test_distributed_laplace_statistics(spark):
    df = spark.range(20000).select(F.lit(5.0).alias("distance"))
    mech = PrivacyMechanism(PrivacyConfig(epsilon=1.0, sensitivity=1.0))
    vals = np.array([r["distance"] for r in
                     mech.perturb_distances(df, seed=7).collect()])
    # Laplace(b=1) centered at 5, clamped at 0: median ~5, b ~ mean |x-5|
    assert abs(np.median(vals) - 5.0) < 0.1
    assert abs(np.mean(np.abs(vals - 5.0)) - 1.0) < 0.1
    assert (vals >= 0.0).all()


def test_distributed_gaussian_statistics(spark):
    df = spark.range(20000).select(F.lit(100.0).alias("distance"))
    cfg = PrivacyConfig(epsilon=2.0, delta=1e-5, mechanism=GAUSSIAN,
                        sensitivity=1.0)
    mech = PrivacyMechanism(cfg)
    vals = np.array([r["distance"] for r in
                     mech.perturb_distances(df, seed=11).collect()])
    assert abs(np.mean(vals) - 100.0) < 0.2
    assert abs(np.std(vals) - mech.noise_scale()) < 0.2


def test_perturbation_is_jvm_only(spark):
    df = spark.range(100).select(F.lit(1.0).alias("distance"))
    mech = PrivacyMechanism(PrivacyConfig())
    plan = mech.perturb_distances(df, seed=1)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_driver_shim_matches_scale():
    mech = PrivacyMechanism(PrivacyConfig(epsilon=0.5, sensitivity=1.0))
    rng = np.random.default_rng(3)
    draws = [mech.perturb_distance(10.0, rng=rng) for _ in range(20000)]
    assert abs(float(np.mean(np.abs(np.array(draws) - 10.0))) - 2.0) < 0.15


def test_budget_basic_composition():
    b = PrivacyBudget()
    assert b.has_budget("s1", 4.0, 10.0)
    assert b.consume("s1", 4.0, 10.0) and b.consume("s1", 4.0, 10.0)
    assert b.remaining("s1", 10.0) == pytest.approx(2.0)
    assert not b.consume("s1", 4.0, 10.0)  # would exceed
    assert b.total_queries == 2
    b.reset("s1")
    assert b.remaining("s1", 10.0) == 10.0


def test_composition_theorems():
    # privacy.rs:357-381 — formulas verbatim
    assert composed_epsilon(0.5, 1e-5, 4, BASIC) == pytest.approx(2.0)
    eps, delta, k = 0.5, 1e-5, 4
    adv = (math.sqrt(2 * k * math.log(1 / (delta / 2))) * eps
           + k * eps * (math.exp(eps) - 1))
    assert composed_epsilon(eps, delta, k, ADVANCED) == pytest.approx(adv)
    alpha = 1.0 + 1.0 / (eps + 1e-10)
    ren = (k * eps ** 2 / (2 * (alpha - 1))
           + math.log(1 / delta) / (alpha - 1))
    assert composed_epsilon(eps, delta, k, RENYI) == pytest.approx(ren)
    with pytest.raises(PrivacyError):
        composed_epsilon(1.0, 1e-5, 2, "parallel")


def test_registry_gate_and_resort(spark):
    reg = PrivacyPolicyRegistry()
    reg.register(CollectionPrivacyPolicy(
        "docs", PrivacyConfig(epsilon=4.0, max_budget_per_session=10.0)))
    res = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, distance double")
    out = reg.apply_privacy("docs", "s1", res, seed=5)
    rows = out.collect()
    assert len(rows) == 50
    ds = [r["distance"] for r in rows]
    assert ds == sorted(ds)  # re-sorted by noisy distance
    assert ds != [float(i) for i in range(50)]  # actually perturbed
    # unregistered collection passes through untouched
    same = reg.apply_privacy("other", "s1", res).collect()
    assert [r["distance"] for r in same] == [float(i) for i in range(50)]
    # third query exhausts the 10.0 budget (4+4+4 > 10)
    reg.apply_privacy("docs", "s1", res, seed=6)
    with pytest.raises(BudgetExhausted):
        reg.apply_privacy("docs", "s1", res, seed=7)
    # advisory (enforced=False) never raises
    reg.register(CollectionPrivacyPolicy(
        "advisory", PrivacyConfig(epsilon=100.0, max_budget_per_session=1.0),
        enforced=False))
    reg.apply_privacy("advisory", "s1", res, seed=8)


def test_field_sensitivity_override():
    p = CollectionPrivacyPolicy(
        "c", PrivacyConfig(sensitivity=1.0),
        field_sensitivities={"price": 10.0})
    assert p.sensitivity_for("price") == 10.0
    assert p.sensitivity_for("other") == 1.0
    assert p.sensitivity_for(None) == 1.0


def test_compliance_report(spark):
    reg = PrivacyPolicyRegistry()
    reg.register(CollectionPrivacyPolicy("docs", PrivacyConfig(epsilon=2.0)))
    reg.register(CollectionPrivacyPolicy("imgs", PrivacyConfig(epsilon=1.0)))
    res = spark.createDataFrame([(1, 0.5)], "id long, distance double")
    reg.apply_privacy("docs", "alice", res, seed=1).collect()
    rep = reg.compliance_report(now=1700000000)
    assert rep["total_policies"] == 2 and rep["total_queries"] == 1
    docs = next(p for p in rep["policies"] if p["collection_name"] == "docs")
    imgs = next(p for p in rep["policies"] if p["collection_name"] == "imgs")
    # only sessions that queried the collection appear under it
    assert [s["session_id"] for s in docs["sessions"]] == ["alice"]
    assert docs["sessions"][0]["epsilon_consumed"] == pytest.approx(2.0)
    assert docs["sessions"][0]["remaining"] == pytest.approx(8.0)
    assert imgs["sessions"] == []
    assert rep["generated_at"].startswith("2023-11-1")
    assert '"total_queries": 1' in reg.compliance_json(now=1700000000)
