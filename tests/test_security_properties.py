"""Property-based tests for the security/governance modules.

* ACL: the pushable boolean fold (`allowed_predicate`) must agree with
  the first-match-wins `when` cascade (`decision_columns`) on every
  row with non-null matched columns, for ANY policy set — the fold is
  an algebraic rewrite, so this pins the equivalence proof.
* Sync: two replicas that exchange deltas until quiescence must
  converge to identical clocks and op sets regardless of the
  interleaving — the convergence law sync_engine.rs's design implies.
* Privacy: composed epsilon is monotone in k for every theorem.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from needle_spark.operators.acl import (
    ALLOW,
    DENY,
    READ,
    AclEngine,
    AclPolicy,
    RequestContext,
    any_principal,
    attribute,
    metadata_field,
    role,
    vector_id,
)
from needle_spark.operators.privacy import (
    ADVANCED,
    BASIC,
    RENYI,
    composed_epsilon,
)
from needle_spark.sync import SyncEngine, VectorClock


# ------------------------------------------------------------------ acl

_PRINCIPALS = [any_principal(), role("reader"), role("admin"),
               attribute("team", "nlp"), attribute("team", "ops")]
_RESOURCES = [metadata_field("lang", "en"), metadata_field("lang", "fr"),
              metadata_field("tenant", "acme"), vector_id("1*"),
              vector_id("7")]

policy_strategy = st.lists(
    st.tuples(
        st.sampled_from(range(len(_PRINCIPALS))),
        st.sampled_from(range(len(_RESOURCES))),
        st.sampled_from([ALLOW, DENY]),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=0, max_size=6,
)


@pytest.fixture(scope="module")
def acl_rows(spark):
    rows = [
        (i, ["en", "fr", "de"][i % 3], ["acme", "globex"][i % 2])
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "id bigint, lang string, tenant string").cache()


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(spec=policy_strategy, default_allow=st.booleans())
def test_fold_equals_cascade(spark, acl_rows, spec, default_allow):
    eng = AclEngine(ALLOW if default_allow else DENY)
    for n, (pi, ri, effect, prio) in enumerate(spec):
        eng.add_policy(AclPolicy(
            id=f"p{n}", principal=_PRINCIPALS[pi], resource=_RESOURCES[ri],
            effect=effect, actions=(READ,), priority=prio))
    ctx = RequestContext("alice", roles=("reader",),
                         attributes={"team": "nlp"})
    via_cascade = {
        r["id"]: r["allowed"]
        for r in eng.evaluate_rows(acl_rows, ctx, READ).collect()
    }
    fold = eng.allowed_predicate(ctx, READ, "id")
    via_fold = {r["id"] for r in acl_rows.filter(fold).collect()}
    assert via_fold == {i for i, ok in via_cascade.items() if ok}


# ----------------------------------------------------------------- sync

op_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),          # which replica writes
              st.sampled_from(["v1", "v2", "v3"]),  # id
              st.sampled_from(["insert", "update", "delete"])),
    min_size=0, max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=op_strategy)
def test_bidirectional_sync_converges(spark, ops):
    a = SyncEngine(spark, "node-a")
    b = SyncEngine(spark, "node-b")
    for i, (who, vid, kind) in enumerate(ops):
        eng = a if who == "a" else b
        if kind == "delete":
            eng.record_delete(vid, now_ms=i)
        else:
            getattr(eng, f"record_{kind}")(vid, [float(i)], now_ms=i)
    # exchange until quiescent (at most 2 rounds for 2 nodes)
    for _ in range(2):
        b.apply_delta(a.generate_delta(b.vector_clock()))
        a.apply_delta(b.generate_delta(a.vector_clock()))
    assert a.vector_clock().clocks == b.vector_clock().clocks
    sig = lambda e: sorted(
        (r["node_id"], r["timestamp"], r["op"], r["id"])
        for r in e._ops.collect())
    assert sig(a) == sig(b)


def test_vector_clock_laws():
    # merge is commutative + idempotent; dominates is antisymmetric
    a = VectorClock({"x": 3, "y": 1})
    b = VectorClock({"y": 4, "z": 2})
    m1, m2 = a.copy(), b.copy()
    m1.merge(b)
    m2.merge(a)
    assert m1.clocks == m2.clocks
    m3 = m1.copy()
    m3.merge(m1)
    assert m3.clocks == m1.clocks
    assert m1.dominates(a) and m1.dominates(b)
    assert not (a.dominates(b) and b.dominates(a))


# -------------------------------------------------------------- privacy

@settings(max_examples=50, deadline=None)
@given(eps=st.floats(min_value=0.01, max_value=2.0),
       k=st.integers(min_value=1, max_value=50),
       theorem=st.sampled_from([BASIC, ADVANCED, RENYI]))
def test_composed_epsilon_monotone_in_k(eps, k, theorem):
    e1 = composed_epsilon(eps, 1e-5, k, theorem)
    e2 = composed_epsilon(eps, 1e-5, k + 1, theorem)
    assert e2 >= e1 > 0.0
