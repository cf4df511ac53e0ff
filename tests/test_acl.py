"""Vector ACL + collection RBAC — vector_acl.rs / collection_rbac.rs parity.

Mirrors the reference's in-file tests: tenant isolation allow/deny,
priority ordering, deny precedence via priority, prefix id matching,
field-level redaction, row_level_filters, audit accounting, RBAC
permission checks with expiry and disabled policies, AND-ed row
filters, visible-field projection — plus Spark-shape checks (the
row-level predicate is a pushed-down scan filter, no Python, no join).
"""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.acl import (
    ALLOW,
    DENY,
    READ,
    SEARCH,
    WRITE,
    AccessToken,
    AclEngine,
    AclError,
    AclPolicy,
    PolicyEngine,
    PolicyRule,
    RbacPolicy,
    RequestContext,
    any_principal,
    any_resource,
    attribute,
    audit_summary,
    field_name,
    metadata_field,
    role,
    user,
    vector_id,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "t1", "en", "acme"),
        (2, "t2", "fr", "acme"),
        (3, "t3", "en", "globex"),
        (10, "t10", "de", "acme"),
        (11, "t11", "en", "acme"),
    ]
    return spark.createDataFrame(
        rows, "id bigint, text string, lang string, tenant string")


def tenant_engine() -> AclEngine:
    # vector_acl.rs tests: tenant isolation policy.
    eng = AclEngine()
    eng.add_policy(AclPolicy(
        id="tenant-acme", principal=attribute("tenant_id", "acme"),
        resource=metadata_field("tenant", "acme"),
        effect=ALLOW, actions=(READ, SEARCH)))
    return eng


def ctx_acme() -> RequestContext:
    return RequestContext("alice", roles=("reader",),
                          attributes={"tenant_id": "acme"})


def test_tenant_isolation_rows(spark, docs):
    eng = tenant_engine()
    got = sorted(r["id"] for r in eng.secure_read(
        docs, ctx_acme(), READ).collect())
    assert got == [1, 2, 10, 11]  # globex row denied by default-deny


def test_default_deny_vs_allow_by_default(spark, docs):
    ctx = RequestContext("mallory")  # matches no policy
    assert tenant_engine().secure_read(docs, ctx, READ).count() == 0
    assert AclEngine.allow_by_default().secure_read(
        docs, ctx, READ).count() == 5


def test_priority_deny_wins(spark, docs):
    # higher-priority deny shadows the allow for ids with prefix "1".
    eng = tenant_engine()
    eng.add_policy(AclPolicy(
        id="deny-1x", principal=any_principal(),
        resource=vector_id("1*"), effect=DENY, actions=(READ,),
        priority=10))
    got = sorted(r["id"] for r in eng.secure_read(
        docs, ctx_acme(), READ).collect())
    assert got == [2]  # 1, 10, 11 denied by prefix; 3 by default
    dec = {r["id"]: (r["allowed"], r["policy_id"])
           for r in eng.evaluate_rows(docs, ctx_acme(), READ).collect()}
    assert dec[10] == (False, "deny-1x")
    assert dec[2] == (True, "tenant-acme")
    assert dec[3] == (False, None)


def test_exact_vector_id_match(spark, docs):
    eng = AclEngine()
    eng.add_policy(AclPolicy(
        id="only-3", principal=user("bob"), resource=vector_id("3"),
        effect=ALLOW, actions=(READ,)))
    got = [r["id"] for r in eng.secure_read(
        docs, RequestContext("bob"), READ).collect()]
    assert got == [3]


def test_action_scoping(spark, docs):
    eng = tenant_engine()  # policy covers READ/SEARCH only
    assert eng.secure_read(docs, ctx_acme(), WRITE).count() == 0


def test_field_redaction(spark, docs):
    eng = tenant_engine()
    eng.add_policy(AclPolicy(
        id="hide-text", principal=role("reader"),
        resource=field_name("text"), effect=DENY, actions=(READ,)))
    assert eng.redacted_fields(ctx_acme(), READ) == ["text"]
    out = eng.secure_read(docs, ctx_acme(), READ)
    assert "text" not in out.columns and out.count() == 4


def test_row_level_filters_rewrite(spark):
    eng = tenant_engine()
    assert eng.row_level_filters(ctx_acme()) == [("tenant", "acme")]
    assert eng.row_level_filters(RequestContext("mallory")) == []


def test_duplicate_and_empty_policy_ids():
    eng = tenant_engine()
    with pytest.raises(AclError):
        eng.add_policy(AclPolicy(
            id="tenant-acme", principal=any_principal(),
            resource=any_resource(), effect=ALLOW, actions=(READ,)))
    with pytest.raises(AclError):
        eng.add_policy(AclPolicy(
            id="", principal=any_principal(), resource=any_resource(),
            effect=ALLOW, actions=(READ,)))
    assert eng.remove_policy("tenant-acme") is True
    assert eng.remove_policy("tenant-acme") is False


def test_audit_trail_and_summary(spark, docs):
    eng = tenant_engine()
    n = eng.record_audit(docs, ctx_acme(), READ, now=1700000000)
    assert n == 5 and len(eng.audit) == 5
    adf = eng.audit_df(spark)
    summ = {(r["allowed"], r["policy_id"]): r["n"]
            for r in audit_summary(adf).collect()}
    assert summ[(True, "tenant-acme")] == 4
    assert summ[(False, None)] == 1


def test_rls_predicate_pushes_down(spark, docs, tmp_path):
    # The compiled decision is a scan predicate: written to parquet and
    # re-read, the filter must appear as PushedFilters (no Python, no
    # join in the plan).
    p = str(tmp_path / "d")
    docs.write.parquet(p)
    eng = tenant_engine()
    plan = eng.secure_read(spark.read.parquet(p), ctx_acme(), READ)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "EqualTo(tenant,acme)" in plan
    assert "BatchEvalPython" not in plan and "Join" not in plan


def test_decision_sql_matches_columns(spark, docs):
    eng = tenant_engine()
    eng.add_policy(AclPolicy(
        id="deny-1x", principal=any_principal(), resource=vector_id("1*"),
        effect=DENY, actions=(READ,), priority=10))
    allowed_sql, policy_sql = eng.decision_sql(ctx_acme(), READ, "id")
    docs.createOrReplaceTempView("acl_docs")
    via_sql = {r["id"]: (r["allowed"], r["policy_id"]) for r in spark.sql(
        f"SELECT id, {allowed_sql} AS allowed, {policy_sql} AS policy_id "
        f"FROM acl_docs").collect()}
    via_col = {r["id"]: (r["allowed"], r["policy_id"]) for r in
               eng.evaluate_rows(docs, ctx_acme(), READ).collect()}
    assert via_sql == via_col


# ---------------------------------------------------------------- RBAC


def rbac_engine() -> PolicyEngine:
    eng = PolicyEngine()
    eng.add_policy(RbacPolicy(
        collection="docs",
        rules=(
            PolicyRule("admin", permissions=(READ, WRITE, SEARCH)),
            PolicyRule("reader", permissions=(READ, SEARCH),
                       row_filters=(("tenant", "acme"),),
                       visible_fields=("lang", "tenant")),
        )))
    return eng


def test_rbac_check_matrix():
    eng = rbac_engine()
    reader = AccessToken("alice", roles=("reader",))
    assert eng.check("docs", reader, READ, now=100)
    assert not eng.check("docs", reader, WRITE, now=100)
    # collection_rbac.rs:288-319 — no policy / disabled policy => allow
    assert eng.check("other", reader, WRITE, now=100)
    eng.add_policy(RbacPolicy(collection="off", rules=(), enabled=False))
    assert eng.check("off", reader, WRITE, now=100)
    # expired token always denies
    stale = AccessToken("alice", roles=("admin",), expires_at=50)
    assert not eng.check("docs", stale, READ, now=100)
    audit = eng.audit_df.__self__.audit
    assert audit[-1]["allowed"] is False


def test_rbac_apply_filters_and_projects(spark, docs):
    eng = rbac_engine()
    reader = AccessToken("alice", roles=("reader",))
    out = eng.apply(docs, "docs", reader, READ, now=100)
    assert set(out.columns) == {"id", "lang", "tenant"}
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 10, 11]
    # admin: no filters, no projection
    admin = AccessToken("root", roles=("admin",))
    full = eng.apply(docs, "docs", admin, WRITE, now=100)
    assert set(full.columns) == set(docs.columns)
    assert full.count() == 5
    with pytest.raises(AclError):
        eng.apply(docs, "docs", reader, WRITE, now=100)
