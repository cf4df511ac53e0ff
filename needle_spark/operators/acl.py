"""Access control: per-vector ACL policies compiled to Catalyst
predicates (row-level security), field-level redaction, collection
RBAC, and a queryable audit trail.

Reference:
* /root/reference/src/enterprise/vector_acl.rs — AclAction (:51-63),
  Effect (:65-72), PrincipalMatcher (:74-85: Any/UserId/Role/
  Attribute), ResourceMatcher (:87-98: Any/VectorId exact-or-prefix*/
  MetadataField/FieldName), AclPolicy (:100-120: priority-ordered),
  RequestContext (:126-153), AccessDecision (:159-170),
  AclAuditEntry (:175-191), AclEngine (:196-…): deny-by-default
  (:205-213), allow_by_default (:215-224), add_policy dup/empty checks
  + priority sort (:227-245), evaluate = first matching policy wins
  with field-level deny collection (:258-335), row_level_filters
  (:337-358: Allow+MetadataField policies for the principal).
* /root/reference/src/services/collection/collection_rbac.rs —
  Permission (:39-52), RowFilter (:71-84: all must match),
  PolicyRule (:89-135: role grants + row filters + visible fields),
  RbacPolicy (:140-170: per-collection, enabled flag), AccessToken
  (:178-224: subject/roles/expiry), PolicyEngine.check (:288-319:
  expired deny; missing/disabled policy allow), row_filters (:321-335).

Spark shape (100 TB posture): the whole policy set compiles ONCE,
driver-side, into a single `F.when` cascade (principal and action
matching need no row data, so only resource matchers survive into the
plan).  Row-level security is therefore an ordinary scan predicate —
it pushes down to Parquet, prunes partitions, and costs zero joins,
zero shuffles, and zero Python.  Field-level ACL is column pruning.
The per-row audit/evaluation view is the same scan plus two literal
columns.  Nothing in this module ever collects the data it guards.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# AclAction — vector_acl.rs:51-63 / Permission — collection_rbac.rs:39-52.
READ = "read"
WRITE = "write"
UPDATE = "update"
DELETE = "delete"
SEARCH = "search"
READ_METADATA = "read_metadata"
ADMIN = "admin"

ALLOW = "allow"
DENY = "deny"


class AclError(ValueError):
    pass


# ---------------------------------------------------------------- matchers


@dataclass(frozen=True)
class Principal:
    """PrincipalMatcher — vector_acl.rs:74-85.  kind one of
    any|user_id|role|attribute."""

    kind: str
    key: str = ""
    value: str = ""

    def matches(self, ctx: "RequestContext") -> bool:
        """vector_acl.rs:369-379 — pure driver-side: the principal is
        a property of the request, not of the data."""
        if self.kind == "any":
            return True
        if self.kind == "user_id":
            return ctx.user_id == self.value
        if self.kind == "role":
            return self.value in ctx.roles
        if self.kind == "attribute":
            return ctx.attributes.get(self.key) == self.value
        raise AclError(f"unknown principal matcher {self.kind!r}")


def any_principal() -> Principal:
    return Principal("any")


def user(user_id: str) -> Principal:
    return Principal("user_id", value=user_id)


def role(name: str) -> Principal:
    return Principal("role", value=name)


def attribute(key: str, value: str) -> Principal:
    return Principal("attribute", key=key, value=value)


@dataclass(frozen=True)
class Resource:
    """ResourceMatcher — vector_acl.rs:87-98.  kind one of
    any|vector_id|metadata_field|field_name."""

    kind: str
    key: str = ""
    value: str = ""

    def column(self, id_col: str) -> F.Column:
        """Row-level predicate — vector_acl.rs:381-398.  FieldName
        always matches at row level (it is a column-level control)."""
        if self.kind in ("any", "field_name"):
            return F.lit(True)
        if self.kind == "vector_id":
            if self.value.endswith("*"):
                return F.col(id_col).cast("string").startswith(self.value[:-1])
            return F.col(id_col).cast("string") == self.value
        if self.kind == "metadata_field":
            return F.col(self.key).cast("string") == self.value
        raise AclError(f"unknown resource matcher {self.kind!r}")

    def sql(self, id_col: str) -> str:
        """The same predicate as ANSI SQL (for EXPLAIN and oracles)."""
        if self.kind in ("any", "field_name"):
            return "TRUE"
        q = self.value.replace("'", "''")
        if self.kind == "vector_id":
            if self.value.endswith("*"):
                pref = self.value[:-1].replace("'", "''")
                # substr form is portable (Spark spells the function
                # startswith, DuckDB starts_with)
                return (f"substr(CAST({id_col} AS STRING), 1, "
                        f"{len(self.value) - 1}) = '{pref}'")
            return f"CAST({id_col} AS STRING) = '{q}'"
        return f"CAST({self.key} AS STRING) = '{q}'"


def any_resource() -> Resource:
    return Resource("any")


def vector_id(pattern: str) -> Resource:
    return Resource("vector_id", value=pattern)


def metadata_field(name: str, value: str) -> Resource:
    return Resource("metadata_field", key=name, value=value)


def field_name(name: str) -> Resource:
    return Resource("field_name", key=name)


# ---------------------------------------------------------------- policies


@dataclass(frozen=True)
class AclPolicy:
    """vector_acl.rs:100-120."""

    id: str
    principal: Principal
    resource: Resource
    effect: str
    actions: tuple[str, ...]
    priority: int = 0
    description: str = ""

    def __post_init__(self):
        if self.effect not in (ALLOW, DENY):
            raise AclError(f"effect must be allow|deny, got {self.effect!r}")


@dataclass
class RequestContext:
    """vector_acl.rs:126-153."""

    user_id: str
    roles: tuple[str, ...] = ()
    attributes: dict[str, str] = field(default_factory=dict)


class AclEngine:
    """vector_acl.rs:196-358 — deny-by-default policy engine whose
    evaluation compiles to one Catalyst expression."""

    def __init__(self, default_effect: str = DENY):
        if default_effect not in (ALLOW, DENY):
            raise AclError("default_effect must be allow|deny")
        self._policies: list[AclPolicy] = []
        self.default_effect = default_effect
        self.audit: list[dict] = []
        self.max_audit_entries = 10_000

    @classmethod
    def allow_by_default(cls) -> "AclEngine":
        """vector_acl.rs:215-224."""
        return cls(default_effect=ALLOW)

    def add_policy(self, policy: AclPolicy) -> "AclEngine":
        """vector_acl.rs:227-245: empty/duplicate ids rejected; the
        list stays priority-sorted (stable, higher first)."""
        if not policy.id:
            raise AclError("policy ID cannot be empty")
        if any(p.id == policy.id for p in self._policies):
            raise AclError(f"duplicate policy ID: {policy.id!r}")
        self._policies.append(policy)
        self._policies.sort(key=lambda p: -p.priority)
        return self

    def remove_policy(self, policy_id: str) -> bool:
        n = len(self._policies)
        self._policies = [p for p in self._policies if p.id != policy_id]
        return len(self._policies) < n

    def list_policies(self) -> list[AclPolicy]:
        return list(self._policies)

    # -- compilation --

    def _matching(self, ctx: RequestContext, action: str) -> list[AclPolicy]:
        """Policies that cover (principal, action), priority order.
        Only field-level DENIES are excluded (they redact columns, not
        rows); a field-level ALLOW falls through the reference's
        first-match loop as a row-level allow (FieldName matches every
        row) — vector_acl.rs:280-315."""
        return [
            p for p in self._policies
            if action in p.actions and p.principal.matches(ctx)
            and not (p.resource.kind == "field_name" and p.effect == DENY)
        ]

    def decision_columns(
        self, ctx: RequestContext, action: str, id_col: str = "id"
    ) -> tuple[F.Column, F.Column]:
        """First-matching-policy-wins as a `when` cascade —
        vector_acl.rs:298-315.  Returns (allowed boolean, policy_id
        string-or-null) columns; pure JVM expressions."""
        allowed = F.lit(self.default_effect == ALLOW)
        policy_id = F.lit(None).cast("string")
        # build the cascade bottom-up: later (lower-priority) policies
        # are the fallback of earlier ones.
        for p in reversed(self._matching(ctx, action)):
            cond = p.resource.column(id_col)
            allowed = F.when(cond, F.lit(p.effect == ALLOW)).otherwise(allowed)
            policy_id = F.when(cond, F.lit(p.id)).otherwise(policy_id)
        return allowed, policy_id

    def decision_sql(
        self, ctx: RequestContext, action: str, id_col: str = "id"
    ) -> tuple[str, str]:
        """The same cascade as ANSI-SQL CASE expressions."""
        allowed = "TRUE" if self.default_effect == ALLOW else "FALSE"
        policy_id = "CAST(NULL AS STRING)"
        for p in reversed(self._matching(ctx, action)):
            cond = p.resource.sql(id_col)
            eff = "TRUE" if p.effect == ALLOW else "FALSE"
            pid = p.id.replace("'", "''")
            allowed = f"CASE WHEN {cond} THEN {eff} ELSE {allowed} END"
            policy_id = (f"CASE WHEN {cond} THEN '{pid}' "
                         f"ELSE {policy_id} END")
        return allowed, policy_id

    def allowed_predicate(
        self, ctx: RequestContext, action: str, id_col: str = "id"
    ) -> F.Column:
        """The first-match-wins cascade folded into plain AND/OR/NOT
        boolean algebra — `cond1 ? eff1 : rest` becomes
        `cond1 OR rest` (allow) / `NOT cond1 AND rest` (deny) — so the
        row-level filter stays a pushable scan predicate (the `when`
        form compiles to `... <=> true`, which Parquet cannot push).

        Corner: a NULL resource match under a DENY policy drops the
        row here (conservative deny), while `decision_columns` treats
        it as no-match and falls through; identical wherever the
        matched columns are non-null."""
        allowed = F.lit(self.default_effect == ALLOW)
        for p in reversed(self._matching(ctx, action)):
            cond = p.resource.column(id_col)
            allowed = (cond | allowed) if p.effect == ALLOW else (~cond & allowed)
        return allowed

    def redacted_fields(self, ctx: RequestContext, action: str) -> list[str]:
        """Field-level denies for this principal, honoring first-match
        shadowing (vector_acl.rs:291-316: the loop BREAKS at the first
        matching row policy, so field denies ranked below it never
        apply).  Row policies whose match is row-DEPENDENT
        (vector_id/metadata) cannot shadow uniformly in a set-level
        engine, so collection stops only at an unconditional
        (any-resource) winner — redacting conservatively otherwise."""
        out: list[str] = []
        for p in self._policies:
            if action not in p.actions or not p.principal.matches(ctx):
                continue
            if p.resource.kind == "field_name":
                if p.effect == DENY:
                    out.append(p.resource.key)
                    continue
                break  # allow(FieldName) wins the row loop here
            if p.resource.kind == "any":
                break  # unconditional row winner shadows later denies
        return out

    def row_level_filters(self, ctx: RequestContext) -> list[tuple[str, str]]:
        """Allow+MetadataField policies for the principal, for query
        rewriting — vector_acl.rs:337-358."""
        return [
            (p.resource.key, p.resource.value)
            for p in self._policies
            if p.effect == ALLOW and p.resource.kind == "metadata_field"
            and p.principal.matches(ctx)
        ]

    # -- application --

    def evaluate_rows(
        self,
        df: DataFrame,
        ctx: RequestContext,
        action: str,
        *,
        id_col: str = "id",
    ) -> DataFrame:
        """Per-row AccessDecision view — vector_acl.rs:258-335 as one
        scan projection: every row of `df` plus (allowed, policy_id)."""
        allowed, policy_id = self.decision_columns(ctx, action, id_col)
        return df.withColumn("allowed", allowed).withColumn(
            "policy_id", policy_id)

    def secure_read(
        self,
        df: DataFrame,
        ctx: RequestContext,
        action: str = READ,
        *,
        id_col: str = "id",
    ) -> DataFrame:
        """Row-level security: keep only allowed rows, drop redacted
        columns.  The predicate is an ordinary scan filter (pushes
        down; no joins/shuffles/Python)."""
        out = df.filter(self.allowed_predicate(ctx, action, id_col))
        drop = [c for c in self.redacted_fields(ctx, action) if c in out.columns]
        return out.drop(*drop) if drop else out

    def record_audit(
        self,
        df: DataFrame,
        ctx: RequestContext,
        action: str,
        *,
        id_col: str = "id",
        now: float | None = None,
        limit: int = 1000,
    ) -> int:
        """Append per-row decisions to the bounded driver audit log —
        vector_acl.rs:317-333.  Bounded: collects at most `limit`
        decision rows (the full decision set stays distributed via
        evaluate_rows / audit_summary)."""
        ts = int(time.time() if now is None else now)
        rows = (
            self.evaluate_rows(df, ctx, action, id_col=id_col)
            .select(id_col, "allowed", "policy_id").limit(limit).collect()
        )
        for r in rows:
            self.audit.append({
                "timestamp": ts,
                "user_id": ctx.user_id,
                "action": action,
                "vector_id": str(r[id_col]),
                "allowed": bool(r["allowed"]),
                "policy_id": r["policy_id"],
            })
        overflow = len(self.audit) - self.max_audit_entries
        if overflow > 0:
            del self.audit[:overflow]
        return len(rows)

    def audit_df(self, spark: SparkSession) -> DataFrame:
        schema = ("timestamp long, user_id string, action string, "
                  "vector_id string, allowed boolean, policy_id string")
        return spark.createDataFrame(self.audit, schema)


def audit_summary(
    decisions: DataFrame, *, by: Sequence[str] = ("allowed", "policy_id")
) -> DataFrame:
    """Aggregate a decision/audit frame into per-outcome counts — the
    query surface over vector_acl.rs's audit trail.  One map-side
    combined aggregation."""
    return decisions.groupBy(*by).agg(F.count(F.lit(1)).alias("n")).orderBy(*by)


# ---------------------------------------------------------------- RBAC


@dataclass(frozen=True)
class PolicyRule:
    """collection_rbac.rs:89-135: role -> permissions, AND-ed row
    filters, visible-field allowlist."""

    role: str
    permissions: tuple[str, ...] = ()
    row_filters: tuple[tuple[str, str], ...] = ()
    visible_fields: tuple[str, ...] = ()


@dataclass(frozen=True)
class RbacPolicy:
    """collection_rbac.rs:140-170."""

    collection: str
    rules: tuple[PolicyRule, ...] = ()
    enabled: bool = True


@dataclass
class AccessToken:
    """collection_rbac.rs:178-224.  expires_at None = never."""

    subject: str
    roles: tuple[str, ...] = ()
    expires_at: float | None = None

    def is_expired(self, now: float | None = None) -> bool:
        if self.expires_at is None:
            return False
        return (time.time() if now is None else now) >= self.expires_at

    def has_role(self, r: str) -> bool:
        return r in self.roles


class PolicyEngine:
    """collection_rbac.rs:246-345."""

    def __init__(self):
        self._policies: dict[str, RbacPolicy] = {}
        self.audit: list[dict] = []

    def add_policy(self, policy: RbacPolicy) -> None:
        self._policies[policy.collection] = policy

    def remove_policy(self, collection: str) -> bool:
        return self._policies.pop(collection, None) is not None

    @property
    def policy_count(self) -> int:
        return len(self._policies)

    def check(
        self, collection: str, token: AccessToken, perm: str,
        *, now: float | None = None,
    ) -> bool:
        """collection_rbac.rs:288-319: expired tokens always deny;
        missing or disabled policies allow."""
        ts = int(time.time() if now is None else now)
        if token.is_expired(now):
            self._log(ts, token, collection, perm, False, None)
            return False
        policy = self._policies.get(collection)
        if policy is None or not policy.enabled:
            why = "no-policy" if policy is None else "policy-disabled"
            self._log(ts, token, collection, perm, True, why)
            return True
        for rule in policy.rules:
            if token.has_role(rule.role) and perm in rule.permissions:
                self._log(ts, token, collection, perm, True, rule.role)
                return True
        self._log(ts, token, collection, perm, False, None)
        return False

    def row_filters(
        self, collection: str, token: AccessToken
    ) -> list[tuple[str, str]]:
        """collection_rbac.rs:321-335 — union of the token's rules'
        filters; each (field, value) must match (AND)."""
        policy = self._policies.get(collection)
        if policy is None or not policy.enabled:
            return []
        out: list[tuple[str, str]] = []
        for rule in policy.rules:
            if token.has_role(rule.role):
                out.extend(rule.row_filters)
        return out

    def visible_fields(
        self, collection: str, token: AccessToken, perm: str = READ
    ) -> list[str] | None:
        """Union of matching rules' allowlists; None = unrestricted
        (every matching rule unrestricted, or no policy)."""
        policy = self._policies.get(collection)
        if policy is None or not policy.enabled:
            return None
        fields: list[str] = []
        restricted = False
        for rule in policy.rules:
            # only rules GRANTING this permission govern its field
            # visibility — a write-only rule with no allowlist must
            # not nullify the read rule's restriction
            if token.has_role(rule.role) and perm in rule.permissions:
                if rule.visible_fields:
                    restricted = True
                    fields.extend(
                        f for f in rule.visible_fields if f not in fields)
                else:
                    return None  # one unrestricted grant wins
        return fields if restricted else None

    def apply(
        self,
        df: DataFrame,
        collection: str,
        token: AccessToken,
        perm: str = READ,
        *,
        id_col: str = "id",
        now: float | None = None,
    ) -> DataFrame:
        """Enforce the policy on a read: permission gate, AND-ed row
        filters (scan predicate, pushes down), visible-field
        projection (column pruning)."""
        if not self.check(collection, token, perm, now=now):
            raise AclError(
                f"{token.subject!r} lacks {perm!r} on {collection!r}")
        out = df
        for fld, val in self.row_filters(collection, token):
            out = out.filter(F.col(fld).cast("string") == val)
        vis = self.visible_fields(collection, token, perm)
        if vis is not None:
            keep = [c for c in out.columns if c in vis or c == id_col]
            out = out.select(*keep)
        return out

    def _log(self, ts, token, collection, perm, allowed, detail):
        self.audit.append({
            "timestamp": ts,
            "subject": token.subject,
            "collection": collection,
            "permission": perm,
            "allowed": allowed,
            "detail": detail,
        })

    def audit_df(self, spark: SparkSession) -> DataFrame:
        schema = ("timestamp long, subject string, collection string, "
                  "permission string, allowed boolean, detail string")
        return spark.createDataFrame(self.audit, schema)
