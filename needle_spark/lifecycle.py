"""Vector lifecycle policies: per-collection age-based rules
(delete / archive / compress) with metadata filters, compiled to one
scan expression and executed against the catalog.

Reference: /root/reference/src/persistence/lifecycle.rs —
LifecycleAction (:12-21), LifecycleRule + ttl/archive/compress_days
builders (:25-63), LifecyclePolicy (:75-122: for_collection,
ttl_only, tiered compress->archive->delete ladder), evaluate
(:125-155: disabled rules skip, age must reach the rule's threshold,
metadata filter must match in full, LAST matching rule wins),
LifecyclePolicyEngine (:158-252: first policy scoped to the
collection — or unscoped — applies; evaluation/action counters).

Spark shape (100 TB posture): `classify` compiles the whole rule
ladder into ONE `when`-cascade column over the collection scan (age =
now - inserted_at; metadata filters are plain column equalities), so
deciding the fate of a billion vectors is a single map-only pass.
`apply` then executes each action set-wise: delete via the catalog's
tombstone mutation, archive as a partitioned Parquet write of the
matching rows followed by the same delete, compress handed to
`plans/tiering.py`'s demotion machinery (the catalog's serving
representation change).  Nothing iterates per vector."""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE = "delete"
ARCHIVE = "archive"
COMPRESS = "compress"
NONE = "none"

_ACTIONS = (DELETE, ARCHIVE, COMPRESS, NONE)


class LifecycleError(ValueError):
    pass


@dataclass
class LifecycleRule:
    """lifecycle.rs:25-63."""

    name: str
    action: str
    age_seconds: int
    metadata_filter: dict[str, str] | None = None
    enabled: bool = True

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise LifecycleError(f"action must be one of {_ACTIONS}")

    @classmethod
    def ttl_days(cls, name: str, days: int) -> "LifecycleRule":
        return cls(name, DELETE, days * 86400)

    @classmethod
    def archive_days(cls, name: str, days: int) -> "LifecycleRule":
        return cls(name, ARCHIVE, days * 86400)

    @classmethod
    def compress_days(cls, name: str, days: int) -> "LifecycleRule":
        return cls(name, COMPRESS, days * 86400)


@dataclass
class LifecyclePolicy:
    """lifecycle.rs:75-155."""

    name: str
    collection: str | None = None
    rules: list[LifecycleRule] = field(default_factory=list)
    enabled: bool = True

    def for_collection(self, collection: str) -> "LifecyclePolicy":
        self.collection = collection
        return self

    def with_rule(self, rule: LifecycleRule) -> "LifecyclePolicy":
        self.rules.append(rule)
        return self

    @classmethod
    def ttl_only(cls, name: str, days: int) -> "LifecyclePolicy":
        return cls(name).with_rule(LifecycleRule.ttl_days("ttl", days))

    @classmethod
    def tiered(cls, name: str, compress_days: int, archive_days: int,
               delete_days: int) -> "LifecyclePolicy":
        return (cls(name)
                .with_rule(LifecycleRule.compress_days("compress",
                                                       compress_days))
                .with_rule(LifecycleRule.archive_days("archive",
                                                      archive_days))
                .with_rule(LifecycleRule.ttl_days("delete", delete_days)))

    # -- driver-side evaluation (reference parity) --

    def evaluate(self, age_seconds: int,
                 metadata: dict[str, str] | None = None) -> str:
        """lifecycle.rs:125-155 — LAST matching enabled rule wins."""
        if not self.enabled:
            return NONE
        matched = NONE
        for rule in self.rules:
            if not rule.enabled or age_seconds < rule.age_seconds:
                continue
            if rule.metadata_filter:
                if metadata is None or any(
                        metadata.get(k) != v
                        for k, v in rule.metadata_filter.items()):
                    continue
            matched = rule.action
        return matched

    # -- distributed evaluation --

    def action_column(self, now_ms: int,
                      inserted_at_col: str = "inserted_at") -> F.Column:
        """The whole ladder as ONE when-cascade scan expression.
        Last-match-wins becomes first-match-wins over the REVERSED rule
        list (identical semantics, single pass)."""
        if not self.enabled:
            return F.lit(NONE)
        age_s = (F.lit(now_ms) - F.col(inserted_at_col)) / 1000.0
        out = F.lit(NONE)
        expr = None
        for rule in reversed([r for r in self.rules if r.enabled]):
            cond = age_s >= F.lit(float(rule.age_seconds))
            for k, v in (rule.metadata_filter or {}).items():
                cond = cond & (F.col(k).cast("string") == F.lit(v))
            expr = (F.when(cond, F.lit(rule.action)) if expr is None
                    else expr.when(cond, F.lit(rule.action)))
        return out if expr is None else expr.otherwise(F.lit(NONE))


@dataclass
class LifecycleStats:
    """lifecycle.rs:255-..."""

    evaluations: int = 0
    actions_taken: dict[str, int] = field(default_factory=dict)


class LifecyclePolicyEngine:
    """lifecycle.rs:158-252 wired to the catalog."""

    def __init__(self):
        self.policies: list[LifecyclePolicy] = []
        self.stats = LifecycleStats()

    def add_policy(self, policy: LifecyclePolicy) -> None:
        self.policies.append(policy)

    def remove_policy(self, name: str) -> bool:
        n = len(self.policies)
        self.policies = [p for p in self.policies if p.name != name]
        return len(self.policies) < n

    def policy_for(self, collection_name: str) -> LifecyclePolicy | None:
        """First enabled policy scoped to the collection or unscoped —
        lifecycle.rs:190-210."""
        for p in self.policies:
            if p.enabled and (p.collection is None
                              or p.collection == collection_name):
                return p
        return None

    def evaluate(self, collection_name: str, age_seconds: int,
                 metadata: dict[str, str] | None = None) -> str:
        self.stats.evaluations += 1
        policy = self.policy_for(collection_name)
        action = policy.evaluate(age_seconds, metadata) if policy else NONE
        if action != NONE:
            self.stats.actions_taken[action] = (
                self.stats.actions_taken.get(action, 0) + 1)
        return action

    # -- execution --

    @staticmethod
    def _with_age(collection) -> DataFrame:
        """The collection view with an `inserted_at` (ms) column: the
        column itself when the schema carries one, else each id's
        latest write timestamp derived from the CDC log — one
        aggregation + one join (broadcast when small)."""
        df = collection.df()
        if "inserted_at" in df.columns:
            return df
        last_write = (
            collection.cdc_events()
            .filter(F.col("event_type").isin("insert", "upsert", "update"))
            .groupBy(F.col("vector_id").alias(collection.id_col))
            .agg(F.max("timestamp_ms").alias("inserted_at"))
        )
        return df.join(last_write, collection.id_col, "left")

    def classify(self, collection, *, now_ms: int | None = None,
                 name: str | None = None) -> DataFrame:
        """Every row of the collection plus its lifecycle action — one
        scan (+ the CDC age join when the schema has no inserted_at)."""
        cname = name or collection.path.rstrip("/").rsplit("/", 1)[-1]
        policy = self.policy_for(cname)
        ts = int(time.time() * 1000) if now_ms is None else now_ms
        df = self._with_age(collection)
        col = (policy.action_column(ts) if policy is not None
               else F.lit(NONE))
        return df.withColumn("lifecycle_action", col)

    def apply(self, collection, *, archive_dir: str | None = None,
              now_ms: int | None = None,
              name: str | None = None) -> dict[str, int]:
        """Execute the policy set-wise: archive writes matching rows as
        Parquet then tombstones them; delete tombstones; compress rows
        are RETURNED in the counts and left to plans/tiering.py
        demotion (the serving-representation change).  Returns counts
        per action."""
        # resolve `now` ONCE: classification, the archive snapshot,
        # and the purge predicates must all see the same instant, or a
        # row crossing a threshold mid-job could be tombstoned without
        # having been archived
        now_ms = int(time.time() * 1000) if now_ms is None else now_ms
        classified = self.classify(collection, now_ms=now_ms,
                                   name=name).cache()
        try:
            counts = {
                r["lifecycle_action"]: r["n"]
                for r in classified.groupBy("lifecycle_action")
                .agg(F.count(F.lit(1)).alias("n")).collect()
            }
            cname = name or collection.path.rstrip("/").rsplit("/", 1)[-1]
            policy = self.policy_for(cname)
            ts = now_ms
            native_age = "inserted_at" in collection.df().columns

            def _purge(which: str) -> None:
                if native_age and policy is not None:
                    # the SAME rule expression serves as the tombstone
                    # predicate — fully distributed, no driver id list
                    collection.delete(
                        pred=(policy.action_column(ts) == which),
                        now_ms=now_ms)
                    return
                # age came from the CDC join, which the delete predicate
                # cannot see — tombstone by id in bounded chunks
                victims = classified.filter(
                    F.col("lifecycle_action") == which
                ).select(collection.id_col)
                chunk: list = []
                for row in victims.toLocalIterator():
                    chunk.append(row[0])
                    if len(chunk) >= 100_000:
                        collection.delete(ids=chunk, now_ms=now_ms)
                        chunk = []
                if chunk:
                    collection.delete(ids=chunk, now_ms=now_ms)

            if counts.get(ARCHIVE, 0):
                if archive_dir is None:
                    raise LifecycleError(
                        "policy archives rows but no archive_dir given")
                classified.filter(F.col("lifecycle_action") == ARCHIVE)\
                    .drop("lifecycle_action").write.mode("append")\
                    .parquet(os.path.join(archive_dir, cname))
                _purge(ARCHIVE)
            if counts.get(DELETE, 0):
                _purge(DELETE)
            for action in (ARCHIVE, DELETE, COMPRESS):
                if counts.get(action):
                    self.stats.actions_taken[action] = (
                        self.stats.actions_taken.get(action, 0)
                        + counts[action])
            return {a: counts.get(a, 0)
                    for a in (DELETE, ARCHIVE, COMPRESS, NONE)}
        finally:
            classified.unpersist()
