"""Federated search: config-driven routing across databases/collections.

Reference: /root/reference/src/search/cross_collection.rs:765-798
(federation config), :996-1015 (routing rules — route queries to
collections by filter predicates on query attributes).

A `FederationConfig` names member collections (possibly from different
`Database` roots), per-member weights, and routing rules.  Execution
reuses cross_collection_knn over the routed subset.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class RoutingRule:
    """Route to `targets` when `predicate(query_attrs)` holds."""
    name: str
    predicate: Callable[[dict], bool]
    targets: list[str] = field(default_factory=list)


@dataclass
class FederationConfig:
    members: dict[str, DataFrame] = field(default_factory=dict)   # name -> df
    weights: dict[str, float] = field(default_factory=dict)
    rules: list[RoutingRule] = field(default_factory=list)
    default_targets: list[str] | None = None  # None = all members

    def route(self, query_attrs: dict | None = None) -> dict[str, DataFrame]:
        attrs = query_attrs or {}
        for rule in self.rules:
            if rule.predicate(attrs):
                missing = [t for t in rule.targets if t not in self.members]
                if missing:
                    raise KeyError(f"rule {rule.name!r} targets unknown members {missing}")
                return {t: self.members[t] for t in rule.targets}
        targets = self.default_targets or list(self.members)
        return {t: self.members[t] for t in targets}


def federated_knn(
    config: FederationConfig,
    query_vector,
    k: int = 10,
    query_attrs: dict | None = None,
    **kwargs: Any,
) -> DataFrame:
    """Route by query attributes, then cross-collection search with the
    federation's weights."""
    from needle_spark.operators.cross_collection import cross_collection_knn

    routed = config.route(query_attrs)
    weights = {n: w for n, w in config.weights.items() if n in routed} or None
    return cross_collection_knn(routed, query_vector, k=k, weights=weights, **kwargs)


def embedding_provider_udf(embed_fn: Callable[[str], list[float]]):
    """Extension point mirroring the reference's embedding providers
    (src/embeddings.rs, text_collection.rs): wrap any text->vector
    function (an API client, a local model) as an Arrow-batched pandas
    UDF producing array<float> columns.  Tests use a deterministic
    hash-based fake; production swaps in a real provider."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.apply(lambda t: [float(x) for x in embed_fn(t or "")])

    return _embed


def hash_embedding(dim: int = 16):
    """Deterministic fake provider: token-hash bag-of-words projection —
    useful for tests and offline smoke runs (no network, no model)."""
    import zlib

    from needle_spark.functions.text import tokenize_py

    def _embed(text: str) -> list[float]:
        v = [0.0] * dim
        for t in tokenize_py(text):
            h = zlib.crc32(t.encode())
            v[h % dim] += 1.0 if (h >> 16) % 2 == 0 else -1.0
        norm = sum(x * x for x in v) ** 0.5
        return [x / norm for x in v] if norm else v

    return _embed
