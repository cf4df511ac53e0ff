"""Live-model client shims for rerankers and embedding providers.

The reference treats Cohere / cross-encoder rerankers and hosted
embedding models as external API calls (reranker.rs:134-358,
embeddings.rs); these clients are the Spark-side twin.  Each client
takes an injectable `transport` (a plain callable doing one HTTP POST)
so tests run with a mock and zero network, and production uses the
stdlib urllib default — no extra dependencies.

Spark contract: clients are small picklable objects; a client captured
in a pandas UDF closure ships to executors, where each Arrow batch
becomes ONE model-API call (`scores_udf`) — never one call per row.
Wire them through the existing extension points:

    client = CohereRerankClient(CohereConfig(api_key=...))
    reranked = candidates.withColumn(
        "model_score", client.scores_udf()(F.lit(query), F.col("text")))

    embed = CohereEmbedClient(...); embedding_provider_udf(embed.embed)
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Sequence

import pandas as pd

from .rerank import CohereConfig, HuggingFaceConfig

Transport = Callable[[str, dict, dict, float], dict]
"""(url, headers, json_body, timeout_secs) -> decoded JSON response."""


class ModelClientError(RuntimeError):
    pass


def urllib_transport(url: str, headers: dict, body: dict,
                     timeout: float) -> dict:
    """Default production transport: one POST via the stdlib (imported
    lazily so executors only pay for it when a call actually fires)."""
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


@dataclass
class RetryPolicy:
    """Bounded exponential backoff for transient transport failures —
    model APIs rate-limit, and a 1000-task stage must not melt down on
    one 429."""

    max_attempts: int = 3
    backoff_secs: float = 0.5

    def run(self, fn: Callable[[], dict]) -> dict:
        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — transport-defined
                last = e
                if attempt + 1 < self.max_attempts:
                    time.sleep(self.backoff_secs * (2 ** attempt))
        raise ModelClientError(
            f"model API failed after {self.max_attempts} attempts: {last}"
        ) from last


class CohereRerankClient:
    """Cohere /rerank endpoint (reranker.rs:134-168 request/response
    shape): POST {model, query, documents, top_n} -> results[].{index,
    relevance_score}."""

    def __init__(self, config: CohereConfig | None = None,
                 transport: Transport | None = None,
                 retry: RetryPolicy | None = None):
        self.config = config or CohereConfig()
        self.transport = transport or urllib_transport
        self.retry = retry or RetryPolicy()

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.config.api_key}"}

    def rerank_batch(self, query: str, texts: Sequence[str]) -> list[float]:
        """Scores aligned with `texts` (one API call)."""
        if not texts:
            return []
        body = {
            "model": self.config.model,
            "query": query,
            "documents": list(texts),
            "top_n": len(texts),
        }
        resp = self.retry.run(lambda: self.transport(
            f"{self.config.base_url}/rerank", self._headers(), body,
            float(self.config.timeout_secs)))
        scores = [0.0] * len(texts)
        for r in resp.get("results", []):
            scores[int(r["index"])] = float(r["relevance_score"])
        return scores

    def score(self, query: str, text: str) -> float:
        """Single-pair convenience for rerank_udf(client.score) — fine
        for driver-side pools; prefer scores_udf for Spark stages."""
        return self.rerank_batch(query, [text])[0]

    def scores_udf(self):
        """Arrow-batched pandas UDF: ONE API call per (batch, distinct
        query) — the per-row shape of rerank_udf(client.score) would
        make an HTTP round-trip per candidate."""
        from pyspark.sql.functions import pandas_udf

        client = self

        @pandas_udf("double")
        def _scores(query: pd.Series, text: pd.Series) -> pd.Series:
            out = pd.Series(0.0, index=text.index)
            for q, idx in query.groupby(query).groups.items():
                out.loc[idx] = client.rerank_batch(str(q), text.loc[idx].tolist())
            return out

        return _scores


class CohereEmbedClient:
    """Cohere /embed endpoint: POST {model, texts} -> embeddings[][].
    `embed` plugs straight into federated.embedding_provider_udf."""

    def __init__(self, api_key: str = "", model: str = "embed-english-v3.0",
                 base_url: str = "https://api.cohere.ai/v1",
                 timeout_secs: int = 30,
                 transport: Transport | None = None,
                 retry: RetryPolicy | None = None):
        self.api_key = api_key
        self.model = model
        self.base_url = base_url
        self.timeout_secs = timeout_secs
        self.transport = transport or urllib_transport
        self.retry = retry or RetryPolicy()

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        if not texts:
            return []
        body = {"model": self.model, "texts": list(texts)}
        resp = self.retry.run(lambda: self.transport(
            f"{self.base_url}/embed",
            {"Authorization": f"Bearer {self.api_key}"}, body,
            float(self.timeout_secs)))
        return [[float(x) for x in e] for e in resp["embeddings"]]

    def embed(self, text: str) -> list[float]:
        return self.embed_batch([text])[0]


@dataclass
class CrossEncoderClient:
    """Local cross-encoder (reranker.rs:307-358): no HTTP — `predictor`
    is an injectable callable([(query, text)]) -> scores.  Production
    wires sentence-transformers; the sandbox (and any test) injects a
    deterministic predictor."""

    config: HuggingFaceConfig = field(default_factory=HuggingFaceConfig)
    predictor: Callable[[list[tuple[str, str]]], Sequence[float]] | None = None

    def _resolve(self):
        if self.predictor is not None:
            return self.predictor
        try:
            from sentence_transformers import CrossEncoder  # noqa
        except ImportError as e:
            raise ModelClientError(
                "cross-encoder scoring needs sentence-transformers or an "
                "injected predictor") from e
        model = CrossEncoder(self.config.model, device=self.config.device,
                             max_length=self.config.max_length)
        return lambda pairs: model.predict(
            pairs, batch_size=self.config.batch_size)

    def rerank_batch(self, query: str, texts: Sequence[str]) -> list[float]:
        if not texts:
            return []
        return [float(s) for s in
                self._resolve()([(query, t) for t in texts])]

    def score(self, query: str, text: str) -> float:
        return self.rerank_batch(query, [text])[0]
