"""Automatic text embedding: backend registry, caching embedder,
batch embedding, model catalog with recommendation (reference:
/root/reference/src/ml/auto_embed.rs — EmbeddingBackend :46-142,
AutoEmbedConfig :144-213, AutoEmbedStats :215-249, AutoEmbedder
:251-600 (embed+cache :314-380, embed_batch :383-470, mock LCG
:540-580), AutoEmbedCollectionBuilder :602-700;
/root/reference/src/ml/model_registry.rs — ModelId catalog :66-155,
QualityTier :160-168, ModelInfo :168-230, list/recommend :541-575.
The ONNX download/inference runtime (model_registry.rs:299-640,
auto_embed.rs Onnx arm) is a model runtime, out of scope — the
catalog, selection, caching, and pipeline plumbing are the query
capability and are fully implemented; a real provider drops in as a
`transport` callable, same pattern as operators/model_clients.py.)

Spark-first angle: `embed_text_column` runs the embedder as ONE
Arrow-batched map stage — the per-executor embedder instance keeps
its own cache, so repeated texts within a partition hit memory, and
API-backed transports batch `batch_size` texts per call.  The mock
backend expands a 64-bit text hash through the reference's exact LCG
(6364136223846793005 multiplier); deviation documented: the seed hash
is blake2b-derived (stable across languages/processes) where the
reference uses Rust's unseeded DefaultHasher, whose value is
unspecified — determinism, not value parity, is the contract.
"""

from __future__ import annotations

import hashlib
import struct
import time as _time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame

_U64 = (1 << 64) - 1
_LCG_MUL = 6364136223846793005     # auto_embed.rs:547


# ---------------------------------------------------------------------------
# Model catalog (model_registry.rs:66-230)

FAST, BALANCED, HIGH_QUALITY = "fast", "balanced", "high_quality"


@dataclass(frozen=True)
class ModelInfo:
    name: str
    dimensions: int
    quality_tier: str
    size_mb: int
    aliases: tuple[str, ...] = ()


MODEL_CATALOG: tuple[ModelInfo, ...] = (
    ModelInfo("all-MiniLM-L6-v2", 384, FAST, 90, ("minilm-l6", "minilm")),
    ModelInfo("all-MiniLM-L12-v2", 384, BALANCED, 130, ("minilm-l12",)),
    ModelInfo("bge-small-en-v1.5", 384, FAST, 130, ("bge-small",)),
    ModelInfo("bge-base-en-v1.5", 768, BALANCED, 440, ("bge-base",)),
    ModelInfo("bge-large-en-v1.5", 1024, HIGH_QUALITY, 1340, ("bge-large",)),
    ModelInfo("e5-small-v2", 384, FAST, 130, ("e5-small",)),
    ModelInfo("e5-base-v2", 768, BALANCED, 440, ("e5-base",)),
    ModelInfo("e5-large-v2", 1024, HIGH_QUALITY, 1340, ("e5-large",)),
    ModelInfo("nomic-embed-text-v1", 768, BALANCED, 550, ("nomic",)),
    ModelInfo("gte-small", 384, FAST, 70, ()),
    ModelInfo("gte-base", 768, BALANCED, 220, ()),
)


class ModelRegistry:
    """Catalog queries (model_registry.rs:299-575, metadata surface)."""

    def __init__(self, models: Sequence[ModelInfo] = MODEL_CATALOG):
        self._models = list(models)
        self._by_name: dict[str, ModelInfo] = {}
        for m in self._models:
            self._by_name[m.name.lower()] = m
            for a in m.aliases:
                self._by_name[a.lower()] = m

    def from_name(self, name: str) -> ModelInfo | None:
        return self._by_name.get(name.lower())

    def list_models(self) -> list[ModelInfo]:
        return list(self._models)

    def list_by_tier(self, tier: str) -> list[ModelInfo]:
        return [m for m in self._models if m.quality_tier == tier]

    def list_by_dimensions(self, dims: int) -> list[ModelInfo]:
        return [m for m in self._models if m.dimensions == dims]

    def recommend_model(self, dimensions: int | None = None,
                        tier: str | None = None,
                        max_size_mb: int | None = None) -> ModelInfo | None:
        """Smallest model meeting every constraint
        (model_registry.rs:562-575)."""
        cands = [
            m for m in self._models
            if (dimensions is None or m.dimensions == dimensions)
            and (tier is None or m.quality_tier == tier)
            and (max_size_mb is None or m.size_mb <= max_size_mb)]
        return min(cands, key=lambda m: m.size_mb) if cands else None


DEFAULT_REGISTRY = ModelRegistry()


# ---------------------------------------------------------------------------
# Backends (auto_embed.rs:46-142)


@dataclass(frozen=True)
class EmbeddingBackend:
    kind: str                      # mock | openai | ollama | registry | custom
    dimensions: int
    model: str = ""
    base_url: str = ""
    api_key: str = ""

    @staticmethod
    def mock(dimensions: int) -> "EmbeddingBackend":
        return EmbeddingBackend("mock", int(dimensions))

    @staticmethod
    def openai(api_key: str, model: str,
               dimensions: int) -> "EmbeddingBackend":
        return EmbeddingBackend("openai", int(dimensions), model,
                                "https://api.openai.com/v1/embeddings",
                                api_key)

    @staticmethod
    def ollama(base_url: str, model: str,
               dimensions: int = 768) -> "EmbeddingBackend":
        return EmbeddingBackend("ollama", int(dimensions), model, base_url)

    @staticmethod
    def from_registry(model_name: str,
                      registry: ModelRegistry = DEFAULT_REGISTRY
                      ) -> "EmbeddingBackend":
        info = registry.from_name(model_name)
        if info is None:
            raise ValueError(f"unknown registry model {model_name!r}")
        return EmbeddingBackend("registry", info.dimensions, info.name)


# ---------------------------------------------------------------------------
# Embedder (auto_embed.rs:144-600)


@dataclass
class AutoEmbedConfig:
    backend: EmbeddingBackend
    cache_size: int = 10_000
    cache_ttl_seconds: float = 0.0     # 0 = no expiry
    batch_size: int = 32
    max_text_length: int = 8192
    normalize: bool = True
    cache_enabled: bool = True

    @staticmethod
    def mock(dimensions: int) -> "AutoEmbedConfig":
        return AutoEmbedConfig(EmbeddingBackend.mock(dimensions))


def _text_hash64(text: str) -> int:
    """Stable 64-bit seed (deviation from Rust DefaultHasher — see
    module docstring)."""
    return struct.unpack(
        "<Q", hashlib.blake2b(text.encode("utf-8"),
                              digest_size=8).digest())[0]


def mock_embedding(text: str, dimensions: int,
                   normalize: bool = True) -> list[float]:
    """Deterministic LCG expansion of the text hash
    (auto_embed.rs:540-580, same multiplier/shift/scale)."""
    state = _text_hash64(text)
    out = []
    for _ in range(dimensions):
        state = (state * _LCG_MUL + 1) & _U64
        out.append((state >> 33) / 0xFFFFFFFF * 2.0 - 1.0)
    if normalize:
        norm = sum(v * v for v in out) ** 0.5
        if norm > 0.0:
            out = [v / norm for v in out]
    return [float(v) for v in out]


@dataclass
class AutoEmbedStats:
    embeddings_generated: int = 0
    cache_hits: int = 0
    cache_misses: int = 0
    texts_processed: int = 0
    chars_processed: int = 0

    @property
    def cache_hit_ratio(self) -> float:
        total = self.cache_hits + self.cache_misses
        return self.cache_hits / total if total else 0.0


class AutoEmbedder:
    """Caching text embedder (auto_embed.rs:251-600).  `transport`
    overrides the API call for openai/ollama backends:
    transport(texts: list[str]) -> list[list[float]] — the production
    swap point (mirrors model_clients.py)."""

    def __init__(self, config: AutoEmbedConfig,
                 transport: Callable[[list[str]], list[list[float]]] | None
                 = None):
        self.config = config
        self._transport = transport
        self._cache: dict[int, tuple[list[float], float]] = {}
        self.stats = AutoEmbedStats()

    @property
    def dimensions(self) -> int:
        return self.config.backend.dimensions

    def _now(self, now_s: float | None) -> float:
        return _time.time() if now_s is None else float(now_s)

    def _generate_batch(self, texts: list[str]) -> list[list[float]]:
        be = self.config.backend
        if be.kind in ("mock", "registry", "custom"):
            return [mock_embedding(t, be.dimensions, self.config.normalize)
                    for t in texts]
        if self._transport is None:
            raise RuntimeError(
                f"{be.kind} backend requires a transport callable "
                "(no network client is baked in)")
        out = self._transport(texts)
        for v in out:
            if len(v) != be.dimensions:
                raise ValueError(
                    f"transport returned dim {len(v)}, "
                    f"expected {be.dimensions}")
        return [[float(x) for x in v] for v in out]

    def embed(self, text: str, now_s: float | None = None) -> list[float]:
        return self.embed_batch([text], now_s=now_s)[0]

    def embed_batch(self, texts: Sequence[str],
                    now_s: float | None = None) -> list[list[float]]:
        """Chunked, cache-deduplicated batch embedding
        (auto_embed.rs:383-470)."""
        now = self._now(now_s)
        ttl = self.config.cache_ttl_seconds
        results: list[list[float] | None] = [None] * len(texts)
        todo: list[tuple[int, str]] = []
        for i, raw in enumerate(texts):
            t = raw[:self.config.max_text_length]
            h = _text_hash64(t)
            if self.config.cache_enabled:
                hit = self._cache.get(h)
                if hit is not None and (ttl == 0 or now - hit[1] < ttl):
                    self.stats.cache_hits += 1
                    results[i] = hit[0]
                    continue
                self.stats.cache_misses += 1
            todo.append((i, t))
        bs = max(self.config.batch_size, 1)
        for lo in range(0, len(todo), bs):
            chunk = todo[lo:lo + bs]
            embs = self._generate_batch([t for _, t in chunk])
            for (i, t), e in zip(chunk, embs):
                results[i] = e
                self.stats.embeddings_generated += 1
                self.stats.texts_processed += 1
                self.stats.chars_processed += len(t)
                if self.config.cache_enabled:
                    if len(self._cache) >= self.config.cache_size:
                        oldest = min(self._cache,
                                     key=lambda k: self._cache[k][1])
                        del self._cache[oldest]
                    self._cache[_text_hash64(t)] = (e, now)
        return results      # type: ignore[return-value]

    def clear_cache(self) -> None:
        self._cache.clear()

    def cache_stats(self) -> tuple[int, int, int]:
        return (len(self._cache), self.stats.cache_hits,
                self.stats.cache_misses)


# ---------------------------------------------------------------------------
# Spark pipeline


def embed_text_column(df: DataFrame, text_col: str,
                      config: AutoEmbedConfig,
                      out_col: str = "embedding",
                      transport_factory: Callable[[], Callable] | None = None
                      ) -> DataFrame:
    """Embed a text column as ONE Arrow-batched map stage.  Each
    executor builds its own AutoEmbedder (caching repeats within its
    partitions); `transport_factory` constructs the API client ON THE
    EXECUTOR so nothing unpicklable crosses the boundary."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _embed(series):
        transport = transport_factory() if transport_factory else None
        embedder = AutoEmbedder(config, transport=transport)
        return pd.Series(
            embedder.embed_batch([("" if t is None else str(t))
                                  for t in series]))

    udf = F.pandas_udf(_embed, T.ArrayType(T.FloatType()))
    return df.withColumn(out_col, udf(F.col(text_col)))


class AutoEmbedCollectionBuilder:
    """auto_embed.rs:602-700: build a TextCollection wired to an
    AutoEmbedder."""

    def __init__(self, name: str):
        self.name = name
        self._config: AutoEmbedConfig | None = None
        self._transport = None

    def with_backend(self, backend: EmbeddingBackend
                     ) -> "AutoEmbedCollectionBuilder":
        self._config = AutoEmbedConfig(backend)
        return self

    def with_cache(self, size: int) -> "AutoEmbedCollectionBuilder":
        self._cfg().cache_size = int(size)
        return self

    def without_cache(self) -> "AutoEmbedCollectionBuilder":
        self._cfg().cache_enabled = False
        return self

    def with_batch_size(self, n: int) -> "AutoEmbedCollectionBuilder":
        self._cfg().batch_size = int(n)
        return self

    def with_transport(self, transport) -> "AutoEmbedCollectionBuilder":
        self._transport = transport
        return self

    def _cfg(self) -> AutoEmbedConfig:
        if self._config is None:
            raise ValueError("set a backend first (with_backend)")
        return self._config

    def build(self, db) -> Any:
        """Returns a TextCollection whose embed_fn is the embedder."""
        from needle_spark.operators.text_collection import TextCollection

        embedder = AutoEmbedder(self._cfg(), transport=self._transport)
        return TextCollection.create(
            db, self.name, embed_fn=embedder.embed,
            dims=embedder.dimensions)
