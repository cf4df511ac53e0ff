"""Framework integrations: LangChain-compatible VectorStore and a
LlamaIndex-compatible vector store index over the catalog, sharing one
Spark-backed store.

Reference: /root/reference/src/integrations/ —
* langchain.rs: Document (:100-157: page_content + metadata + id),
  NeedleVectorStoreConfig (:160-212: store_content under a content
  key), RelevanceScoreFunction (:216-250: cosine 1-d, euclidean
  1/(1+d), dot (d+1)/2, max-inner-product -d), NeedleVectorStore
  (:252-720): add_texts/add_documents (:310-383: per-item metadata,
  content stored under content_key, generated ids),
  similarity_search / _with_filter / _with_score /
  _with_relevance_scores (threshold cut) (:385-455),
  max_marginal_relevance_search (:457-525), delete/get/
  update_metadata (:527-600), batch_similarity_search (:686-720).
* llamaindex.rs: TextNode with prev/next/source relationships
  serialized into metadata (:74-266), NodeWithScore (:269-278),
  NeedleVectorStoreIndex (:282-...): add_nodes, retrieve.
* framework_common.rs: shared collection plumbing.

The adapters are duck-typed to the frameworks' method names and
shapes, so application code written against LangChain's VectorStore /
LlamaIndex's VectorStoreIndex ports by swapping the import — no
framework package is required (and none is assumed present).

Spark shape: every search is the engine's exact-kNN plan
(TakeOrderedAndProject over the collection scan); adds are batched
DataFrame upserts, not per-row inserts; MMR re-ranks only the
fetch_k-bounded candidate page (reference parity)."""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

from pyspark.sql import functions as F

from needle_spark.operators.knn import knn
from needle_spark.operators.rerank import mmr_diversify


class IntegrationError(ValueError):
    pass


#: RelevanceScoreFunction — langchain.rs:216-250.
RELEVANCE_FNS = {
    "cosine": lambda d: 1.0 - d,
    "euclidean": lambda d: 1.0 / (1.0 + d),
    "dot_product": lambda d: (d + 1.0) / 2.0,
    "max_inner_product": lambda d: -d,
}


@dataclass
class Document:
    """langchain.rs:100-157."""

    page_content: str
    metadata: dict = dc_field(default_factory=dict)
    id: str = ""

    def __post_init__(self):
        if not self.id:
            self.id = f"doc-{uuid.uuid4().hex}"


@dataclass
class VectorStoreConfig:
    """NeedleVectorStoreConfig — langchain.rs:160-212."""

    collection_name: str
    embedding_dimension: int
    distance_function: str = "cosine"
    relevance_score_fn: str = "cosine"
    store_content: bool = True
    content_key: str = "_page_content"

    def __post_init__(self):
        if self.relevance_score_fn not in RELEVANCE_FNS:
            raise IntegrationError(
                f"unknown relevance fn {self.relevance_score_fn!r}; "
                f"one of {sorted(RELEVANCE_FNS)}")

    def to_relevance_score(self, distance: float) -> float:
        return RELEVANCE_FNS[self.relevance_score_fn](distance)


_SCHEMA = "id string, vector array<float>, text string, metadata string"


class SparkVectorStore:
    """NeedleVectorStore — langchain.rs:252-720, duck-typed to
    LangChain's VectorStore method surface."""

    def __init__(self, database, config: VectorStoreConfig):
        from needle_spark.catalog import CollectionError
        self.config = config
        self.database = database
        try:
            self.collection = database.create_collection(
                config.collection_name, dims=config.embedding_dimension,
                metric=config.distance_function, schema=_SCHEMA)
        except CollectionError:
            self.collection = database.collection(config.collection_name)

    @classmethod
    def from_collection(cls, database, collection,
                        config: VectorStoreConfig) -> "SparkVectorStore":
        store = cls.__new__(cls)
        store.config = config
        store.database = database
        store.collection = collection
        return store

    def __len__(self) -> int:
        return self.collection.count()

    @property
    def collection_name(self) -> str:
        return self.config.collection_name

    @property
    def embedding_dimension(self) -> int:
        return self.config.embedding_dimension

    # -- writes --

    def add_texts(
        self,
        texts: Sequence[str],
        embeddings: Sequence[Sequence[float]],
        metadatas: Sequence[dict] | None = None,
        ids: Sequence[str] | None = None,
    ) -> list[str]:
        """langchain.rs:310-357 — ONE batched upsert, not a row loop."""
        if len(texts) != len(embeddings):
            raise IntegrationError(
                "Number of texts must match number of embeddings")
        if metadatas is not None and len(metadatas) != len(texts):
            raise IntegrationError(
                "Number of metadatas must match number of texts")
        out_ids = [
            (ids[i] if ids and i < len(ids) and ids[i]
             else f"doc-{uuid.uuid4().hex}")
            for i in range(len(texts))
        ]
        rows = []
        for i, (text, emb) in enumerate(zip(texts, embeddings)):
            meta = dict(metadatas[i]) if metadatas else {}
            if self.config.store_content:
                meta[self.config.content_key] = text
            rows.append((out_ids[i], [float(x) for x in emb], text,
                         json.dumps(meta)))
        df = self.database.spark.createDataFrame(rows, _SCHEMA)
        self.collection.upsert(df)
        return out_ids

    def add_documents(self, documents: Sequence[Document],
                      embeddings: Sequence[Sequence[float]]) -> list[str]:
        """langchain.rs:359-383."""
        if len(documents) != len(embeddings):
            raise IntegrationError(
                "Number of documents must match number of embeddings")
        return self.add_texts(
            [d.page_content for d in documents], embeddings,
            [d.metadata for d in documents], [d.id for d in documents])

    def delete(self, ids: Sequence[str]) -> bool:
        """langchain.rs:527-545."""
        return self.collection.delete(ids=list(ids)) > 0

    def get(self, id: str) -> Document | None:
        """langchain.rs:547-575."""
        row = self.collection.get(id)
        if row is None:
            return None
        return self._row_to_document(row)

    def update_metadata(self, id: str, metadata: dict) -> None:
        """langchain.rs:577-600 — content key preserved."""
        row = self.collection.get(id)
        if row is None:
            raise IntegrationError(f"document {id!r} not found")
        meta = dict(metadata)
        if self.config.store_content:
            old = json.loads(row["metadata"] or "{}")
            if self.config.content_key in old:
                meta.setdefault(self.config.content_key,
                                old[self.config.content_key])
        df = self.database.spark.createDataFrame(
            [(id, list(row["vector"]), row["text"], json.dumps(meta))],
            _SCHEMA)
        self.collection.upsert(df)

    # -- reads --

    def _row_to_document(self, row) -> Document:
        meta = json.loads(row["metadata"] or "{}")
        content = meta.get(self.config.content_key, row["text"] or "")
        return Document(page_content=content,
                        metadata={k: v for k, v in meta.items()
                                  if k != self.config.content_key},
                        id=row["id"])

    @staticmethod
    def _json_scalar(v) -> str:
        """get_json_object returns scalars in their JSON spelling
        (true/false, bare numbers) — match that, not Python's str()."""
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return json.dumps(v)
        return str(v)

    def _filter_column(self, filter: dict | None):
        if not filter:
            return None
        cond = F.lit(True)
        for k, v in filter.items():
            cond = cond & (F.get_json_object(F.col("metadata"), f"$.{k}")
                           == F.lit(self._json_scalar(v)))
        return cond

    def _search_df(self, query_embedding, k, filter=None):
        return knn(
            self.collection.df(), list(query_embedding), k=k,
            metric=self.config.distance_function,
            filter=self._filter_column(filter),
            vector_col="vector", id_col="id",
        )

    def similarity_search(self, query_embedding: Sequence[float],
                          k: int = 4, filter: dict | None = None
                          ) -> list[tuple[Document, float]]:
        """langchain.rs:385-413 — returns (Document, distance)."""
        rows = self._search_df(query_embedding, k, filter).collect()
        return [(self._row_to_document(r), float(r["distance"]))
                for r in rows]

    # LangChain parity alias — langchain.rs:415-424
    similarity_search_with_score = similarity_search

    def similarity_search_with_relevance_scores(
        self, query_embedding: Sequence[float], k: int = 4,
        score_threshold: float | None = None,
    ) -> list[tuple[Document, float]]:
        """langchain.rs:426-455 — distances mapped through the
        configured relevance function, optional threshold cut."""
        out = [(doc, self.config.to_relevance_score(d))
               for doc, d in self.similarity_search(query_embedding, k)]
        if score_threshold is not None:
            out = [(doc, s) for doc, s in out if s >= score_threshold]
        return out

    def max_marginal_relevance_search(
        self, query_embedding: Sequence[float], k: int = 4,
        fetch_k: int = 20, lambda_mult: float = 0.5,
        filter: dict | None = None,
    ) -> list[tuple[Document, float]]:
        """langchain.rs:457-525 — fetch_k candidates, greedy MMR."""
        cands = self._search_df(query_embedding, fetch_k, filter)
        picked = mmr_diversify(cands, list(query_embedding), k=k,
                               lambda_mult=lambda_mult)
        # mmr_diversify returns (id, vector, distance) rows; rehydrate
        # text/metadata with one bounded lookup of the picked ids
        ids = [r["id"] for r in picked]
        full = {r["id"]: r for r in self.collection.df()
                .filter(F.col("id").isin(ids)).collect()}
        return [(self._row_to_document(full[r["id"]]), float(r["distance"]))
                for r in picked]

    def batch_similarity_search(
        self, query_embeddings: Sequence[Sequence[float]], k: int = 4,
    ) -> list[list[tuple[Document, float]]]:
        """langchain.rs:686-720 — one distributed batch-kNN job."""
        from needle_spark.operators.knn import batch_knn
        qdf = self.database.spark.createDataFrame(
            [(i, [float(x) for x in q])
             for i, q in enumerate(query_embeddings)],
            "query_id long, vector array<float>")
        res = batch_knn(
            self.collection.df(), qdf, k=k,
            metric=self.config.distance_function).collect()
        hit_ids = list({r["id"] for r in res})
        docs = {r["id"]: r for r in self.collection.df()
                .filter(F.col("id").isin(hit_ids)).collect()}
        out: list[list[tuple[Document, float]]] = [
            [] for _ in query_embeddings]
        for r in res:
            out[int(r["query_id"])].append(
                (self._row_to_document(docs[r["id"]]), float(r["distance"])))
        return out


# ---------------------------------------------------------- llamaindex


@dataclass
class TextNode:
    """llamaindex.rs:74-266: text + relationships serialized into the
    store metadata."""

    text: str
    id: str = ""
    metadata: dict = dc_field(default_factory=dict)
    source_node_id: str | None = None
    prev_node_id: str | None = None
    next_node_id: str | None = None
    start_char_idx: int | None = None
    end_char_idx: int | None = None

    def __post_init__(self):
        if not self.id:
            self.id = f"node-{uuid.uuid4().hex}"

    def to_metadata(self) -> dict:
        """llamaindex.rs:202-233."""
        meta = dict(self.metadata)
        meta["_node_text"] = self.text
        for key, val in (("_source_node", self.source_node_id),
                         ("_prev_node", self.prev_node_id),
                         ("_next_node", self.next_node_id),
                         ("_start_char", self.start_char_idx),
                         ("_end_char", self.end_char_idx)):
            if val is not None:
                meta[key] = val
        return meta

    @classmethod
    def from_metadata(cls, id: str, meta: dict) -> "TextNode":
        """llamaindex.rs:236-266."""
        return cls(
            text=meta.get("_node_text", ""), id=id,
            metadata={k: v for k, v in meta.items()
                      if not k.startswith("_")},
            source_node_id=meta.get("_source_node"),
            prev_node_id=meta.get("_prev_node"),
            next_node_id=meta.get("_next_node"),
            start_char_idx=meta.get("_start_char"),
            end_char_idx=meta.get("_end_char"))


@dataclass
class NodeWithScore:
    """llamaindex.rs:269-278."""

    node: TextNode
    score: float


class SparkVectorStoreIndex:
    """NeedleVectorStoreIndex — llamaindex.rs:282-...; shares the
    LangChain store's collection plumbing (framework_common.rs)."""

    def __init__(self, database, collection_name: str, embed_dim: int,
                 distance_function: str = "cosine"):
        self.store = SparkVectorStore(database, VectorStoreConfig(
            collection_name, embed_dim, distance_function,
            store_content=False))

    def add_nodes(self, nodes: Sequence[TextNode],
                  embeddings: Sequence[Sequence[float]]) -> list[str]:
        if len(nodes) != len(embeddings):
            raise IntegrationError(
                "Number of nodes must match number of embeddings")
        return self.store.add_texts(
            [n.text for n in nodes], embeddings,
            [n.to_metadata() for n in nodes], [n.id for n in nodes])

    def retrieve(self, query_embedding: Sequence[float],
                 similarity_top_k: int = 2) -> list[NodeWithScore]:
        rows = self.store._search_df(
            query_embedding, similarity_top_k).collect()
        out = []
        for r in rows:
            meta = json.loads(r["metadata"] or "{}")
            out.append(NodeWithScore(
                node=TextNode.from_metadata(r["id"], meta),
                score=self.store.config.to_relevance_score(
                    float(r["distance"]))))
        return out

    def delete_nodes(self, ids: Sequence[str]) -> bool:
        return self.store.delete(ids)


# ------------------------------------------------------------- haystack


@dataclass
class HaystackDocument:
    """haystack.rs:35-88: content + content_type (text/table/image) +
    metadata + optional score."""

    id: str
    content: str
    content_type: str = "text"
    metadata: dict = dc_field(default_factory=dict)
    score: float | None = None


OVERWRITE = "overwrite"
SKIP = "skip"
ERROR = "error"


class SparkDocumentStore:
    """NeedleDocumentStore — haystack.rs:132-260, duck-typed to
    Haystack's DocumentStore surface.  write_documents applies the
    duplicate policy set-wise (one membership join + batched upsert,
    not the reference's per-row loop)."""

    def __init__(self, database, collection_name: str,
                 embedding_dimension: int, *,
                 duplicate_policy: str = OVERWRITE,
                 content_key: str = "_content"):
        if duplicate_policy not in (OVERWRITE, SKIP, ERROR):
            raise IntegrationError("duplicate_policy: overwrite|skip|error")
        self.duplicate_policy = duplicate_policy
        self.store = SparkVectorStore(database, VectorStoreConfig(
            collection_name, embedding_dimension, content_key=content_key))

    def write_documents(self, documents: Sequence[HaystackDocument],
                        embeddings: Sequence[Sequence[float]]) -> int:
        """haystack.rs:159-217."""
        if len(documents) != len(embeddings):
            raise IntegrationError(
                f"Document count ({len(documents)}) must match embedding "
                f"count ({len(embeddings)})")
        docs, embs = list(documents), list(embeddings)
        if self.duplicate_policy in (SKIP, ERROR):
            existing = {
                r["id"] for r in self.store.collection.df()
                .filter(F.col("id").isin([d.id for d in docs]))
                .select("id").collect()
            }
            if existing and self.duplicate_policy == ERROR:
                raise IntegrationError(
                    f"duplicate ids: {sorted(existing)}")
            keep = [(d, e) for d, e in zip(docs, embs)
                    if d.id not in existing]
            if not keep:
                return 0
            docs, embs = [d for d, _ in keep], [e for _, e in keep]
        self.store.add_texts(
            [d.content for d in docs], embs,
            [dict(d.metadata, _content_type=d.content_type) for d in docs],
            [d.id for d in docs])
        return len(docs)

    def delete_documents(self, ids: Sequence[str]) -> int:
        """haystack.rs:219-228."""
        return self.store.collection.delete(ids=list(ids))

    def query_by_embedding(self, query_embedding: Sequence[float],
                           top_k: int = 10, filters: dict | None = None
                           ) -> list[HaystackDocument]:
        """haystack.rs:230-249 — scored documents, best first."""
        out = []
        for doc, dist in self.store.similarity_search(
                query_embedding, k=top_k, filter=filters):
            meta = dict(doc.metadata)
            ctype = meta.pop("_content_type", "text")
            out.append(HaystackDocument(
                id=doc.id, content=doc.page_content, content_type=ctype,
                metadata=meta,
                score=self.store.config.to_relevance_score(dist)))
        return out

    def count_documents(self) -> int:
        return len(self.store)


# --------------------------------------------------------------- crewai


@dataclass
class CrewAiConfig:
    """crewai.rs:37-72."""

    max_memories: int = 10
    relevance_threshold: float = 0.0
    distance_function: str = "cosine"
    content_key: str = "_content"
    agent_key: str = "_agent"


@dataclass
class Memory:
    """crewai.rs:79-93."""

    id: str
    content: str
    agent: str
    relevance: float
    metadata: dict | None = None


class CrewAiMemoryStore:
    """crewai.rs:98-200 — agent memory over the shared store."""

    def __init__(self, database, collection_name: str,
                 embedding_dimension: int,
                 config: CrewAiConfig | None = None):
        self.config = config or CrewAiConfig()
        self.store = SparkVectorStore(database, VectorStoreConfig(
            collection_name, embedding_dimension,
            self.config.distance_function,
            content_key=self.config.content_key))

    def remember(self, agent: str, content: str,
                 embedding: Sequence[float],
                 metadata: dict | None = None) -> str:
        """crewai.rs:127-171."""
        meta = dict(metadata or {})
        meta[self.config.agent_key] = agent
        return self.store.add_texts([content], [embedding], [meta])[0]

    remember_with_metadata = remember

    def recall(self, query: Sequence[float],
               top_k: int | None = None) -> list[Memory]:
        """crewai.rs:174-186: k capped at max_memories, relevance
        thresholded."""
        k = min(top_k or self.config.max_memories,
                self.config.max_memories)
        out = []
        for doc, dist in self.store.similarity_search(query, k=k):
            rel = self.store.config.to_relevance_score(dist)
            if rel >= self.config.relevance_threshold:
                meta = dict(doc.metadata)
                agent = meta.pop(self.config.agent_key, "")
                out.append(Memory(id=doc.id, content=doc.page_content,
                                  agent=agent, relevance=rel,
                                  metadata=meta or None))
        return out

    def forget(self, id: str) -> bool:
        """crewai.rs:188-191."""
        return self.store.delete([id])

    def __len__(self) -> int:
        return len(self.store)


# ------------------------------------------------------ semantic kernel


@dataclass
class MemoryRecord:
    """semantic_kernel.rs:35-85."""

    id: str
    text: str
    description: str = ""
    external_source_name: str = ""
    is_reference: bool = False
    timestamp: str = ""
    additional_metadata: dict = dc_field(default_factory=dict)


@dataclass
class MemoryQueryResult:
    """semantic_kernel.rs:88-98."""

    record: MemoryRecord
    relevance: float


class SemanticKernelMemoryStore:
    """NeedleMemoryStore — semantic_kernel.rs:101-...: a multi-
    collection memory store (Semantic Kernel's IMemoryStore shape)."""

    def __init__(self, database, embedding_dimension: int):
        self.database = database
        self.embedding_dimension = embedding_dimension
        self._stores: dict[str, SparkVectorStore] = {}

    def create_collection(self, name: str) -> None:
        if name not in self._stores:
            self._stores[name] = SparkVectorStore(
                self.database, VectorStoreConfig(
                    name, self.embedding_dimension, store_content=False))

    def has_collection(self, name: str) -> bool:
        return name in self._stores

    def delete_collection(self, name: str) -> bool:
        store = self._stores.pop(name, None)
        if store is None:
            return False
        store.collection.clear()
        return True

    def list_collections(self) -> list[str]:
        return sorted(self._stores)

    def _store(self, name: str) -> SparkVectorStore:
        if name not in self._stores:
            raise IntegrationError(f"no such collection: {name}")
        return self._stores[name]

    def upsert(self, collection_name: str, record: MemoryRecord,
               embedding: Sequence[float]) -> str:
        """semantic_kernel.rs:136-176 — record fields serialize under
        underscore keys."""
        self.create_collection(collection_name)
        meta = {
            "_text": record.text,
            "_description": record.description,
            "_external_source": record.external_source_name,
            "_is_reference": record.is_reference,
            "_timestamp": record.timestamp,
            "_additional": record.additional_metadata,
        }
        self._stores[collection_name].add_texts(
            [record.text], [embedding], [meta], [record.id])
        return record.id

    def get(self, collection_name: str, id: str) -> MemoryRecord | None:
        row = self._store(collection_name).collection.get(id)
        if row is None:
            return None
        meta = json.loads(row["metadata"] or "{}")
        return MemoryRecord(
            id=id, text=meta.get("_text", ""),
            description=meta.get("_description", ""),
            external_source_name=meta.get("_external_source", ""),
            is_reference=bool(meta.get("_is_reference", False)),
            timestamp=meta.get("_timestamp", ""),
            additional_metadata=meta.get("_additional", {}) or {})

    def remove(self, collection_name: str, id: str) -> bool:
        return self._store(collection_name).delete([id])

    def get_nearest_matches(self, collection_name: str,
                            embedding: Sequence[float], limit: int = 1,
                            min_relevance: float = 0.0
                            ) -> list[MemoryQueryResult]:
        store = self._store(collection_name)
        out = []
        for doc, dist in store.similarity_search(embedding, k=limit):
            rel = store.config.to_relevance_score(dist)
            if rel >= min_relevance:
                out.append(MemoryQueryResult(
                    record=self.get(collection_name, doc.id), relevance=rel))
        return out


# ------------------------------------------------------------ vercel ai


@dataclass
class VercelAiConfig:
    """vercel_ai.rs:37-71."""

    max_results: int = 10
    score_threshold: float | None = None
    include_metadata: bool = True
    distance_function: str = "cosine"
    content_key: str = "_content"


@dataclass
class RetrievalResult:
    """vercel_ai.rs:74-87."""

    id: str
    content: str
    score: float
    metadata: dict | None = None


class VercelAiStore:
    """vercel_ai.rs:91-200 — the AI-SDK retrieval shape."""

    def __init__(self, database, collection_name: str,
                 embedding_dimension: int,
                 config: VercelAiConfig | None = None):
        self.config = config or VercelAiConfig()
        self.store = SparkVectorStore(database, VectorStoreConfig(
            collection_name, embedding_dimension,
            self.config.distance_function,
            content_key=self.config.content_key))

    def add_document(self, id: str, content: str,
                     embedding: Sequence[float],
                     metadata: dict | None = None) -> str:
        """vercel_ai.rs:143-160."""
        return self.store.add_texts([content], [embedding],
                                    [metadata or {}], [id])[0]

    def add_documents(self, items: Sequence[tuple],
                      ) -> list[str]:
        """vercel_ai.rs:162-184 — items of (id, content, embedding[,
        metadata])."""
        ids = [it[0] for it in items]
        return self.store.add_texts(
            [it[1] for it in items], [it[2] for it in items],
            [it[3] if len(it) > 3 and it[3] else {} for it in items], ids)

    def retrieve(self, query_embedding: Sequence[float],
                 top_k: int | None = None) -> list[RetrievalResult]:
        """vercel_ai.rs:122-141 — capped, thresholded, metadata
        optional."""
        k = min(top_k or self.config.max_results, self.config.max_results)
        out = []
        for doc, dist in self.store.similarity_search(query_embedding, k=k):
            score = self.store.config.to_relevance_score(dist)
            if (self.config.score_threshold is not None
                    and score < self.config.score_threshold):
                continue
            out.append(RetrievalResult(
                id=doc.id, content=doc.page_content, score=score,
                metadata=(doc.metadata or None)
                if self.config.include_metadata else None))
        return out

    def delete_document(self, id: str) -> bool:
        return self.store.delete([id])

    def __len__(self) -> int:
        return len(self.store)
