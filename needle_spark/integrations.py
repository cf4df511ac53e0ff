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

    def _filter_column(self, filter: dict | None):
        if not filter:
            return None
        cond = F.lit(True)
        for k, v in filter.items():
            cond = cond & (F.get_json_object(F.col("metadata"), f"$.{k}")
                           == F.lit(str(v)))
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
        docs = {r["id"]: r for r in self.collection.df().collect()}
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
