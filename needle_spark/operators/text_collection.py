"""Auto-embedding text collections: text in, search out.

Reference: /root/reference/src/services/collection/text_collection.rs
(TextCollection insert_text :241-277 with `__chunk_{i}` ids and
_source_doc/_chunk_index metadata, insert_texts batch :279-298,
search_text :301-312, search_with_filter :315-330, ChunkingStrategy
:40-56, chunk_text :template) + src/embeddings.rs providers.

Spark mapping: chunking is a pure Catalyst expression producing an
array of chunks per document; posexplode fans chunks out; the embedding
provider runs as ONE Arrow-batched pandas UDF over the exploded chunk
column (the distributed twin of engine.embed_batch) — so a 100 TB text
corpus chunks, embeds, and inserts without any driver involvement.
Only the SEARCH query string embeds driver-side (one call, like the
reference)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from needle_spark.operators.federated import embedding_provider_udf


def chunk_expr(text: Column | str, strategy: str = "none",
               chars: int = 512, overlap: int = 64) -> Column:
    """ChunkingStrategy (text_collection.rs:40-56) as an expression:
    array<string> of chunks; empty results fall back to the whole text
    (chunk_text semantics)."""
    t = F.col(text) if isinstance(text, str) else text
    s = strategy.lower()
    if s == "none":
        return F.array(t)
    if s == "sentence":
        parts = F.split(t, r"\. ")
    elif s == "paragraph":
        parts = F.split(t, r"\n\n")
    elif s == "fixed":
        chars = max(1, int(chars))
        step = max(1, chars - min(int(overlap), chars - 1))
        # window starts 0, step, 2*step, ... ; substring is 1-indexed
        parts = F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(t) - 1, F.lit(0)), F.lit(step)),
            lambda i: F.substring(t, i + 1, chars),
        )
    else:
        raise ValueError(f"unknown chunking strategy: {strategy!r}")
    cleaned = F.filter(
        F.transform(parts, lambda c: F.trim(c)), lambda c: F.length(c) > 0
    )
    return F.when(F.size(cleaned) > 0, cleaned).otherwise(F.array(t))


class TextCollection:
    """Text-first collection: embedding generation is transparent on
    insert and search (text_collection.rs TextCollection)."""

    SCHEMA_META = ("source_doc", "chunk_index")

    def __init__(self, db, name: str, embed_fn: Callable[[str], list],
                 chunking: str = "none", chunk_chars: int = 512,
                 chunk_overlap: int = 64, store_text: bool = True):
        self.db = db
        self.name = name
        self.embed_fn = embed_fn
        self.chunking = chunking
        self.chunk_chars = chunk_chars
        self.chunk_overlap = chunk_overlap
        self.store_text = store_text
        self._embed_udf = embedding_provider_udf(embed_fn)

    @classmethod
    def create(cls, db, name: str, embed_fn: Callable[[str], list],
               dims: int | None = None, **kwargs) -> "TextCollection":
        if dims is None:
            dims = len(embed_fn(""))
        store_text = kwargs.get("store_text", True)
        text_col = "text string, " if store_text else ""
        db.create_collection(
            name, dims=dims,
            schema=(f"id string, vector array<float>, {text_col}"
                    "source_doc string, chunk_index long"),
        )
        return cls(db, name, embed_fn, **kwargs)

    @property
    def collection(self):
        return self.db.collection(self.name)

    # ---------------------------------------------------------- write --
    def insert_text_df(self, rows: DataFrame, id_col: str = "id",
                       text_col: str = "text", now_ms: int | None = None) -> int:
        """Batch text ingest (insert_texts :279): chunk -> explode ->
        embed (one Arrow pass) -> insert.  Chunked docs get
        `{id}__chunk_{i}` ids + source_doc/chunk_index lineage
        (insert_text :262-271); single-chunk docs keep their id."""
        chunks = chunk_expr(F.col(text_col), self.chunking,
                            self.chunk_chars, self.chunk_overlap)
        exploded = rows.select(
            F.col(id_col).alias("source_doc"),
            F.size(chunks).alias("__nchunks"),
            F.posexplode(chunks).alias("chunk_index", "__chunk"),
        )
        out = exploded.select(
            F.when(F.col("__nchunks") > 1,
                   F.concat("source_doc", F.lit("__chunk_"),
                            F.col("chunk_index").cast("string")))
            .otherwise(F.col("source_doc")).alias("id"),
            self._embed_udf(F.col("__chunk")).alias("vector"),
            *([F.col("__chunk").alias("text")] if self.store_text else []),
            F.col("source_doc"),
            F.col("chunk_index").cast("long").alias("chunk_index"),
        )
        return self.collection.insert(out, now_ms=now_ms)

    def insert_text(self, doc_id: str, text: str,
                    now_ms: int | None = None) -> int:
        """Single-document convenience (insert_text :241)."""
        spark = self.collection.spark
        rows = spark.createDataFrame([(doc_id, text)], "id string, text string")
        return self.insert_text_df(rows, now_ms=now_ms)

    # ---------------------------------------------------------- read --
    def search_text(self, query: str, k: int = 10, flt: dict | None = None,
                    now: int | None = None) -> DataFrame:
        """NL query -> embed (driver-side, one call) -> kNN
        (search_text :301 / search_with_filter :315)."""
        from needle_spark.operators.knn import knn

        qv = [float(x) for x in self.embed_fn(query)]
        coll = self.collection
        return knn(
            coll.df(now=now), qv, k=k, metric=coll._manifest.get("metric", "cosine"),
            filter=flt, vector_col=coll.vector_col, id_col=coll.id_col,
        )

    def ask(self, query: str, k: int = 5, fetch_k: int = 50) -> DataFrame:
        """Ranked passages with citations (text_collection.rs ask):
        search chunks, keep each source document's best passage, top-k
        documents by that passage's distance."""
        from pyspark.sql import Window

        hits = self.search_text(query, k=fetch_k)
        w = Window.partitionBy("source_doc").orderBy(
            F.col("distance").asc(), F.col("id").asc())
        return (
            hits.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
            .orderBy(F.col("distance").asc(), F.col("id").asc())
            .limit(k)
        )
