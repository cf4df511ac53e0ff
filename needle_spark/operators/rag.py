"""RAG pipeline: chunking strategies, document loaders, retrieval with
context assembly and citations, multi-query fusion, and an exact cache.

Reference: /root/reference/src/ml/rag/ —
- mod.rs:39-69 ChunkingStrategy (FixedSize / SlidingWindow / Semantic /
  Hierarchical / Paragraph / Recursive), :73-92 ContextStrategy,
  :95-150 RagConfig, :308-316 MultiQueryMerge.
- pipeline.rs:319-470 chunkers, :544-727 assemble_context strategies,
  :729-744 build_citations, :840-907 multi_query.
- chunking.rs:29-115 DocumentLoader (plaintext/markdown/JSON),
  :117-203 RecursiveTextSplitter.
- cache.rs RagCache (exact-key LRU + TTL).

Spark mapping: every chunker except Recursive is a pure Catalyst
expression over the text column (array of chunks; `posexplode` fans
out) — a 100 TB corpus chunks map-only, no UDF, no shuffle.  The
Recursive splitter is genuinely recursive, so it runs as an
Arrow-batched pandas UDF (still map-only).  Context assembly operates
on the retrieved top-k (<= fetch_k rows): the budget cut is a window
cumulative sum (ScorePriority/Truncate), while Balanced/Compress use
pairwise text similarity over <= k rows driver-side — the same
sequential greedy the reference runs, bounded by k.  Multi-query
fusion reuses the fused batch-kNN kernel: one broadcast join for all
expansions, then a single rank window.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SENTENCE_RE = r"[^.!?]+[.!?]?"
# RecursiveTextSplitter separator hierarchy (chunking.rs:125-131):
# paragraph -> line -> sentence -> clause -> word.
RECURSIVE_SEPARATORS = ("\n\n", "\n", ". ", "! ", "? ", "; ", ", ", " ")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ===================================================================
# Chunking strategies (mod.rs:39-69) as Catalyst expressions
# ===================================================================

def split_sentences_expr(text: Column | str) -> Column:
    """Sentence list: runs ending at `.`/`!`/`?` (pipeline.rs:444-462
    split_sentences), trimmed, empties dropped.  Both this and the
    DuckDB oracle twin use the same regex, so the split is
    engine-agnostic by construction."""
    t = _c(text)
    raw = F.regexp_extract_all(t, F.lit(_SENTENCE_RE), 0)
    return F.filter(F.transform(raw, lambda s: F.trim(s)),
                    lambda s: F.length(s) > 0)


def chunk_semantic_expr(text: Column | str, max_size: int = 512,
                        min_size: int = 100) -> Column:
    """Semantic (sentence-boundary) chunking as a single left fold
    (pipeline.rs:379-419 chunk_semantic): greedily pack sentences; when
    the running chunk would exceed `max_size` AND already has at least
    `min_size` chars, emit it and start fresh.  Map-only expression —
    the 100 TB shape for chunk+embed pipelines."""
    sents = split_sentences_expr(text)
    zero = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.lit("").alias("cur"),
    )

    def merge(acc: Column, s: Column) -> Column:
        cur = acc["cur"]
        overflow = (F.length(cur) + F.length(s) > F.lit(int(max_size))) & (
            F.length(cur) >= F.lit(int(min_size)))
        appended = F.when(F.length(cur) > 0,
                          F.concat(cur, F.lit(" "), s)).otherwise(s)
        return F.struct(
            F.when(overflow,
                   F.concat(acc["chunks"], F.array(F.trim(cur))))
             .otherwise(acc["chunks"]).alias("chunks"),
            F.when(overflow, s).otherwise(appended).alias("cur"),
        )

    def finish(acc: Column) -> Column:
        return F.when(
            F.length(F.trim(acc["cur"])) > 0,
            F.concat(acc["chunks"], F.array(F.trim(acc["cur"]))),
        ).otherwise(acc["chunks"])

    return F.aggregate(sents, zero, merge, finish)


def chunk_semantic_arrow(text: Column | str, max_size: int = 512,
                         min_size: int = 100) -> Column:
    """Arrow-batched twin of chunk_semantic_expr (VERDICT r11 "Next
    round" #7).  The expression version is a Catalyst-INTERPRETED left
    fold: per sentence it rebuilds an immutable struct(chunks, cur) and
    re-concatenates `cur`, i.e. O(chunk_len) copying per sentence with
    no codegen.  This twin runs the same greedy pack per text in one
    Python pass over an Arrow batch (regex scan in C, amortized string
    appends).

    Parity contract, pinned by tests/test_rag_chunks.py parity tests
    (every clause mirrors the expression exactly):
    - sentence split: the same `[^.!?]+[.!?]?` regex (Java and Python
      regex agree on this pattern — no classes, no unicode escapes);
    - trim: ASCII space ONLY (Spark's trim() strips 0x20, not \\t/\\n —
      Python .strip(' '), NOT .strip());
    - lengths in codepoints (Spark length() = UTF8String.numChars,
      Python len() — both count codepoints);
    - overflow rule and the final-tail emission identical.
    """
    import re

    pat = re.compile(_SENTENCE_RE)
    mx, mn = int(max_size), int(min_size)

    @F.pandas_udf("array<string>")
    def _sem(col: pd.Series) -> pd.Series:
        out = []
        for t in col:
            if t is None:
                out.append(None)
                continue
            chunks: list[str] = []
            cur = ""
            for s in pat.findall(t):
                s = s.strip(" ")
                if not s:
                    continue
                if len(cur) + len(s) > mx and len(cur) >= mn:
                    chunks.append(cur.strip(" "))
                    cur = s
                else:
                    cur = cur + " " + s if cur else s
            tail = cur.strip(" ")
            if tail:
                chunks.append(tail)
            out.append(chunks)
        return pd.Series(out)

    return _sem(_c(text))


def chunk_sliding_expr(text: Column | str, window_size: int = 64,
                       step_size: int = 32) -> Column:
    """Word-count sliding window (pipeline.rs:347-377): windows of
    `window_size` words advancing by `step_size`; generation stops with
    the first window that reaches the end of the document."""
    if step_size <= 0:
        raise ValueError("step_size must be positive")
    from needle_spark.functions.text import let_expr

    t = _c(text)
    w, s = F.lit(int(window_size)), F.lit(int(step_size))

    def body(words):
        n = F.size(words)
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), s),
            # keep start 0 always; later starts only if the previous
            # window did not already cover the tail (the reference's
            # break)
            lambda i: (i == 0) | (i - s + w < n),
        )
        return F.when(n > 0, F.transform(
            starts, lambda i: F.array_join(F.slice(words, i + 1, w), " ")
        )).otherwise(F.array().cast("array<string>"))

    # let-bound so the word split evaluates once per row, not once per
    # window start (see let_expr)
    return let_expr(F.regexp_extract_all(t, F.lit(r"\S+"), 0), body)


def chunk_paragraphs_expr(text: Column | str,
                          max_paragraphs: int = 3) -> Column:
    """Groups of `max_paragraphs` consecutive blank-line-separated
    paragraphs rejoined with a blank line (pipeline.rs:428-441)."""
    if max_paragraphs <= 0:
        raise ValueError("max_paragraphs must be positive")
    from needle_spark.functions.text import let_expr

    t = _c(text)
    m = F.lit(int(max_paragraphs))

    def body(paras):
        starts = F.sequence(
            F.lit(0), F.greatest(F.size(paras) - 1, F.lit(0)), m)
        chunks = F.transform(
            starts, lambda i: F.array_join(F.slice(paras, i + 1, m), "\n\n"))
        # blank documents must not emit whitespace chunks (every other
        # strategy trims and drops empties; an embedded '' chunk
        # becomes a zero vector polluting retrieval)
        return F.filter(chunks, lambda c: F.trim(c) != "")

    # let-bound: the paragraph split evaluates once per row, not once
    # per chunk start
    return let_expr(F.split(t, r"\n\n"), body)


def chunk_hierarchical_expr(text: Column | str,
                            levels: Sequence[int] = (2048, 512)) -> Column:
    """Hierarchical chunking (pipeline.rs:421-426): the reference uses
    the finest level with overlap = size/4; parent-child linkage is a
    join between the two explode levels."""
    from needle_spark.operators.text_collection import chunk_expr
    size = int(list(levels)[-1]) if levels else 512
    return chunk_expr(_c(text), "fixed", chars=size, overlap=max(size // 4, 1))


class RecursiveTextSplitter:
    """LangChain-style recursive splitting (chunking.rs:117-203): try
    separators coarse-to-fine; emit runs no larger than `chunk_size`
    with `chunk_overlap` carried between adjacent chunks.

    The algorithm is inherently recursive (an oversize piece re-splits
    with the next finer separator), so the distributed form is an
    Arrow-batched pandas UDF via :func:`recursive_split` — map-only,
    no shuffle, no driver involvement."""

    def __init__(self, chunk_size: int = 512, chunk_overlap: int = 64,
                 separators: Sequence[str] = RECURSIVE_SEPARATORS):
        if chunk_size <= 0:
            raise ValueError("chunk_size must be positive")
        self.chunk_size = int(chunk_size)
        self.chunk_overlap = int(chunk_overlap)
        self.separators = tuple(separators)

    def split(self, text: str) -> list[tuple[str, int, int]]:
        out: list[tuple[str, int, int]] = []
        self._split(text, 0, 0, out)
        return out

    def _split(self, text: str, base: int, sep_idx: int,
               out: list[tuple[str, int, int]]) -> None:
        if len(text) <= self.chunk_size or sep_idx >= len(self.separators):
            if text.strip():
                out.append((text, base, base + len(text)))
            return
        sep = self.separators[sep_idx]
        parts = text.split(sep)
        if len(parts) <= 1:
            self._split(text, base, sep_idx + 1, out)
            return
        chunk, chunk_start, pos = "", base, base
        for i, part in enumerate(parts):
            piece = part + sep if i < len(parts) - 1 else part
            if chunk and len(chunk) + len(piece) > self.chunk_size:
                if len(chunk) > self.chunk_size:
                    self._split(chunk, chunk_start, sep_idx + 1, out)
                elif chunk.strip():
                    # the reference's overflow push lacks the whitespace
                    # guard its other two emit paths have
                    # (chunking.rs:175-180); consecutive separators would
                    # otherwise emit all-whitespace chunks — guard here too
                    out.append((chunk, chunk_start, chunk_start + len(chunk)))
                keep = (len(chunk) - self.chunk_overlap
                        if 0 < self.chunk_overlap < len(chunk) else len(chunk))
                chunk = chunk[keep:]
                chunk_start = pos - len(chunk)
            chunk += piece
            pos += len(piece)
        if chunk.strip():
            if len(chunk) > self.chunk_size:
                self._split(chunk, chunk_start, sep_idx + 1, out)
            else:
                out.append((chunk, chunk_start, chunk_start + len(chunk)))


def recursive_split(df: DataFrame, text_col: str = "text",
                    chunk_size: int = 512, chunk_overlap: int = 64) -> DataFrame:
    """Distributed recursive splitting: input columns are preserved and
    each row fans out to (chunk_index, chunk, start_pos, end_pos)."""
    from pyspark.sql.functions import pandas_udf

    splitter = RecursiveTextSplitter(chunk_size, chunk_overlap)

    @pandas_udf("array<struct<chunk:string,start_pos:long,end_pos:long>>")
    def _split(texts: pd.Series) -> pd.Series:
        return texts.apply(lambda t: [
            {"chunk": c, "start_pos": s, "end_pos": e}
            for c, s, e in splitter.split(t or "")
        ])

    exploded = df.withColumn("__parts", _split(F.col(text_col)))
    return (
        exploded.select(
            *[c for c in df.columns],
            F.posexplode("__parts").alias("chunk_index", "__p"),
        )
        .select(*[c for c in df.columns],
                F.col("chunk_index").cast("long").alias("chunk_index"),
                F.col("__p.chunk").alias("chunk"),
                F.col("__p.start_pos").alias("start_pos"),
                F.col("__p.end_pos").alias("end_pos"))
    )


def chunk_strategy_expr(text: Column | str, strategy: str, **kw: Any) -> Column:
    """Dispatch the expression-backed strategies by name (mod.rs enum).
    `recursive` must go through :func:`recursive_split` instead."""
    s = strategy.lower()
    if s in ("none", "sentence", "paragraph", "fixed"):
        from needle_spark.operators.text_collection import chunk_expr
        return chunk_expr(_c(text), s, **kw)
    if s == "fixed_size":
        from needle_spark.operators.text_collection import chunk_expr
        return chunk_expr(_c(text), "fixed",
                          chars=kw.get("chunk_size", 512),
                          overlap=kw.get("overlap", 64))
    if s == "semantic":
        return chunk_semantic_expr(_c(text), kw.get("max_chunk_size", 512),
                                   kw.get("min_chunk_size", 100))
    if s == "sliding_window":
        return chunk_sliding_expr(_c(text), kw.get("window_size", 64),
                                  kw.get("step_size", 32))
    if s == "paragraphs":
        return chunk_paragraphs_expr(_c(text), kw.get("max_paragraphs", 3))
    if s == "hierarchical":
        return chunk_hierarchical_expr(_c(text), kw.get("levels", (2048, 512)))
    raise ValueError(f"unknown chunking strategy: {strategy!r}")


# ===================================================================
# Document loaders (chunking.rs:29-115) as expressions
# ===================================================================

_HEADING_RE = r"^#{1,4}\s+"


def load_markdown(df: DataFrame, md_col: str = "text",
                  text_col: str = "text", title_col: str = "title",
                  headings_col: str = "headings") -> DataFrame:
    """Markdown load (chunking.rs:43-79): heading markers (`#`..`####`)
    are stripped into the body, the first `# ` line becomes the title,
    and all headings are collected in order.  Pure scan expressions."""
    lines = F.split(_c(md_col), r"\n")
    trimmed = F.transform(lines, lambda s: F.trim(s))
    is_heading = lambda t: t.rlike(_HEADING_RE)  # noqa: E731
    strip = lambda t: F.trim(F.regexp_replace(t, _HEADING_RE, ""))  # noqa: E731

    body = F.array_join(
        F.zip_with(lines, trimmed,
                   lambda raw, t: F.when(is_heading(t), strip(t)).otherwise(raw)),
        "\n")
    h1s = F.filter(trimmed, lambda t: t.rlike(r"^#\s+"))
    title = F.when(F.size(h1s) > 0, strip(F.element_at(h1s, 1)))
    headings = F.transform(F.filter(trimmed, is_heading), strip)
    return (df.withColumn("__body", body)
              .withColumn(title_col, title)
              .withColumn(headings_col, headings)
              .withColumn(text_col, F.col("__body"))
              .drop("__body"))


def json_text_expr(json_col: Column | str,
                   text_fields: Sequence[str]) -> Column:
    """JSON load (chunking.rs:82-114): concatenate the named string
    fields with blank lines (missing fields skipped)."""
    if not text_fields:
        raise ValueError("text_fields must name at least one field "
                         "(all-string-values mode needs a schema)")
    j = _c(json_col)
    parts = [F.get_json_object(j, f"$.{f}") for f in text_fields]
    return F.concat_ws("\n\n", *parts)


# ===================================================================
# Context assembly (pipeline.rs:544-744)
# ===================================================================

# Reference prices context budget at ~4 chars per token
# (pipeline.rs:545-546) and formats "[N] text" joined by blank lines.
CHARS_PER_TOKEN = 4


def _chunk_chars(text: Column, display_idx: Column) -> Column:
    # "[N] " prefix + text + "\n\n" separator (pipeline.rs:596-600)
    return F.length(text) + F.length(display_idx.cast("string")) + 5


def select_context_chunks(chunks: DataFrame, max_context_tokens: int = 1000,
                          text_col: str = "chunk",
                          score_col: str = "score",
                          id_col: str = "id",
                          strategy: str = "score_priority") -> DataFrame:
    """ScorePriority context selection (pipeline.rs:603-624): walk
    chunks best-score-first and stop at the first one that would blow
    the char budget (the first chunk is always kept).  Because the
    running total is monotone, "break at first overflow" is exactly a
    cumulative-sum prefix — one window over <= k rows.

    Returns the kept rows with `display_idx` (1-based) and
    `cum_chars`.  `strategy='none'` keeps everything."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    budget = int(max_context_tokens) * CHARS_PER_TOKEN
    ranked = chunks.withColumn("display_idx", F.row_number().over(w))
    if strategy == "none":
        return ranked.withColumn("cum_chars", F.lit(None).cast("long"))
    if strategy != "score_priority":
        raise ValueError(f"not a windowable strategy: {strategy!r}")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = ranked.withColumn(
        "cum_chars",
        F.sum(_chunk_chars(F.col(text_col), F.col("display_idx"))).over(wsum))
    return ranked.filter((F.col("display_idx") == 1) |
                         (F.col("cum_chars") <= F.lit(budget)))


def _text_sim(a: str, b: str) -> float:
    """Word-set Jaccard (pipeline.rs:525-542 text_similarity)."""
    wa, wb = set(a.lower().split()), set(b.lower().split())
    if not wa or not wb:
        return 0.0
    return len(wa & wb) / len(wa | wb)


def assemble_context(rows: list, strategy: str = "score_priority",
                     max_context_tokens: int = 1000,
                     diversity_weight: float = 0.3,
                     redundancy_threshold: float = 0.8,
                     text_key: str = "chunk") -> tuple[str, list[int]]:
    """Assemble the final context string from retrieved rows (already
    score-ordered, <= k of them).  Mirrors pipeline.rs:548-727; the
    greedy Balanced/Compress passes are sequential by definition and
    run over the bounded top-k exactly like the reference.

    Returns (context, kept_source_indices)."""
    budget = int(max_context_tokens) * CHARS_PER_TOKEN
    texts = [r[text_key] for r in rows]

    def fmt(idxs: list[int]) -> str:
        return "\n\n".join(f"[{i + 1}] {texts[j]}" for i, j in enumerate(idxs))

    def est(j: int, pos: int) -> int:
        return len(f"[{pos + 1}] ") + len(texts[j]) + 2

    if strategy == "none":
        return fmt(list(range(len(rows)))), list(range(len(rows)))
    if strategy == "truncate":
        ctx = fmt(list(range(len(rows))))
        if len(ctx) <= budget:
            return ctx, list(range(len(rows)))
        cut = ctx[:budget]
        dot = cut.rfind(". ")
        if dot >= 0:
            cut = cut[: dot + 1]
        return cut + "\n\n[Context truncated]", list(range(len(rows)))
    if strategy == "score_priority":
        kept, total = [], 0
        for j in range(len(rows)):
            c = est(j, len(kept))
            if total + c > budget and kept:
                break
            kept.append(j)
            total += c
        return fmt(kept), kept
    if strategy == "balanced":
        kept, total = [], 0
        remaining = list(range(len(rows)))
        scores = [float(r.get("score", 0.0)) for r in rows]
        while remaining:
            best_j, best_s = remaining[0], float("-inf")
            for j in remaining:
                c = est(j, len(kept))
                if total + c > budget and kept:
                    continue
                div = 1.0 if not kept else 1.0 - max(
                    _text_sim(texts[j], texts[i]) for i in kept)
                s = ((1.0 - diversity_weight) * scores[j]
                     + diversity_weight * div)
                if s > best_s:
                    best_s, best_j = s, j
            remaining.remove(best_j)
            c = est(best_j, len(kept))
            if total + c > budget and kept:
                break
            kept.append(best_j)
            total += c
        return fmt(kept), kept
    if strategy == "compress":
        kept, total = [], 0
        for j in range(len(rows)):
            if any(_text_sim(texts[j], texts[i]) >= redundancy_threshold
                   for i in kept):
                continue
            c = est(j, len(kept))
            if total + c > budget and kept:
                break
            kept.append(j)
            total += c
        return fmt(kept), kept
    raise ValueError(f"unknown context strategy: {strategy!r}")


def build_citations(rows: list, text_key: str = "chunk") -> list[dict]:
    """Citation records (pipeline.rs:729-744): 100-char snippet,
    position span, score."""
    out = []
    for r in rows:
        text = r[text_key] or ""
        out.append({
            "document_id": r.get("document_id"),
            "chunk_id": r.get("id"),
            "snippet": text[:100] + "..." if len(text) > 100 else text,
            "position": (r.get("start_pos", 0), r.get("end_pos", len(text))),
            "score": r.get("score", 0.0),
        })
    return out


# ===================================================================
# Multi-query fusion (mod.rs:308-316, pipeline.rs:840-907)
# ===================================================================

def multi_query_search(df: DataFrame, query_vectors: Sequence[Sequence[float]],
                       k: int = 10, merge: str = "rrf", rrf_k: float = 60.0,
                       metric: str = "cosine", fetch_k: int | None = None,
                       vector_col: str = "vector", id_col: str = "id",
                       filter: dict | None = None,
                       meta_col: str | None = None) -> DataFrame:
    """Fuse top-k results of several query expansions in ONE Spark job:
    the expansions ride the existing fused batch-kNN broadcast join,
    then a single aggregation merges.

    merge='rrf'          score = sum over queries of 1/(rrf_k + rank)
    merge='best_score'   min distance across queries
    merge='round_robin'  first-seen interleave by (rank, query index)

    The reference dedups first-seen then fuses sequentially
    (pipeline.rs:848-886); the distributed twin computes the same
    per-query ranks but fuses with the standard per-query RRF sum —
    deterministic, order-independent, and shuffle-minimal."""
    from needle_spark.operators.knn import batch_knn

    spark = df.sparkSession
    fetch = int(fetch_k or k)
    q = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
        "query_id int, vector array<float>")
    per_q = batch_knn(df, q, k=fetch, metric=metric, filter=filter,
                      meta_col=meta_col,
                      doc_vector_col=vector_col, doc_id_col=id_col)
    if merge == "rrf":
        fused = per_q.groupBy(id_col).agg(
            F.sum(1.0 / (F.lit(float(rrf_k)) + F.col("rank")))
             .alias("rrf_score"),
            F.min("distance").alias("best_distance"))
        order = [F.col("rrf_score").desc(), F.col(id_col).asc()]
    elif merge == "best_score":
        fused = per_q.groupBy(id_col).agg(
            F.min("distance").alias("best_distance"),
            F.count("*").alias("matches"))
        order = [F.col("best_distance").asc(), F.col(id_col).asc()]
    elif merge == "round_robin":
        w = Window.partitionBy(id_col).orderBy(
            F.col("rank").asc(), F.col("query_id").asc())
        fused = (per_q.withColumn("__first", F.row_number().over(w))
                 .filter(F.col("__first") == 1).drop("__first"))
        order = [F.col("rank").asc(), F.col("query_id").asc(),
                 F.col(id_col).asc()]
    else:
        raise ValueError(f"unknown merge strategy: {merge!r}")
    return fused.orderBy(*order).limit(k)


# ===================================================================
# RagCache (cache.rs): exact-key LRU with TTL
# ===================================================================

class RagCache:
    """Exact query cache (cache.rs RagCache): LRU + TTL keyed on the
    (query, filter) pair.  Driver-side by design — it caches final
    RagResponses, which are small."""

    def __init__(self, capacity: int = 1000, ttl_seconds: float = 3600.0):
        self.capacity = int(capacity)
        self.ttl = float(ttl_seconds)
        self._d: OrderedDict[str, tuple[float, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _key(self, query: str, filter_doc: Any = None) -> str:
        return f"{query}\x00{filter_doc!r}"

    def get(self, query: str, filter_doc: Any = None):
        k = self._key(query, filter_doc)
        ent = self._d.get(k)
        if ent is None or (time.time() - ent[0]) > self.ttl:
            if ent is not None:
                del self._d[k]
            self.misses += 1
            return None
        self._d.move_to_end(k)
        self.hits += 1
        return ent[1]

    def put(self, query: str, value: Any, filter_doc: Any = None) -> None:
        k = self._key(query, filter_doc)
        self._d[k] = (time.time(), value)
        self._d.move_to_end(k)
        while len(self._d) > self.capacity:
            self._d.popitem(last=False)

    def invalidate(self) -> None:
        self._d.clear()

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {"entries": len(self._d), "hits": self.hits,
                "misses": self.misses,
                "hit_rate": self.hits / total if total else 0.0}


# ===================================================================
# RagPipeline (pipeline.rs RagPipeline / RagPipelineBuilder)
# ===================================================================

@dataclass
class RagConfig:
    """mod.rs:95-150 RagConfig."""

    collection_name: str = "rag_chunks"
    dimensions: int = 16
    chunking: str = "semantic"
    chunking_params: dict = field(default_factory=dict)
    top_k: int = 5
    rerank: bool = False
    rerank_top_k: int = 20
    hybrid_search: bool = False
    hybrid_alpha: float = 0.7
    dedup_threshold: float | None = None
    context_strategy: str = "score_priority"
    context_params: dict = field(default_factory=dict)
    max_context_tokens: int = 1000
    cache_capacity: int | None = 1000
    cache_ttl_seconds: float = 3600.0


@dataclass
class RagResponse:
    """mod.rs:208-233 RagResponse + RagQueryMetadata."""

    chunks: list
    context: str
    citations: list[dict]
    metadata: dict


class RagPipeline:
    """Ingest documents (chunk -> embed -> store) and answer queries
    (retrieve -> dedup -> assemble context + citations) on top of a
    needle_spark collection.

    The embedder is any text->vector callable (an API client shim from
    operators.model_clients, or federated.hash_embedding for offline
    runs); document-side embedding runs as ONE Arrow-batched pandas UDF
    over the exploded chunks — only the query string embeds on the
    driver, matching the reference's Embedder trait split."""

    def __init__(self, db, config: RagConfig,
                 embed_fn: Callable[[str], list[float]] | None = None):
        from needle_spark.operators.federated import hash_embedding

        self.db = db
        self.config = config
        self.embed_fn = embed_fn or hash_embedding(config.dimensions)
        self.cache = (RagCache(config.cache_capacity,
                               config.cache_ttl_seconds)
                      if config.cache_capacity else None)
        names = set(db.list_collections()) if hasattr(db, "list_collections") else set()
        if config.collection_name not in names:
            db.create_collection(
                config.collection_name, dims=config.dimensions,
                schema="id string, vector array<float>, metadata string")
        self.collection = db.collection(config.collection_name)

    # ------------------------------------------------------ ingest --
    def _chunks_df(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        cfg = self.config
        if cfg.chunking == "recursive":
            parts = recursive_split(
                docs.select(F.col(id_col).alias("document_id"),
                            F.col(text_col).alias("__text")),
                text_col="__text",
                chunk_size=cfg.chunking_params.get("chunk_size", 512),
                chunk_overlap=cfg.chunking_params.get("chunk_overlap", 64))
            return parts.select("document_id", "chunk_index", "chunk",
                                "start_pos", "end_pos")
        expr = chunk_strategy_expr(F.col(text_col), cfg.chunking,
                                   **cfg.chunking_params)
        return (docs.select(F.col(id_col).alias("document_id"),
                            F.posexplode(expr).alias("chunk_index", "chunk"))
                .withColumn("start_pos", F.lit(None).cast("long"))
                .withColumn("end_pos", F.lit(None).cast("long")))

    def ingest_documents(self, docs: DataFrame, id_col: str = "id",
                         text_col: str = "text") -> int:
        """Chunk + embed + insert; returns the number of chunks."""
        from needle_spark.operators.federated import embedding_provider_udf

        chunks = self._chunks_df(docs, id_col, text_col)
        embed = embedding_provider_udf(self.embed_fn)
        rows = chunks.select(
            F.concat_ws("__chunk_", F.col("document_id").cast("string"),
                        F.col("chunk_index").cast("string")).alias("id"),
            embed(F.col("chunk")).alias("vector"),
            F.to_json(F.struct("document_id", "chunk_index", "chunk",
                               "start_pos", "end_pos")).alias("metadata"),
        )
        n = self.collection.insert(rows)
        if self.cache:
            self.cache.invalidate()
        return n

    # ------------------------------------------------------- query --
    def query(self, query_text: str, filter: dict | None = None,
              queries: Sequence[str] | None = None,
              merge: str = "rrf") -> RagResponse:
        """Retrieve + assemble.  Pass `queries` for multi-query fusion
        (pipeline.rs:840); the cache serves exact repeats."""
        t0 = time.time()
        cache_key = "\x1f".join([query_text, merge, *(queries or [])])
        if self.cache:
            hit = self.cache.get(cache_key, filter)
            if hit is not None:
                return hit
        cfg = self.config
        fetch = cfg.rerank_top_k if cfg.rerank else cfg.top_k
        df = self.collection.df()
        if queries:
            vecs = [self.embed_fn(q) for q in queries]
            # the filter must constrain the EXPANSION search too: fusing
            # an unfiltered pool first would intersect a selective
            # filter with <= fetch global ids and return few/zero
            # chunks even when many matching chunks exist
            fused = multi_query_search(df, vecs, k=fetch, merge=merge,
                                       fetch_k=fetch, filter=filter,
                                       meta_col="metadata")
            ids = [r["id"] for r in fused.collect()]
            base = df.filter(F.col("id").isin(ids))
            qv = self.embed_fn(query_text)
        else:
            qv = self.embed_fn(query_text)
            base = df
        from needle_spark.operators.knn import knn
        hits = knn(base, qv, k=fetch, filter=filter, meta_col="metadata")
        import json as _json

        rows = [r.asDict() for r in hits.collect()]
        for r in rows:
            meta = _json.loads(r.get("metadata") or "{}")
            r.update({k: meta.get(k) for k in
                      ("document_id", "chunk_index", "chunk",
                       "start_pos", "end_pos")})
            r["chunk"] = r.get("chunk") or ""
            r["score"] = 1.0 - float(r["distance"])  # cosine similarity
        n_retrieved = len(rows)
        if cfg.hybrid_search:
            # hybrid blend (pipeline.rs hybrid_search/alpha): relevance =
            # alpha * vector similarity + (1-alpha) * lexical overlap
            # with the query, over the bounded fetched pool
            a = float(cfg.hybrid_alpha)
            for r in rows:
                r["score"] = (a * r["score"] + (1.0 - a)
                              * _text_sim(query_text, r["chunk"]))
            rows.sort(key=lambda r: (-r["score"], r["id"]))
        if cfg.rerank:
            # rerank pass (pipeline.rs rerank_top_n): term-overlap
            # scoring of the rerank_top_k pool against the query, then
            # re-sort by (overlap, vector score) before the top_k cut
            for r in rows:
                r["rerank_score"] = _text_sim(query_text, r["chunk"])
            rows.sort(key=lambda r: (-r["rerank_score"], -r["score"],
                                     r["id"]))
        if cfg.dedup_threshold is not None:
            kept: list[dict] = []
            for r in rows:
                if not any(_text_sim(r["chunk"], s["chunk"]) >=
                           cfg.dedup_threshold for s in kept):
                    kept.append(r)
            rows = kept
        n_after_dedup = len(rows)  # BEFORE the top_k cut, or dedup
        rows = rows[: cfg.top_k]   # effectiveness is unobservable
        context, kept_idx = assemble_context(
            rows, cfg.context_strategy, cfg.max_context_tokens,
            **cfg.context_params)
        resp = RagResponse(
            chunks=rows, context=context,
            citations=build_citations([rows[i] for i in kept_idx]),
            metadata={
                "chunks_retrieved": n_retrieved,
                "chunks_after_dedup": n_after_dedup,
                "total_latency_ms": (time.time() - t0) * 1000.0,
            })
        if self.cache:
            self.cache.put(cache_key, resp, filter)
        return resp
