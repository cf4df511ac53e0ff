"""Streaming / incremental near-duplicate detection (VERDICT r9 #8).

The batch MinHash pipeline (operators/dedup.py) re-bands the WORLD on
every run; a training-data ingest that appends a few thousand documents
per micro-batch cannot afford an O(corpus) re-shingle per batch.  The
incremental shape:

1. PERSIST the banded LSH index — the (id, band, bucket) frame, ~12
   bytes/row, 32 rows/doc — as a parquet state table.  This is the only
   derived state; it is append-only between compactions.
2. Per incoming batch: band ONLY the batch (O(|batch| x hashes)), probe
   its (band, bucket) keys against the state table for candidate
   (new, old) pairs, band-join the batch against itself for
   within-batch pairs, then EXACT-verify candidates by fetching just
   the candidate docs' text (pairs-only semi-join against the corpus).
3. Keep-first policy: a new doc near an existing doc drops; within the
   batch the smallest id of a verified group survives (the same
   keeper rule as neardup_dedup).  Survivors' band rows APPEND to the
   state table, so the next batch sees them.

Per-batch cost: banding + verification scale with |batch| and the
candidate count, never with corpus size; the probe reads the state
table's 3 narrow columns (columnar scan of the banded index, ~0.4% of
re-shingling the corpus text) with the batch side broadcast — no
corpus-wide shuffle.  At cluster scale the state table is written
bucketed by `bucket` so the probe join is also shuffle-free on the
state side.

Composes with Structured Streaming via ``foreach_batch_handler`` —
wrap it in ``stream.writeStream.foreachBatch(...)`` next to
streaming/ingestion.py's sinks.  Exactly-once: the state append is
idempotent per (id, band) — a replayed batch re-appends the same rows
and the probe's semi-join semantics are unaffected by duplicates.

Reference posture: the reference applies insert-time semantic dedup
per insert (collection/dedup.rs); this is the TEXT-corpus twin at
micro-batch granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from needle_spark.operators.dedup import (_banded_buckets_arrow,
                                          _shingle_frame)


class IncrementalMinHashDedup:
    """Persistent banded-LSH dedup state + per-batch probe."""

    def __init__(self, spark: SparkSession, state_path: str, *,
                 id_col: str = "id", text_col: str = "text",
                 n: int = 3, num_hashes: int = 128, bands: int = 32,
                 threshold: float = 0.6):
        assert num_hashes % bands == 0
        self.spark = spark
        self.state_path = state_path
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_hashes, self.bands = n, num_hashes, bands
        self.threshold = float(threshold)

    # ------------------------------------------------------- state --

    def _band(self, df: DataFrame) -> DataFrame:
        sh = _shingle_frame(df, self.id_col, self.text_col, self.n,
                            "arrow")
        return _banded_buckets_arrow(sh, self.id_col, self.num_hashes,
                                     self.bands)

    def _state(self) -> DataFrame | None:
        if not os.path.exists(self.state_path):
            return None
        return self.spark.read.parquet(self.state_path)

    def bootstrap(self, corpus: DataFrame) -> int:
        """Band an existing corpus once and write the state table.
        The ONE O(corpus) step; every later batch is incremental."""
        banded = self._band(corpus)
        banded.write.mode("overwrite").parquet(self.state_path)
        return self.spark.read.parquet(self.state_path).count()

    # ------------------------------------------------------- batch --

    def _verify(self, cand: DataFrame, docs: DataFrame) -> DataFrame:
        """Exact-Jaccard verify of candidate (id1, id2) pairs against
        a frame holding BOTH sides' text (pairs-only join)."""
        sh = _shingle_frame(docs, self.id_col, self.text_col, self.n,
                            "arrow")
        s1 = sh.select(F.col(self.id_col).alias("id1"),
                       F.col("__sh").alias("__sh1"))
        s2 = sh.select(F.col(self.id_col).alias("id2"),
                       F.col("__sh").alias("__sh2"))
        j = cand.join(s1, "id1").join(s2, "id2")
        inter = F.size(F.array_intersect("__sh1", "__sh2")) \
            .cast("double")
        union = (F.size("__sh1") + F.size("__sh2")).cast("double") \
            - inter
        return (j.withColumn("jaccard", inter / union)
                .filter(F.col("jaccard") >= self.threshold)
                .select("id1", "id2", "jaccard"))

    def dedup_batch(self, batch: DataFrame, corpus: DataFrame | None,
                    update_state: bool = True) -> dict:
        """Dedup one micro-batch against the persisted corpus index
        AND itself.  Returns {"kept": DataFrame, "dropped":
        [(new_id, matched_id, jaccard), ...], "candidates": int}.

        `corpus` supplies text for exact verification of vs-corpus
        candidates (semi-joined down to just the candidate ids); pass
        None to trust banding alone (signature-only mode — candidates
        drop unverified)."""
        batch = batch.persist()
        b_band = self._band(batch).persist()
        b_band.count()
        state = self._state()

        # vs-corpus candidates: broadcast the SMALL batch band frame,
        # one columnar pass over the state index, no corpus shuffle
        drops: dict = {}
        if state is not None:
            cand_old = (state.join(
                F.broadcast(b_band.select(
                    F.col(self.id_col).alias("__nid"),
                    "band", "bucket")),
                ["band", "bucket"])
                .filter(F.col(self.id_col) != F.col("__nid"))
                .select(F.col("__nid").alias("id1"),
                        F.col(self.id_col).alias("id2"))
                .distinct())
            if corpus is not None:
                old_ids = cand_old.select(
                    F.col("id2").alias(self.id_col)).distinct()
                old_docs = corpus.join(F.broadcast(old_ids),
                                       self.id_col, "left_semi") \
                    .select(self.id_col, self.text_col)
                docs = old_docs.unionByName(
                    batch.select(self.id_col, self.text_col))
                verified = self._verify(cand_old, docs)
            else:
                verified = cand_old.withColumn(
                    "jaccard", F.lit(None).cast("double"))
            for r in verified.collect():
                cur = drops.get(r["id1"])
                if cur is None or (r["id2"], ) < (cur[0], ):
                    drops[r["id1"]] = (r["id2"], r["jaccard"])
        n_cand_old = len(drops)

        # within-batch pairs (smallest id survives, matching
        # neardup_dedup's keeper rule and insert_dedup's batch order)
        wb = (b_band.alias("a").join(
            b_band.alias("b"),
            [F.col(f"a.band") == F.col("b.band"),
             F.col(f"a.bucket") == F.col("b.bucket"),
             F.col(f"a.{self.id_col}") < F.col(f"b.{self.id_col}")])
            .select(F.col(f"a.{self.id_col}").alias("id1"),
                    F.col(f"b.{self.id_col}").alias("id2"))
            .distinct())
        wb_v = self._verify(
            wb, batch.select(self.id_col, self.text_col))
        wb_rows = wb_v.collect()
        # sequential keep-first over the (small, driver-sized) batch
        # pair list: a row near an already-DROPPED row still survives
        batch_ids = sorted(
            r[0] for r in batch.select(self.id_col).collect())
        nbrs: dict = {}
        for r in wb_rows:
            nbrs.setdefault(r["id2"], []).append(
                (r["id1"], r["jaccard"]))
        for bid in batch_ids:
            if bid in drops:
                continue
            for oid, jac in sorted(nbrs.get(bid, [])):
                if oid not in drops:
                    drops[bid] = (oid, jac)
                    break

        kept = batch.filter(~F.col(self.id_col).isin(list(drops))) \
            if drops else batch
        if update_state:
            add = b_band
            if drops:
                add = b_band.filter(
                    ~F.col(self.id_col).isin(list(drops)))
            add.write.mode("append").parquet(self.state_path)
        out = {
            "kept": kept,
            "dropped": sorted(
                (k, v[0], v[1]) for k, v in drops.items()),
            "candidates": int(n_cand_old + len(wb_rows)),
        }
        b_band.unpersist()
        batch.unpersist()
        return out

    # --------------------------------------------------- streaming --

    def foreach_batch_handler(self, corpus_provider, sink):
        """``writeStream.foreachBatch`` adapter: dedup each micro-batch
        against the persisted index, hand survivors to `sink(df,
        epoch_id)`.  `corpus_provider()` returns the current corpus
        frame for verification (e.g. ``collection.df``), or None for
        signature-only mode."""
        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            corpus = corpus_provider() if corpus_provider else None
            res = self.dedup_batch(batch_df, corpus)
            sink(res["kept"], epoch_id)
        return handle
