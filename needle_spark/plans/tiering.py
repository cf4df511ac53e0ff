"""Tiered storage: hot/warm/cold vector tiers with access-pattern
promotion/demotion and cross-tier search.

Reference: /root/reference/src/services/storage/tiered_service.rs —
Tier (:49-68: Hot=RAM/HNSW, Warm=SSD/DiskANN, Cold=archive), TierPolicy
(:70-95: warm_after/cold_after ages, promotion access threshold, hot
capacity), insert-starts-hot (:222), cross-tier search (:247),
promote/demote (:270-300), run_maintenance + MaintenanceReport
(:171-180, :300+), TieredServiceStats (:182-192); also
src/indexing/tiered_ann.rs (per-tier index representations).

Spark mapping: Parquet IS the at-rest store, so tiers control the
SERVING representation, not data safety — hot rows serve from a
memory-persisted exact-float cache, warm rows from float16 codes
(2x lighter scans), cold rows from SQ8 codes (4x).  Tier state
(tier, inserted_at, last_accessed, access_count) lives in columns of
one collection; maintenance is a pair of distributed filters deriving
bounded upsert batches; cross-tier search runs each tier through its
representation's two-stage search and merges one candidate page."""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIERS = ("hot", "warm", "cold")

TIERED_SCHEMA = ("id string, vector array<float>, tier string, "
                 "inserted_at long, last_accessed long, access_count long")


@dataclass
class TierPolicy:
    """tiered_service.rs:70-95."""

    warm_after_secs: int = 3600
    cold_after_secs: int = 86_400
    promotion_threshold: int = 3   # accesses within the window
    hot_capacity: int | None = None


@dataclass
class MaintenanceReport:
    """tiered_service.rs:171-180."""

    demoted_to_warm: int = 0
    demoted_to_cold: int = 0
    promoted_to_hot: int = 0
    capacity_evictions: int = 0


class TieredCollection:
    """Hot/warm/cold serving over one needle_spark collection."""

    def __init__(self, db, policy: TierPolicy | None = None,
                 dims: int = 64, collection_name: str = "tiered"):
        self.db = db
        self.policy = policy or TierPolicy()
        names = set(db.list_collections())
        if collection_name not in names:
            db.create_collection(collection_name, dims=dims,
                                 schema=TIERED_SCHEMA)
        self.collection = db.collection(collection_name)
        self._hot_cache: DataFrame | None = None
        self._warm_cache: tuple | None = None   # (HalfQuantizer, encoded df)
        self._cold_cache: tuple | None = None   # (SQ8, encoded df)

    # ------------------------------------------------------ inserts --
    def insert(self, rows: DataFrame, now: int | None = None) -> int:
        """New vectors start hot (tiered_service.rs:222)."""
        now = int(now if now is not None else time.time())
        stamped = (rows.select("id", "vector")
                   .withColumn("tier", F.lit("hot"))
                   .withColumn("inserted_at", F.lit(now))
                   .withColumn("last_accessed", F.lit(now))
                   .withColumn("access_count", F.lit(0).cast("long")))
        n = self.collection.insert(stamped)
        self._invalidate_hot()
        return n

    def record_access(self, ids, now: int | None = None) -> None:
        """Bump access stats for served ids (bounded page)."""
        now = int(now if now is not None else time.time())
        hit = self.collection.df().filter(F.col("id").isin(list(ids)))
        self.collection.upsert(
            hit.withColumn("last_accessed", F.lit(now))
               .withColumn("access_count", F.col("access_count") + 1))

    # ------------------------------------------------------- lookup --
    def get_tier(self, vector_id) -> str | None:
        row = self.collection.df().filter(
            F.col("id") == vector_id).select("tier").first()
        return row["tier"] if row else None

    def tier_stats(self) -> dict:
        rows = (self.collection.df().groupBy("tier")
                .agg(F.count(F.lit(1)).alias("n")).collect())
        out = {t: 0 for t in TIERS}
        out.update({r["tier"]: r["n"] for r in rows})
        return out

    # -------------------------------------------------- maintenance --
    def promote(self, vector_id) -> bool:
        return self._retier([vector_id], "hot") > 0

    def demote(self, vector_id, target: str = "warm") -> bool:
        if target not in TIERS:
            raise ValueError(f"unknown tier: {target!r}")
        return self._retier([vector_id], target) > 0

    def _retier(self, ids, target: str) -> int:
        hit = self.collection.df().filter(F.col("id").isin(list(ids)))
        n = hit.count()
        if n:
            self.collection.upsert(hit.withColumn("tier", F.lit(target)))
            self._invalidate_hot()
        return n

    def run_maintenance(self, now: int | None = None) -> MaintenanceReport:
        """Age-based demotion + access-based promotion + hot-capacity
        eviction (tiered_service.rs run_maintenance): distributed
        filters -> bounded retier batches."""
        now = int(now if now is not None else time.time())
        p = self.policy
        df = self.collection.df()
        rep = MaintenanceReport()

        idle = F.lit(now) - F.col("last_accessed")
        to_cold = df.filter((F.col("tier") != "cold")
                            & (idle > p.cold_after_secs))
        rep.demoted_to_cold = to_cold.count()
        if rep.demoted_to_cold:
            self.collection.upsert(to_cold.withColumn("tier", F.lit("cold")))

        df = self.collection.df()
        to_warm = df.filter((F.col("tier") == "hot")
                            & (idle > p.warm_after_secs)
                            & (idle <= p.cold_after_secs))
        rep.demoted_to_warm = to_warm.count()
        if rep.demoted_to_warm:
            self.collection.upsert(to_warm.withColumn("tier", F.lit("warm")))

        df = self.collection.df()
        hot_again = df.filter(
            (F.col("tier") != "hot")
            & (F.col("access_count") >= p.promotion_threshold)
            & (idle <= p.warm_after_secs))
        rep.promoted_to_hot = hot_again.count()
        if rep.promoted_to_hot:
            self.collection.upsert(
                hot_again.withColumn("tier", F.lit("hot"))
                         .withColumn("access_count", F.lit(0).cast("long")))

        if p.hot_capacity is not None:
            df = self.collection.df()
            hot = df.filter(F.col("tier") == "hot")
            excess = hot.count() - p.hot_capacity
            if excess > 0:
                victims = (hot.orderBy(F.col("last_accessed").asc(),
                                       F.col("id").asc())
                           .limit(excess))
                rep.capacity_evictions = excess
                # reset the counter like promotion does: evicting with
                # the count intact re-qualifies the row for promotion
                # on the NEXT run and the hot set ping-pongs forever
                self.collection.upsert(
                    victims.withColumn("tier", F.lit("warm"))
                           .withColumn("access_count",
                                       F.lit(0).cast("long")))
        self._invalidate_hot()
        return rep

    # -------------------------------------------------------- serve --
    def _invalidate_hot(self) -> None:
        """Retier/insert invalidates every serving representation."""
        if self._hot_cache is not None:
            self._hot_cache.unpersist()
            self._hot_cache = None
        if self._warm_cache is not None:
            self._warm_cache[1].unpersist()
            self._warm_cache = None
        if self._cold_cache is not None:
            self._cold_cache[1].unpersist()
            self._cold_cache = None

    def _hot(self) -> DataFrame:
        """Hot tier: exact floats pinned in executor memory."""
        if self._hot_cache is None:
            self._hot_cache = (self.collection.df()
                               .filter(F.col("tier") == "hot")
                               .select("id", "vector", "tier").persist())
            self._hot_cache.count()
        return self._hot_cache

    def _warm(self):
        """Warm tier: float16 codes materialized ONCE per tier state
        (re-encoding per query would cost more than the exact scan)."""
        if self._warm_cache is None:
            from needle_spark.plans.quantization import HalfQuantizer

            warm = (self.collection.df().filter(F.col("tier") == "warm")
                    .select("id", "vector"))
            hq = HalfQuantizer("float16")
            enc = hq.encode(warm).persist()
            enc.count()
            self._warm_cache = (hq, enc)
        return self._warm_cache

    def _cold(self):
        """Cold tier: SQ8 codes, quantizer fitted once per tier state."""
        if self._cold_cache is None:
            from needle_spark.plans.quantization import SQ8

            cold = (self.collection.df().filter(F.col("tier") == "cold")
                    .select("id", "vector"))
            if cold.head(1):
                sq = SQ8.fit(cold)
                enc = sq.encode(cold).persist()
                enc.count()
                self._cold_cache = (sq, enc)
            else:
                self._cold_cache = (None, cold.persist())
        return self._cold_cache

    def search(self, query_vector, k: int = 10,
               record: bool = True) -> DataFrame:
        """Cross-tier search (tiered_service.rs:247): hot serves exact
        from the memory cache; warm scans float16 codes; cold scans SQ8
        codes; each tier's top-k merges into one page with its serving
        tier attached."""
        from needle_spark.operators.knn import knn

        qv = [float(x) for x in query_vector]
        parts = []
        hot = self._hot()
        if hot.head(1):
            parts.append(knn(hot, qv, k=k).select(
                "id", "distance", F.lit("hot").alias("tier")))
        hq, warm_enc = self._warm()
        if warm_enc.head(1):
            parts.append(hq.search(warm_enc, qv, k=k).select(
                "id", "distance", F.lit("warm").alias("tier")))
        sq, cold_enc = self._cold()
        if sq is not None and cold_enc.head(1):
            parts.append(sq.search(cold_enc, qv, k=k,
                                   metric="cosine").select(
                "id", "distance", F.lit("cold").alias("tier")))
        if not parts:
            return self.collection.df().select(
                "id", F.lit(0.0).alias("distance"),
                F.lit("hot").alias("tier")).limit(0)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.orderBy(F.col("distance").asc(),
                          F.col("id").asc()).limit(int(k))
        if record:
            # pin the (k-row) result: the access-tracking collect and
            # the caller's action must not each re-run the cross-tier
            # scan
            out = out.localCheckpoint(eager=True)
            ids = [r["id"] for r in out.select("id").collect()]
            if ids:
                self.record_access(ids)
        return out
