"""Shard rebalancing: routing, migration planning, batched
checkpointable transfer with verification (reference:
/root/reference/src/experimental/rebalance.rs — RebalanceConfig
:50-127, MigrationTask :128-222, RebalancePlan :222-301,
VectorTransfer/TransferBatch + checksum verify :301-370,
RebalanceStats :370-391, MigrationCheckpoint :391-436,
plan_add_shard :482-521, plan_remove_shard :523-560,
plan_full_rebalance :562-601, execute/execute_task :603-720).

Spark-first mapping.  The reference's coordinator walks driver-side
id lists and ships vectors row-by-row through Source/Target traits;
on Spark every phase is a DataFrame computation:

* **Routing** is a deterministic hash expression, evaluated on
  executors (`route_expr`).  Any engine that computes the same
  expression agrees on placement — no routing table to sync.
* **Planning** is ONE aggregation: tag each row with (current shard,
  target shard), keep movers, count per (source, target) pair.  The
  id lists the reference materializes on the driver stay distributed
  — a task is a predicate, not a Vec<String>.
* **Transfer** is a partitioned rewrite: `apply_rebalance`
  repartitions by the new shard id (write `partitionBy("shard")` to
  make placement physical).  Batching for checkpoint/resume is a
  stable hash bucket per row, so a resumed job re-selects exactly the
  unfinished batches (`transfer_batches` / checkpoint filter).
* **Verification** (verify_transfers :127, TransferBatch::verify
  :363-369) is a digest comparison: per-shard row counts + XOR
  content hashes on both sides, full-outer joined — O(shards) rows
  moved to the driver, never the data.

At 100 TB: planning scans once with map-side-combined counts; the
rewrite is the one unavoidable shuffle (it IS the migration); digests
are map-only + tiny aggregations.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Routing


def route_expr(id_col, n_shards: int) -> Column:
    """Deterministic shard for an id — non-negative xxhash64 mod n
    (the reference's ShardManager::route_id hash-ring collapsed to
    hash-mod; any expression works as long as planner, mover, and
    verifier share it)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(c.cast("string")), F.lit(int(n_shards))) \
        .cast("int")


# ---------------------------------------------------------------------------
# Planning (rebalance.rs:482-601)


@dataclass
class RebalancePlan:
    """A plan is (a) the movers as a DataFrame — (id, source_shard,
    target_shard, batch) — and (b) its per-task summary (source,
    target, n_vectors).  `description` mirrors the reference's."""

    movers: DataFrame
    tasks: DataFrame
    description: str

    def total(self) -> int:
        row = self.tasks.agg(F.sum("n_vectors").alias("t")).collect()[0]
        return int(row["t"] or 0)


def _make_plan(tagged: DataFrame, description: str,
               n_batches: int = 0,
               already_filtered: bool = False) -> RebalancePlan:
    # source/target labels live in the SAME topology for add/full
    # plans, so equal labels mean "stays put"; remove plans compare
    # across topologies (old labels vs shrunk labels) and pre-filter
    # themselves — a numeric collision there is NOT a non-mover
    movers = tagged if already_filtered else tagged.filter(
        F.col("source_shard") != F.col("target_shard"))
    movers = transfer_batches(movers, n_batches) \
        if n_batches > 0 else movers.withColumn("batch", F.lit(0))
    tasks = (movers.groupBy("source_shard", "target_shard")
             .agg(F.count(F.lit(1)).alias("n_vectors"))
             .orderBy("source_shard", "target_shard"))
    return RebalancePlan(movers, tasks, description)


def plan_add_shard(df: DataFrame, old_shards: int, new_shards: int,
                   id_col: str = "id",
                   route=route_expr) -> RebalancePlan:
    """Vectors whose placement under the grown topology moved to a NEW
    shard (rebalance.rs:482-521): one scan, no driver id lists."""
    tagged = df.select(
        F.col(id_col).cast("string").alias("id"),
        route(id_col, old_shards).alias("source_shard"),
        route(id_col, new_shards).alias("target_shard"),
    )
    # EVERY id whose placement changed moves — under hash-mod routing
    # that includes ids re-homed between EXISTING shards (dropping them
    # would leave readers computing route(id, new_shards) looking on a
    # shard the vector never reached).  Mod hashing relocates ~(1 -
    # old/new) of the corpus where the reference's consistent-hash ring
    # relocates 1/new (rebalance.rs:482-521) — the documented tradeoff
    # for a routing function any engine reproduces as one expression.
    return _make_plan(
        tagged,
        f"Add shards {old_shards}->{new_shards} - migrating vectors "
        f"from {old_shards} existing shards")


def plan_remove_shard(df: DataFrame, shard_to_remove: int,
                      n_shards: int, id_col: str = "id",
                      route=route_expr) -> RebalancePlan:
    """Vectors on the removed shard, redistributed to the remaining
    shards by re-routing with the shrunk topology (:523-560); the
    re-route skips over the removed slot deterministically."""
    # removal renumbers the survivors contiguously (label j > removed
    # becomes j-1) and routing after the shrink is route(id, n-1) — the
    # SAME expression every reader evaluates.  A one-off salted reroute
    # here would strand vectors where route_expr can never find them.
    old_shard = route(id_col, n_shards)
    relabeled = F.when(old_shard > F.lit(int(shard_to_remove)),
                       old_shard - 1).otherwise(old_shard)
    tagged = df.select(
        F.col(id_col).cast("string").alias("id"),
        old_shard.alias("source_shard"),
        route(id_col, n_shards - 1).alias("target_shard"),
        relabeled.alias("__relabeled"),
    ).filter(
        (F.col("source_shard") == F.lit(int(shard_to_remove)))
        | (F.col("__relabeled") != F.col("target_shard"))
    ).drop("__relabeled")
    return _make_plan(
        tagged,
        f"Remove shard {shard_to_remove} - distributing vectors to "
        f"{n_shards - 1} remaining shards",
        already_filtered=True)


def plan_full_rebalance(df: DataFrame, n_shards: int,
                        current_shard_col: str,
                        id_col: str = "id",
                        route=route_expr) -> RebalancePlan:
    """Every vector not where the router says it belongs (:562-601) —
    heals drift after ad-hoc writes."""
    tagged = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(current_shard_col).cast("int").alias("source_shard"),
        route(id_col, n_shards).alias("target_shard"))
    return _make_plan(
        tagged, f"Full rebalance across {n_shards} shards")


# ---------------------------------------------------------------------------
# Transfer + verification (rebalance.rs:301-370,603-720)


def transfer_batches(movers: DataFrame, n_batches: int) -> DataFrame:
    """Assign each mover a stable batch id (MigrationCheckpoint
    :391-436 resume unit): rerunning after a crash with the completed
    batch set excluded re-selects exactly the unfinished work."""
    return movers.withColumn(
        "batch",
        F.pmod(F.xxhash64(F.col("id"), F.lit("batch")),
               F.lit(int(max(1, n_batches)))).cast("int"))


def resume_filter(movers_with_batch: DataFrame,
                  completed_batches: list[int]) -> DataFrame:
    """Drop already-checkpointed batches (:629-650)."""
    if not completed_batches:
        return movers_with_batch
    return movers_with_batch.filter(
        ~F.col("batch").isin([int(b) for b in completed_batches]))


def apply_rebalance(df: DataFrame, n_shards: int, id_col: str = "id",
                    route=route_expr) -> DataFrame:
    """The migration itself: tag with the target shard and repartition
    on it — write with `.write.partitionBy('shard')` to make the
    placement physical.  This one shuffle IS the transfer."""
    out = df.withColumn("shard", route(id_col, n_shards))
    return out.repartition("shard")


def shard_digests(df: DataFrame, shard_col: str = "shard",
                  id_col: str = "id",
                  content_cols: list[str] | None = None) -> DataFrame:
    """Per-shard (count, XOR content hash) — the distributed analog of
    TransferBatch::verify's checksum (:363-369), map-side combined.
    Pass `content_cols` (e.g. the vector column) so the digest covers
    PAYLOAD bits like the reference's checksum, not just ids — an
    id-only digest passes transfers that corrupted every vector."""
    cols = [F.col(id_col).cast("string")]
    for c in content_cols or []:
        cols.append(F.col(c).cast("string"))
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("digest"))


def verify_transfer(source: DataFrame, target: DataFrame,
                    shard_col: str = "shard",
                    id_col: str = "id",
                    content_cols: list[str] | None = None) -> DataFrame:
    """Compare both sides' digests (MigrationTarget::verify_vectors
    :435, without shipping ids): rows where counts or digests differ.
    Empty result = transfer verified."""
    s = shard_digests(source, shard_col, id_col, content_cols) \
        .withColumnRenamed("n", "src_n") \
        .withColumnRenamed("digest", "src_digest")
    t = shard_digests(target, shard_col, id_col, content_cols) \
        .withColumnRenamed("n", "dst_n") \
        .withColumnRenamed("digest", "dst_digest")
    return (s.join(t, shard_col, "full_outer")
            .filter(~(F.col("src_n").eqNullSafe(F.col("dst_n"))
                      & F.col("src_digest").eqNullSafe(F.col("dst_digest")))))


def rebalance_stats(plans: list[RebalancePlan]) -> dict:
    """RebalanceStats (:370-391) over executed plans."""
    totals = [p.total() for p in plans]
    return {
        "total_migrations": len(plans),
        "total_vectors_migrated": sum(totals),
        "largest_plan_vectors": max(totals, default=0),
    }
