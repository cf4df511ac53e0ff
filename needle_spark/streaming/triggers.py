"""Event triggers: react to collection mutations with filtered
logging / webhook / proximity actions.

Reference: /root/reference/src/experimental/triggers.rs — TriggerEvent
(insert/update/delete/search/batch_insert, :30-92), TriggerFilter
(:106-150), LoggingTrigger (:151-185), WebhookTrigger with pending
queue + dead letters (:222-320), ProximityTrigger (:327-400),
TriggerMetrics (:417-452), TriggerRegistry (:454-530).

Spark mapping: mutation events already exist — the collection's CDC
log IS the trigger feed.  `TriggerRegistry.process_cdc` consumes a CDC
micro-batch (DataFrame), matches each registered trigger's filter with
one aggregation/collect of the matched slice (bounded by the batch),
and dispatches; `attach_stream` wires the registry into a
foreachBatch over the collection's change stream.  Webhook delivery is
transport-injected (tested with a mock; production passes a real HTTP
poster), with failed posts going to a dead-letter list like the
reference."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_TYPES = ("insert", "update", "delete", "search", "batch_insert")


@dataclass
class TriggerFilter:
    """triggers.rs:106-150: None matches everything."""

    collections: list[str] | None = None
    event_types: list[str] | None = None

    def matches(self, collection: str, event_type: str) -> bool:
        if self.collections is not None and collection not in self.collections:
            return False
        if self.event_types is not None and event_type not in self.event_types:
            return False
        return True


class LoggingTrigger:
    """triggers.rs:151-185: bounded in-memory audit entries."""

    def __init__(self, name: str, filter: TriggerFilter | None = None,
                 max_entries: int = 10_000):
        self.name = name
        self.filter = filter or TriggerFilter()
        self.max_entries = max_entries
        self._entries: list[tuple[float, str]] = []

    def fire(self, collection: str, event_type: str, payload: dict) -> str:
        if not self.filter.matches(collection, event_type):
            return "skipped"
        self._entries.append((
            time.time(),
            f"{collection}/{event_type}: {payload}"))
        del self._entries[: max(0, len(self._entries) - self.max_entries)]
        return "success"

    def entries(self) -> list[tuple[float, str]]:
        return list(self._entries)

    def clear(self) -> None:
        self._entries = []


class WebhookTrigger:
    """triggers.rs:222-320: queue payloads for a URL; an injected
    transport posts them (mockable — no network in tests), failures go
    to the dead-letter list."""

    def __init__(self, name: str, url: str,
                 filter: TriggerFilter | None = None, transport=None):
        self.name = name
        self.url = url
        self.filter = filter or TriggerFilter()
        self.transport = transport
        self._pending: list[dict] = []
        self.dead_letters: list[dict] = []

    def fire(self, collection: str, event_type: str, payload: dict) -> str:
        if not self.filter.matches(collection, event_type):
            return "skipped"
        body = {"url": self.url, "collection": collection,
                "event_type": event_type, "payload": payload,
                "ts": time.time()}
        if self.transport is None:
            self._pending.append(body)
            return "success"
        try:
            self.transport(self.url, body)
            return "success"
        except Exception as e:  # noqa: BLE001 — dead-letter, don't crash
            self.dead_letters.append({**body, "error": str(e)})
            return f"error: {e}"

    def drain_pending(self) -> list[dict]:
        out, self._pending = self._pending, []
        return out

    def pending_count(self) -> int:
        return len(self._pending)


class ProximityTrigger:
    """triggers.rs:327-400: alert when an inserted vector lands within
    `threshold` cosine distance of a watched vector.  The check is one
    distributed kNN-style filter over the batch — no driver loops over
    rows."""

    def __init__(self, name: str, threshold: float, watch_vector,
                 filter: TriggerFilter | None = None):
        self.name = name
        self.threshold = float(threshold)
        self.watch_vector = [float(x) for x in watch_vector]
        self.filter = filter or TriggerFilter(event_types=["insert"])
        self.alerts: list[dict] = []

    def check_batch(self, collection: str, rows: DataFrame,
                    vector_col: str = "vector", id_col: str = "id") -> int:
        from needle_spark.functions.distance import distance_expr

        if not self.filter.matches(collection, "insert"):
            return 0
        hits = (rows.withColumn(
            "__d", distance_expr("cosine", F.col(vector_col),
                                 self.watch_vector))
            .filter(F.col("__d") <= self.threshold)
            .select(id_col, "__d").collect())
        for r in hits:
            self.alerts.append({"collection": collection,
                                "vector_id": r[id_col],
                                "distance": float(r["__d"])})
        return len(hits)

    def clear_alerts(self) -> None:
        self.alerts = []


@dataclass
class TriggerMetrics:
    """triggers.rs:417-452."""

    fired: int = 0
    skipped: int = 0
    errors: int = 0
    by_trigger: dict = field(default_factory=dict)


class TriggerRegistry:
    """triggers.rs:454-530 driving off the CDC log."""

    def __init__(self):
        self._triggers: list = []
        self.metrics = TriggerMetrics()

    def register(self, trigger) -> None:
        self._triggers = [t for t in self._triggers
                          if t.name != trigger.name] + [trigger]

    def unregister(self, name: str) -> bool:
        before = len(self._triggers)
        self._triggers = [t for t in self._triggers if t.name != name]
        return len(self._triggers) != before

    def list_triggers(self) -> list[str]:
        return [t.name for t in self._triggers]

    def dispatch(self, collection: str, event_type: str,
                 payload: dict) -> None:
        for t in self._triggers:
            if not hasattr(t, "fire"):
                continue
            res = t.fire(collection, event_type, payload)
            stats = self.metrics.by_trigger.setdefault(
                t.name, {"fired": 0, "skipped": 0, "errors": 0})
            if res == "success":
                self.metrics.fired += 1
                stats["fired"] += 1
            elif res == "skipped":
                self.metrics.skipped += 1
                stats["skipped"] += 1
            else:
                self.metrics.errors += 1
                stats["errors"] += 1

    # above this many ids per op group, dispatch ONE summary event
    # instead of per-id fires (collect_list of an unbounded batch would
    # OOM the driver and flood subscribers)
    MAX_PER_ID_DISPATCH = 1000

    def process_cdc(self, collection: str, cdc_batch: DataFrame,
                    op_col: str = "event_type",
                    id_col: str = "vector_id",
                    rows_source: DataFrame | None = None,
                    rows_id_col: str = "id",
                    rows_vector_col: str = "vector") -> int:
        """Consume one CDC micro-batch: per-event-type counts aggregate
        distributed; only the (op, ids) summary reaches the driver for
        dispatch.  Batch inserts (>1 id in one op group) dispatch as
        batch_insert like the reference.

        `rows_source` (an id->vector frame, usually the collection's
        df()) lights up registered ProximityTriggers: inserted ids
        resolve to their vectors there and run through check_batch —
        CDC events alone carry no vectors."""
        cap = self.MAX_PER_ID_DISPATCH
        # bounded id sample per group: the count aggregates distributed
        # and only <= cap ids per op ever reach the driver
        groups = (cdc_batch.groupBy(op_col)
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.slice(F.collect_list(id_col), 1, cap)
                       .alias("ids")).collect())
        dispatched = 0
        for g in groups:
            op = {"insert": "insert", "upsert": "update",
                  "delete": "delete"}.get(g[op_col], g[op_col])
            if g["n"] > 1 and (op == "insert" or g["n"] > cap):
                # large groups of ANY op summarize (the reference's
                # batch_insert shape, generalized)
                self.dispatch(collection,
                              "batch_insert" if op == "insert"
                              else f"batch_{op}",
                              {"count": int(g["n"])})
                dispatched += 1
            else:
                for vid in g["ids"]:
                    self.dispatch(collection, op, {"vector_id": vid})
                    dispatched += int(g["n"] > 0)
        if rows_source is not None:
            prox = [t for t in self._triggers if hasattr(t, "check_batch")]
            any_inserts = any(g[op_col] in ("insert", "upsert") and g["n"]
                              for g in groups)
            if prox and any_inserts:
                # proximity checks cover EVERY inserted id, not the
                # capped dispatch sample: semi-join the row source
                # against the full CDC id set distributedly (the cap
                # above only bounds per-id driver dispatch, it must not
                # silently drop alerts for rows beyond it)
                ins_ids = (cdc_batch
                           .filter(F.col(op_col).isin("insert", "upsert"))
                           .select(F.col(id_col).alias(rows_id_col)))
                rows = rows_source.join(ins_ids, on=rows_id_col,
                                        how="left_semi")
                for t in prox:
                    t.check_batch(collection, rows,
                                  vector_col=rows_vector_col,
                                  id_col=rows_id_col)
        return dispatched

    def attach_stream(self, spark, collection, checkpoint_dir: str,
                      available_now: bool = True):
        """Wire the registry into the collection's CDC change stream via
        foreachBatch (streaming/ingestion.change_stream)."""
        import os

        from needle_spark.streaming.ingestion import change_stream

        name = os.path.basename(getattr(collection, "path", "collection"))

        def _batch(df, _epoch):
            self.process_cdc(name, df, rows_source=collection.df())

        stream = change_stream(spark, collection)
        writer = (stream.writeStream.foreachBatch(_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
