"""Event triggers (reference: src/experimental/triggers.rs): filters,
logging/webhook/proximity triggers, registry dispatch over CDC
batches, and the change-stream attachment."""

import pytest
from pyspark.sql import functions as F

from needle_spark.streaming.triggers import (
    LoggingTrigger,
    ProximityTrigger,
    TriggerFilter,
    TriggerRegistry,
    WebhookTrigger,
)


def test_filter_matching():
    f = TriggerFilter(collections=["docs"], event_types=["insert", "delete"])
    assert f.matches("docs", "insert")
    assert not f.matches("docs", "search")
    assert not f.matches("imgs", "insert")
    assert TriggerFilter().matches("anything", "anything")


def test_logging_trigger_bounded():
    t = LoggingTrigger("audit", TriggerFilter(event_types=["insert"]),
                       max_entries=2)
    assert t.fire("docs", "insert", {"vector_id": "a"}) == "success"
    assert t.fire("docs", "delete", {"vector_id": "b"}) == "skipped"
    t.fire("docs", "insert", {"vector_id": "c"})
    t.fire("docs", "insert", {"vector_id": "d"})
    entries = t.entries()
    assert len(entries) == 2  # bounded
    assert "d" in entries[-1][1]


def test_webhook_queue_and_dead_letters():
    t = WebhookTrigger("hook", "https://example.test/x")
    t.fire("docs", "insert", {"vector_id": "a"})
    assert t.pending_count() == 1
    drained = t.drain_pending()
    assert drained[0]["url"] == "https://example.test/x"
    assert t.pending_count() == 0

    sent = []
    ok = WebhookTrigger("ok", "u", transport=lambda u, b: sent.append(b))
    assert ok.fire("docs", "insert", {}) == "success"
    assert sent

    def boom(u, b):
        raise ConnectionError("down")

    bad = WebhookTrigger("bad", "u", transport=boom)
    res = bad.fire("docs", "insert", {"vector_id": "x"})
    assert res.startswith("error")
    assert bad.dead_letters[0]["error"] == "down"


def test_proximity_trigger(spark):
    t = ProximityTrigger("near", threshold=0.1, watch_vector=[1.0, 0.0])
    rows = spark.createDataFrame(
        [("close", [0.99, 0.01]), ("far", [0.0, 1.0])],
        "id string, vector array<float>")
    n = t.check_batch("docs", rows)
    assert n == 1
    assert t.alerts[0]["vector_id"] == "close"
    t.clear_alerts()
    assert t.alerts == []


def test_registry_dispatch_and_metrics(spark):
    reg = TriggerRegistry()
    log = LoggingTrigger("audit")
    hook = WebhookTrigger("hook", "u",
                          filter=TriggerFilter(event_types=["delete"]))
    reg.register(log)
    reg.register(hook)
    assert reg.list_triggers() == ["audit", "hook"]

    cdc = spark.createDataFrame(
        [(1, 0, "insert", "a", None), (2, 0, "insert", "b", None),
         (3, 0, "delete", "c", None)],
        "sequence long, timestamp_ms long, event_type string, "
        "vector_id string, metadata string")
    reg.process_cdc("docs", cdc)
    # 2 inserts in one batch -> batch_insert; 1 delete
    kinds = [e[1].split(":")[0] for e in log.entries()]
    assert "docs/batch_insert" in kinds and "docs/delete" in kinds
    assert hook.pending_count() == 1  # only the delete matched
    assert reg.metrics.fired >= 3
    assert reg.metrics.skipped >= 1  # hook skipped batch_insert

    assert reg.unregister("hook") is True
    assert reg.unregister("hook") is False


def test_attach_stream_end_to_end(spark, tmp_path):
    from needle_spark.catalog import Database

    db = Database(spark, str(tmp_path / "tdb"))
    coll = db.create_collection("docs", dims=2)
    reg = TriggerRegistry()
    log = LoggingTrigger("audit")
    reg.register(log)

    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "id string, vector array<float>"))
    q = reg.attach_stream(spark, coll, str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    assert any("batch_insert" in e[1] for e in log.entries())


def test_proximity_trigger_fires_through_cdc(spark, tmp_path):
    """Registered proximity triggers resolve inserted ids to vectors
    via rows_source and alert from the CDC feed."""
    from needle_spark.catalog import Database
    from needle_spark.streaming.triggers import ProximityTrigger

    db = Database(spark, str(tmp_path / "pxdb"))
    coll = db.create_collection("docs", dims=2)
    reg = TriggerRegistry()
    prox = ProximityTrigger("near", threshold=0.05,
                            watch_vector=[1.0, 0.0])
    reg.register(prox)
    coll.insert(spark.createDataFrame(
        [("hit", [1.0, 0.0]), ("miss", [0.0, 1.0])],
        "id string, vector array<float>"))
    q = reg.attach_stream(spark, coll, str(tmp_path / "pxckpt"))
    q.awaitTermination(60)
    assert [a["vector_id"] for a in prox.alerts] == ["hit"]


def test_proximity_checks_cover_ids_beyond_dispatch_cap(spark, tmp_path, monkeypatch):
    """ADVICE r5: the MAX_PER_ID_DISPATCH cap bounds per-id DISPATCH
    only; proximity triggers must still check EVERY inserted row (the
    check semi-joins the full CDC id set distributedly, not the capped
    driver sample).  Cap forced tiny so the watched row falls outside
    the dispatch sample."""
    from needle_spark.catalog import Database
    from needle_spark.streaming.triggers import (
        ProximityTrigger, TriggerRegistry,
    )

    monkeypatch.setattr(TriggerRegistry, "MAX_PER_ID_DISPATCH", 3)
    db = Database(spark, str(tmp_path / "pxcapdb"))
    coll = db.create_collection("docs", dims=2)
    reg = TriggerRegistry()
    prox = ProximityTrigger("near", threshold=0.05,
                            watch_vector=[1.0, 0.0])
    reg.register(prox)
    # 20 rows; the matching one sorts LAST by id so a capped
    # collect_list sample of 3 cannot contain it
    rows = [(f"a{i:02d}", [0.0, 1.0]) for i in range(19)]
    rows.append(("zz_hit", [1.0, 0.0]))
    coll.insert(spark.createDataFrame(
        rows, "id string, vector array<float>"))
    q = reg.attach_stream(spark, coll, str(tmp_path / "pxcapckpt"))
    q.awaitTermination(60)
    assert [a["vector_id"] for a in prox.alerts] == ["zz_hit"]
