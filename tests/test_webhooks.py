"""Webhook delivery — webhook_delivery.rs parity: filters, fan-out,
retry/DLQ lifecycle, signing, CDC bridge."""

import hashlib
import hmac
import json

import pytest

from needle_spark.catalog import Collection
from needle_spark.streaming.webhooks import (
    DeliveryStats,
    EventFilter,
    WebhookConfig,
    WebhookService,
    WebhookSubscription,
    sign_payload,
)


class MockTransport:
    def __init__(self, fail_urls=()):
        self.calls = []
        self.fail_urls = set(fail_urls)

    def __call__(self, url, payload, headers):
        self.calls.append((url, payload, headers))
        return url not in self.fail_urls


def test_event_filter_wildcards():
    # webhook_delivery.rs:91-113
    assert EventFilter.all().matches("any", "insert")
    f = EventFilter.for_collection("docs")
    assert f.matches("docs", "delete") and not f.matches("other", "delete")
    g = EventFilter(event_types=("insert",), collections=("docs",))
    assert g.matches("docs", "insert")
    assert not g.matches("docs", "delete")
    assert not g.matches("imgs", "insert")


def test_fanout_and_delivery():
    t = MockTransport()
    svc = WebhookService(transport=t)
    s1 = svc.subscribe(WebhookSubscription("http://a", EventFilter.all()))
    svc.subscribe(WebhookSubscription(
        "http://b", EventFilter(event_types=("delete",))))
    inactive = WebhookSubscription("http://c", EventFilter.all(),
                                   active=False)
    svc.subscribe(inactive)
    assert len(svc.list_subscriptions()) == 3

    assert svc.enqueue("docs", "insert", "v1", now_ms=5) == 1  # only a
    assert svc.enqueue("docs", "delete", "v2", now_ms=6) == 2  # a + b
    assert svc.enqueue("docs", "bogus", "v3") == 0  # unknown type ignored

    stats = svc.process_queue()
    assert stats == DeliveryStats(delivered=3)
    urls = sorted(u for u, _, _ in t.calls)
    assert urls == ["http://a", "http://a", "http://b"]
    body = json.loads(t.calls[0][1])
    assert body["vector_id"] == "v1" and body["event_type"] == "insert"
    assert svc.unsubscribe(s1) and not svc.unsubscribe(s1)


def test_retry_then_dead_letter():
    t = MockTransport(fail_urls={"http://down"})
    # max_concurrent=1: one delivery attempt per process_queue call
    # (with a larger budget the loop drains re-queued events in the
    # same call, like the reference's :259-330 loop)
    svc = WebhookService(WebhookConfig(max_retries=3, max_concurrent=1),
                         transport=t)
    svc.subscribe(WebhookSubscription("http://down"))
    svc.enqueue("docs", "insert", "v1", now_ms=1)
    s1 = svc.process_queue(now=10.0)  # attempt 1 fails -> retried
    assert s1.retried == 1 and svc.dlq_size == 0
    s2 = svc.process_queue(now=11.0)
    assert s2.retried == 1
    s3 = svc.process_queue(now=12.0)  # attempt 3 == max -> DLQ
    assert s3.failed == 1 and svc.dlq_size == 1
    assert svc.total_failed == 1
    entry = svc.dlq[0]
    assert entry["event"].attempt == 3
    assert entry["last_error"] == "transport returned false"
    # second chance: requeue + fixed transport delivers
    t.fail_urls.clear()
    assert svc.requeue_dead_letters() == 1
    assert svc.process_queue().delivered == 1
    assert svc.dlq_size == 0
    # backoff schedule doubles
    assert [svc.retry_delay_s(a) for a in (1, 2, 3)] == [1.0, 2.0, 4.0]


def test_max_concurrent_bounds_batch():
    t = MockTransport()
    svc = WebhookService(WebhookConfig(max_concurrent=2), transport=t)
    svc.subscribe(WebhookSubscription("http://a"))
    for i in range(5):
        svc.enqueue("docs", "insert", f"v{i}")
    assert svc.process_queue().delivered == 2
    assert len(svc.queue) == 3


def test_signing():
    t = MockTransport()
    svc = WebhookService(transport=t)
    svc.subscribe(WebhookSubscription("http://a", secret="s3cret"))
    svc.subscribe(WebhookSubscription("http://b"))  # unsigned
    svc.enqueue("docs", "insert", "v1", now_ms=1)
    svc.process_queue()
    by_url = {u: h for u, _, h in t.calls}
    payload = next(p for u, p, _ in t.calls if u == "http://a")
    assert by_url["http://a"]["X-Needle-Signature"] == hmac.new(
        b"s3cret", payload, hashlib.sha256).hexdigest()
    assert "X-Needle-Signature" not in by_url["http://b"]
    assert sign_payload("s3cret", payload) == \
        by_url["http://a"]["X-Needle-Signature"]


def test_cdc_bridge_watermark(spark, tmp_path):
    coll = Collection.create(spark, str(tmp_path / "c"), dims=2)
    t = MockTransport()
    svc = WebhookService(transport=t)
    svc.subscribe(WebhookSubscription("http://sink"))
    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "id string, vector array<float>"))
    assert svc.enqueue_from_cdc(coll) == 2
    # watermark: re-draining enqueues nothing new
    assert svc.enqueue_from_cdc(coll) == 0
    coll.delete(ids=["a"])
    assert svc.enqueue_from_cdc(coll) == 1
    svc.process_queue()
    kinds = [json.loads(p)["event_type"] for _, p, _ in t.calls]
    assert kinds == ["insert", "insert", "delete"]
    ids = [json.loads(p)["vector_id"] for _, p, _ in t.calls]
    assert set(ids[:2]) == {"a", "b"} and ids[2] == "a"


def test_one_attempt_per_event_per_call():
    # review finding: with a big max_concurrent budget, a failing event
    # must NOT burn all retries inside one process_queue call
    t = MockTransport(fail_urls={"http://down"})
    svc = WebhookService(WebhookConfig(max_retries=5, max_concurrent=10),
                         transport=t)
    svc.subscribe(WebhookSubscription("http://down"))
    svc.enqueue("docs", "insert", "v1", now_ms=1)
    s = svc.process_queue(now=1.0)
    assert s.retried == 1 and s.failed == 0 and svc.dlq_size == 0
    assert len(t.calls) == 1  # exactly one delivery attempt


def test_dlq_evicts_oldest_when_full():
    t = MockTransport(fail_urls={"http://down"})
    svc = WebhookService(WebhookConfig(max_retries=1, max_concurrent=10,
                                       max_dlq_size=2), transport=t)
    svc.subscribe(WebhookSubscription("http://down"))
    for i in range(4):
        svc.enqueue("docs", "insert", f"v{i}", now_ms=i)
        svc.process_queue(now=float(i))
    assert svc.dlq_size == 2
    kept = [e["event"].vector_id for e in svc.dlq]
    assert kept == ["v2", "v3"]  # newest failures retained


def test_cdc_bridge_paged_drain(spark, tmp_path):
    """ADVICE r4: the CDC drain pages instead of collecting the whole
    backlog; the watermark advances per page, and max_events bounds
    one call with exact resume."""
    coll = Collection.create(spark, str(tmp_path / "paged"), dims=2)
    svc = WebhookService(transport=MockTransport())
    svc.subscribe(WebhookSubscription("http://sink"))
    coll.insert(spark.createDataFrame(
        [(f"id{i}", [float(i), 0.0]) for i in range(25)],
        "id string, vector array<float>"))
    # tiny pages exercise the loop; capped call stops mid-backlog
    assert svc.enqueue_from_cdc(coll, page_size=4, max_events=10) == 10
    assert len(svc.queue) == 10
    # resume drains exactly the rest, no duplicates
    assert svc.enqueue_from_cdc(coll, page_size=4) == 15
    assert svc.enqueue_from_cdc(coll, page_size=4) == 0
    seqs = sorted(int(e.vector_id[2:]) for e, _ in svc.queue)
    assert seqs == list(range(25))
