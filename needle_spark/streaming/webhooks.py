"""Webhook delivery service: filtered subscriptions over collection
mutation events, retried delivery with exponential backoff, a bounded
dead-letter queue, HMAC payload signing, and delivery stats.

Reference: /root/reference/src/services/client/webhook_delivery.rs —
WebhookConfig (:36-59: 5 retries, 1 s initial delay doubling, 10k DLQ,
10 concurrent), WebhookEventType insert/update/delete/compact
(:63-80), EventFilter all/for_collection/matches (empty = wildcard,
:83-113), WebhookSubscription with signing secret (:116-148),
WebhookEvent (:151-159), DeadLetterEntry/DeliveryStats (:162-177),
WebhookService (:179-330): subscribe/unsubscribe/list (:203-218),
enqueue fans one event out to every matching active subscription
(:220-257), process_queue delivers up to max_concurrent, re-queues
failures until max_retries then dead-letters (:259-330).

Spark bridge (beyond the reference, which requires callers to invoke
`enqueue` per mutation): `enqueue_from_cdc` drains a catalog
collection's CDC log from a sequence watermark straight into the
queue, so every committed mutation becomes a webhook event with no
instrumentation in the write path.  Delivery transport is injectable —
tests use a recording mock; production wires urllib with
config.request_timeout.  Payloads carry an `X-Needle-Signature`
HMAC-SHA256 hex when the subscription has a secret."""

from __future__ import annotations

import hashlib
import hmac
import json
import time
import uuid
from collections import deque
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import functions as F

EVENT_TYPES = ("insert", "update", "delete", "compact", "upsert")


class WebhookError(ValueError):
    pass


@dataclass
class WebhookConfig:
    """webhook_delivery.rs:36-59."""

    max_retries: int = 5
    initial_retry_delay_s: float = 1.0
    max_dlq_size: int = 10_000
    request_timeout_s: float = 10.0
    max_concurrent: int = 10


@dataclass
class EventFilter:
    """webhook_delivery.rs:83-113 — empty lists are wildcards."""

    event_types: tuple[str, ...] = ()
    collections: tuple[str, ...] = ()

    @classmethod
    def all(cls) -> "EventFilter":
        return cls()

    @classmethod
    def for_collection(cls, name: str) -> "EventFilter":
        return cls(collections=(name,))

    def matches(self, collection: str, event_type: str) -> bool:
        return ((not self.event_types or event_type in self.event_types)
                and (not self.collections
                     or collection in self.collections))


@dataclass
class WebhookSubscription:
    """webhook_delivery.rs:116-148."""

    url: str
    filter: EventFilter = field(default_factory=EventFilter.all)
    secret: str | None = None
    active: bool = True
    id: str = ""

    def __post_init__(self):
        if not self.id:
            self.id = f"sub-{uuid.uuid4().hex[:12]}"


@dataclass
class WebhookEvent:
    """webhook_delivery.rs:151-159."""

    id: int
    collection: str
    event_type: str
    vector_id: str
    timestamp: int
    attempt: int = 0


@dataclass
class DeliveryStats:
    """webhook_delivery.rs:171-177."""

    delivered: int = 0
    retried: int = 0
    failed: int = 0


def sign_payload(secret: str, payload: bytes) -> str:
    return hmac.new(secret.encode(), payload, hashlib.sha256).hexdigest()


class WebhookService:
    """webhook_delivery.rs:179-330 with a CDC bridge."""

    def __init__(self, config: WebhookConfig | None = None,
                 transport: Callable[..., bool] | None = None):
        """transport(url, payload_bytes, headers) -> delivered bool.
        None = the stdlib urllib transport (network required)."""
        self.config = config or WebhookConfig()
        self.transport = transport or self._urllib_transport
        self.subscriptions: dict[str, WebhookSubscription] = {}
        self.queue: deque[tuple[WebhookEvent, str]] = deque()
        self.dlq: deque[dict] = deque()
        self.total_delivered = 0
        self.total_failed = 0
        self._next_event_id = 1
        self._cdc_watermarks: dict[str, int] = {}

    # -- subscriptions --

    def subscribe(self, sub: WebhookSubscription) -> str:
        self.subscriptions[sub.id] = sub
        return sub.id

    def unsubscribe(self, sub_id: str) -> bool:
        return self.subscriptions.pop(sub_id, None) is not None

    def list_subscriptions(self) -> list[WebhookSubscription]:
        return list(self.subscriptions.values())

    # -- enqueue --

    def enqueue(self, collection: str, event_type: str, vector_id: str,
                *, now_ms: int | None = None) -> int:
        """One event fans out to every matching active subscription —
        webhook_delivery.rs:220-257.  Unknown event types are ignored
        (parity).  Returns the number of queued deliveries."""
        if event_type not in EVENT_TYPES:
            return 0
        event = WebhookEvent(
            id=self._next_event_id, collection=collection,
            event_type=event_type, vector_id=str(vector_id),
            timestamp=int(time.time() * 1000) if now_ms is None else now_ms)
        self._next_event_id += 1
        n = 0
        for sub_id, sub in self.subscriptions.items():
            if sub.active and sub.filter.matches(collection, event_type):
                self.queue.append((WebhookEvent(**vars(event)), sub_id))
                n += 1
        return n

    def enqueue_from_cdc(self, collection, name: str | None = None,
                         *, page_size: int = 10_000,
                         max_events: int | None = None) -> int:
        """Drain the collection's CDC log from this service's watermark
        into the queue, in BOUNDED pages (ADVICE r4: a first drain of a
        large collection starts at watermark −1 — an unpaged collect
        would materialize the whole event log driver-side).  Each page
        is one filtered+limited scan; the watermark advances after
        every page, so an interrupted drain resumes where it stopped.
        `max_events` caps one call (None = drain to the log head)."""
        cname = name or collection.path.rstrip("/").rsplit("/", 1)[-1]
        # CDC sequences are contiguous integers (catalog._sequence_events
        # assigns [base, base+n) per commit), so pages are RANGE
        # predicates — each page is one pushdown-filtered scan, never a
        # global sort+limit over the remaining backlog (which would make
        # a full drain O(pages * n log n))
        head_row = collection.cdc_events().agg(
            F.max("sequence").alias("m")).first()
        head = int(head_row["m"]) if head_row and head_row["m"] is not None \
            else -1
        # the cap counts CDC EVENTS drained, not fan-out deliveries:
        # counting enqueue()'s per-subscription return would halve the
        # cap with two subscribers and DISABLE it with zero (an
        # unbounded drain that permanently skips events for any
        # subscription added later)
        drained, delivered = 0, 0
        while max_events is None or drained < max_events:
            since = self._cdc_watermarks.get(cname, -1)
            if since >= head:
                break
            page = page_size if max_events is None \
                else min(page_size, max_events - drained)
            hi = min(since + page, head)
            rows = (collection.cdc_events()
                    .filter((F.col("sequence") > since)
                            & (F.col("sequence") <= hi))
                    .select("sequence", "event_type", "vector_id",
                            "timestamp_ms")
                    .collect())
            rows.sort(key=lambda r: r["sequence"])  # page-bounded
            for r in rows:
                delivered += self.enqueue(cname, r["event_type"],
                                          r["vector_id"],
                                          now_ms=r["timestamp_ms"])
            drained += hi - since  # sequences are contiguous
            self._cdc_watermarks[cname] = hi
        return delivered

    # -- delivery --

    def _payload(self, event: WebhookEvent) -> bytes:
        return json.dumps({
            "id": event.id, "collection": event.collection,
            "event_type": event.event_type, "vector_id": event.vector_id,
            "timestamp": event.timestamp, "attempt": event.attempt,
        }, sort_keys=True).encode()

    def _urllib_transport(self, url: str, payload: bytes,
                          headers: dict) -> bool:  # pragma: no cover
        import urllib.request
        req = urllib.request.Request(url, data=payload, headers=headers,
                                     method="POST")
        with urllib.request.urlopen(
                req, timeout=self.config.request_timeout_s) as resp:
            return 200 <= resp.status < 300

    def process_queue(self, *, now: float | None = None) -> DeliveryStats:
        """Deliver up to max_concurrent queued events; failures re-queue
        with attempt+1 until max_retries, then dead-letter —
        webhook_delivery.rs:259-330."""
        stats = DeliveryStats()
        # one attempt per queued event per call: re-queued failures go
        # to the back and are NOT re-popped in the same call, so a
        # transient outage gets one retry per process_queue invocation
        # (the caller schedules the backoff between calls)
        budget = min(self.config.max_concurrent, len(self.queue))
        for _ in range(budget):
            if not self.queue:
                break
            event, sub_id = self.queue.popleft()
            sub = self.subscriptions.get(sub_id)
            ok = False
            err = "subscription removed"
            if sub is not None and sub.active:
                payload = self._payload(event)
                headers = {"Content-Type": "application/json"}
                if sub.secret:
                    headers["X-Needle-Signature"] = sign_payload(
                        sub.secret, payload)
                try:
                    ok = bool(self.transport(sub.url, payload, headers))
                    err = "transport returned false"
                except Exception as e:  # delivery failure -> retry path
                    ok = False
                    err = str(e)
            if ok:
                self.total_delivered += 1
                stats.delivered += 1
                continue
            event.attempt += 1
            if event.attempt < self.config.max_retries:
                # exponential backoff is carried as metadata: the event
                # re-queues with its doubled delay for the caller's
                # scheduler (process_queue itself never sleeps)
                self.queue.append((event, sub_id))
                stats.retried += 1
            else:
                # bounded: evict the STALEST entry so recent,
                # actionable failures are retained
                if len(self.dlq) >= self.config.max_dlq_size:
                    self.dlq.popleft()
                self.dlq.append({
                    "event": event, "subscription_id": sub_id,
                    "last_error": err if err else "Max retries exceeded",
                    "failed_at": int((time.time() if now is None
                                      else now) * 1000),
                })
                self.total_failed += 1
                stats.failed += 1
        return stats

    def retry_delay_s(self, attempt: int) -> float:
        """Doubling backoff — webhook_delivery.rs:40-41."""
        return self.config.initial_retry_delay_s * (2 ** max(0, attempt - 1))

    @property
    def dlq_size(self) -> int:
        return len(self.dlq)

    def requeue_dead_letters(self) -> int:
        """Second-chance replay of the DLQ (attempt counters reset)."""
        n = 0
        while self.dlq:
            entry = self.dlq.popleft()
            ev = entry["event"]
            ev.attempt = 0
            self.queue.append((ev, entry["subscription_id"]))
            n += 1
        return n
