"""Signals (X6): crawl-lifecycle event hooks, set-at-a-time.

Reference: 12 signal types with registered handlers
(/root/reference/core/src/signal.rs:14-41, manager :99-156), emitted
per record (RequestScheduled per request, ItemScraped per item...).
Per-record Python callbacks can't exist on a 10^10-row hot path, so
signals here fire once per ROUND with the round's aggregate payload —
the faithful set-oriented contract (a handler that counted per-record
signals sees identical totals).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable

# signal names mirror core/src/signal.rs:14-41 — all 12 reference
# event types have an analogue here (aggregate per-round payloads);
# round_started/round_finished/retries_scheduled are set-model extras
ENGINE_STARTED = "engine_started"
ENGINE_STOPPING = "engine_stopping"  # stop requested, before final state
ENGINE_STOPPED = "engine_stopped"
ENGINE_PAUSED = "engine_paused"  # cooperative round-boundary gate
ENGINE_RESUMED = "engine_resumed"
SPIDER_OPENED = "spider_opened"
SPIDER_CLOSED = "spider_closed"
ROUND_STARTED = "round_started"
ROUND_FINISHED = "round_finished"
REQUESTS_SCHEDULED = "requests_scheduled"  # request_scheduled analogue
REQUESTS_SENT = "requests_sent"  # request_sent analogue (post-fetch)
RESPONSES_RECEIVED = "responses_received"
ITEMS_SCRAPED = "items_scraped"
ERRORS_OCCURRED = "errors_occurred"
RETRIES_SCHEDULED = "retries_scheduled"

ALL_SIGNALS = [
    ENGINE_STARTED,
    ENGINE_STOPPING,
    ENGINE_STOPPED,
    ENGINE_PAUSED,
    ENGINE_RESUMED,
    SPIDER_OPENED,
    SPIDER_CLOSED,
    ROUND_STARTED,
    ROUND_FINISHED,
    REQUESTS_SCHEDULED,
    REQUESTS_SENT,
    RESPONSES_RECEIVED,
    ITEMS_SCRAPED,
    ERRORS_OCCURRED,
    RETRIES_SCHEDULED,
]


class SignalManager:
    """connect/disconnect/send like the reference SignalManager
    (signal.rs:99-156); handlers receive (signal, payload dict)."""

    def __init__(self) -> None:
        self._handlers: dict[str, list[Callable]] = defaultdict(list)

    def connect(self, signal: str, handler: Callable) -> None:
        if signal not in ALL_SIGNALS:
            raise ValueError(f"unknown signal: {signal}")
        self._handlers[signal].append(handler)

    def disconnect(self, signal: str, handler: Callable) -> None:
        self._handlers[signal].remove(handler)

    def send(self, signal: str, payload: dict) -> None:
        for h in self._handlers.get(signal, []):
            h(signal, payload)

    def emit_round(self, metrics: dict) -> None:
        """Fan one round's metrics out to the per-kind signals."""
        self.send(ROUND_STARTED, metrics)
        if metrics.get("requests"):
            self.send(REQUESTS_SCHEDULED, metrics)
            self.send(REQUESTS_SENT, metrics)
        if metrics.get("responses"):
            self.send(RESPONSES_RECEIVED, metrics)
        if metrics.get("items"):
            self.send(ITEMS_SCRAPED, metrics)
        if metrics.get("errors"):
            self.send(ERRORS_OCCURRED, metrics)
        if metrics.get("retries"):
            self.send(RETRIES_SCHEDULED, metrics)
        self.send(ROUND_FINISHED, metrics)
