"""Monitoring surface: metrics snapshot + HTTP dashboard.

Parity with the reference monitoring module (excluded from its
workspace build, Cargo.toml:9, but shipped in-tree):
  * MetricsRegistry totals + derived rates
    (/root/reference/monitoring/src/metrics.rs:94-137)
  * HTTP metrics server (/root/reference/monitoring/src/server.rs)
  * HTML dashboard (/root/reference/monitoring/src/dashboard.rs)

Set-oriented restatement: the engine already persists per-round counter
rows (CrawlStore metrics.json per committed round — A1/A4); the monitor
derives totals and rates from those committed rows, so serving metrics
NEVER touches executors or runs Spark jobs. The HTTP server is a
stdlib ThreadingHTTPServer on a background thread — monitoring is a
driver-side convenience, not a dataflow component.

Endpoints (reference server.rs routes):
  /metrics   → JSON snapshot (totals, per-round, rates)
  /          → minimal HTML dashboard (totals table + per-round rows)
  /health    → {"status": "ok"}
  /events    → timestamped signal-event history (bounded ring buffer,
               reference monitoring/src/lib.rs:99-105 event Vec +
               broadcast channel — attach via attach_signals())
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from scrapy_rs_spark.sources.store import CrawlStore

_COUNTERS = ("requests", "responses", "items", "errors", "retries", "new_urls")


class CrawlMonitor:
    """Reads committed round metrics and serves them."""

    def __init__(self, store: CrawlStore, max_events: int = 1024):
        self.store = store
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # bounded event-history ring buffer (reference
        # monitoring/src/lib.rs:99-105: timestamped event Vec). Oldest
        # events are evicted past max_events; seq is a monotonic counter
        # so consumers can detect eviction gaps. Wall-clock ts is
        # observational only — never feeds dataflow identity/order.
        from collections import deque

        self.max_events = max_events
        self._events: deque = deque(maxlen=max_events)
        self._event_seq = 0
        self._event_lock = threading.Lock()
        self._attached: list = []  # SignalManagers this monitor records
        # optional ResourceController whose snapshot rides /metrics
        # (reference Metrics.resource_stats Option<ResourceStatsDto>,
        # monitoring/src/metrics.rs:11-40)
        self._resources = None

    # ---- event history (lib.rs:99-105 event buffer + broadcast) ----
    def attach_signals(self, signals) -> None:
        """Subscribe to every signal on a SignalManager; each delivery
        appends (seq, ts, signal, payload) to the ring buffer.
        Idempotent per manager — re-attaching (e.g. once per resume on
        a long-lived monitor) never double-records events."""
        from scrapy_rs_spark.plans.signals import ALL_SIGNALS

        if any(m is signals for m in self._attached):
            return
        for sig in ALL_SIGNALS:
            signals.connect(sig, self._record_event)
        self._attached.append(signals)

    def detach_signals(self, signals) -> None:
        """Disconnect this monitor's recorder from a SignalManager
        previously passed to attach_signals (no-op otherwise)."""
        from scrapy_rs_spark.plans.signals import ALL_SIGNALS

        if not any(m is signals for m in self._attached):
            return
        for sig in ALL_SIGNALS:
            try:
                signals.disconnect(sig, self._record_event)
            except ValueError:
                pass
        self._attached = [m for m in self._attached if m is not signals]

    def _record_event(self, signal: str, payload: dict) -> None:
        import time

        with self._event_lock:
            self._events.append(
                {
                    "seq": self._event_seq,
                    "ts": round(time.time(), 3),
                    "signal": signal,
                    "payload": payload,
                }
            )
            self._event_seq += 1

    def events(self) -> list[dict]:
        """Snapshot of the retained event history, oldest first."""
        with self._event_lock:
            return list(self._events)

    def attach_resources(self, controller) -> None:
        """Surface a plans.resource_control.ResourceController's stats
        in every snapshot (reference metrics.rs:11-40: resource_stats
        is an Option — None until a controller is attached). Pass an
        engine's ``resource_controller`` after construction."""
        self._resources = controller

    # ---- snapshot (metrics.rs:94-137: totals + success/error rates) ----
    def snapshot(self) -> dict:
        rounds = self.store.load_metrics()
        totals = {c: sum(m.get(c, 0) for m in rounds) for c in _COUNTERS}
        n_rounds = max((m.get("round", 0) for m in rounds), default=0)
        responses = totals["responses"]
        requests = totals["requests"]
        # point-in-time gauges from the latest committed round — the
        # reference's pending_requests queue-depth gauge
        # (monitoring/src/metrics.rs:19-20 via ResourceStats); rows
        # committed by pre-frontier_size builds report None
        last = rounds[-1] if rounds else {}
        resource_stats = None
        if self._resources is not None:
            st = self._resources.get_stats()
            # the serializable DTO subset (metrics.rs:11-21) — the
            # monotonic last_update timestamp stays internal
            resource_stats = {
                "memory_usage": st.memory_usage,
                "cpu_usage": round(st.cpu_usage, 2),
                "active_tasks": st.active_tasks,
                "pending_requests": st.pending_requests,
            }
        return {
            "totals": totals,
            "resource_stats": resource_stats,
            "rounds": n_rounds,
            "per_round": rounds,
            "gauges": {
                "pending_requests": last.get("frontier_size"),
                "seen_size": last.get("seen_size"),
            },
            "rates": {
                # reference rates are per-second over wall clock; the
                # committed store is wall-clock-free by design, so rates
                # are per ROUND (deterministic, resume-stable)
                "requests_per_round": round(requests / n_rounds, 2)
                if n_rounds
                else 0.0,
                "success_rate": round(responses / requests, 4)
                if requests
                else 0.0,
                "error_rate": round(totals["errors"] / requests, 4)
                if requests
                else 0.0,
            },
        }

    # ---- HTTP server (server.rs / dashboard.rs) ----
    def serve(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start the dashboard server on a daemon thread; returns the
        bound port (port=0 picks a free one)."""
        monitor = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, b'{"status": "ok"}', "application/json")
                elif self.path == "/metrics":
                    body = json.dumps(monitor.snapshot()).encode()
                    self._send(200, body, "application/json")
                elif self.path == "/events":
                    body = json.dumps(
                        {
                            "max_events": monitor.max_events,
                            "events": monitor.events(),
                        }
                    ).encode()
                    self._send(200, body, "application/json")
                elif self.path in ("/", "/dashboard"):
                    self._send(200, monitor._dashboard_html(), "text/html")
                else:
                    self._send(404, b"not found", "text/plain")

        self._server = ThreadingHTTPServer((host, port), _Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def _dashboard_html(self) -> bytes:
        snap = self.snapshot()
        rows = "".join(
            "<tr>"
            + "".join(
                f"<td>{m.get(c, 0)}</td>" for c in ("round", *_COUNTERS)
            )
            + "</tr>"
            for m in snap["per_round"]
        )
        totals = "".join(
            f"<li>{k}: <b>{v}</b></li>" for k, v in snap["totals"].items()
        )
        rates = "".join(
            f"<li>{k}: <b>{v}</b></li>" for k, v in snap["rates"].items()
        )
        head = "".join(f"<th>{c}</th>" for c in ("round", *_COUNTERS))
        return (
            "<html><head><title>scrapy-rs-spark crawl dashboard</title>"
            "</head><body><h1>Crawl dashboard</h1>"
            f"<h2>Totals (rounds: {snap['rounds']})</h2><ul>{totals}</ul>"
            f"<h2>Rates</h2><ul>{rates}</ul>"
            f"<h2>Per round</h2><table border=1><tr>{head}</tr>{rows}</table>"
            "</body></html>"
        ).encode()
