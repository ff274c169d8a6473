"""Resource control: driver-side limits + round-boundary throttling.

Parity with the reference ResourceController
(/root/reference/engine/src/resource_control.rs:10-203): a monitor
samples process memory and CPU plus the engine's pending/active
counts, compares them against ResourceLimits, and sleep-throttles the
crawl loop when any limit is exceeded (throttle_if_needed,
resource_control.rs:192-203; loop wiring engine/src/lib.rs:1093-1103).

Set-oriented restatement. Executor memory/CPU on a Spark cluster are
governed by the cluster manager and AQE — that part of T4 stays
delegated (SURVEY §2.9). What remains genuinely the driver's job, and
what this controller covers, is the DRIVER process and the crawl
backlog:

  * memory_usage  — driver RSS from /proc/self/status (stdlib; the
    reference uses the sysinfo crate for the same per-process number,
    resource_control.rs:117-119)
  * cpu_usage     — driver CPU%% from /proc/self/stat utime+stime
    deltas over wall time (sysinfo's process.cpu_usage() analogue)
  * pending_requests — the committed frontier size. The round loop
    already observes it on the frontier write (METRICS frontier_size),
    so feeding the controller costs ZERO extra Spark jobs — the exact
    analogue of the reference passing scheduler.len() each loop tick
    (lib.rs:1095-1096)
  * active_tasks  — live Spark tasks from SparkContext.statusTracker
    when a SparkContext is attached. In the blocking set-at-a-time
    round model this is 0 at every round boundary by construction, so
    no max_tasks limit is restated (the reference's max_tasks bounds
    in-flight tokio tasks, which have no between-rounds analogue);
    the gauge is kept for observability parity only.

Sampling is synchronous at round boundaries (update() from the crawl
loop) rather than a background tokio task — deterministic, no thread;
an optional start()/stop() daemon thread mirrors the reference's
background monitor for long-lived engines whose rounds are minutes
apart. Throttling is a bounded sleep of throttle_factor ×
monitor_interval_ms at the round boundary, exactly the reference's
response (it also only ever sleeps — it never sheds work).
"""

from __future__ import annotations

import threading
import time
import warnings
from dataclasses import dataclass, field


@dataclass
class ResourceLimits:
    """resource_control.rs:24-51 — 0 means no limit (reference default)."""

    max_memory: int = 0  # bytes of driver RSS
    max_cpu: float = 0.0  # driver CPU percent (100 = one core)
    max_pending_requests: int = 0  # committed frontier size
    throttle_factor: float = 0.5  # sleep = factor × interval
    monitor_interval_ms: int = 1000


@dataclass
class ResourceStats:
    """resource_control.rs:9-21 snapshot."""

    memory_usage: int = 0
    cpu_usage: float = 0.0
    active_tasks: int = 0
    pending_requests: int = 0
    last_update: float | None = None  # time.monotonic() of last sample


def _read_rss_bytes() -> int:
    """Driver RSS from /proc/self/status VmRSS (kB)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


class _ProcCpuProbe:
    """CPU%% of this process since the previous sample, from
    /proc/self/stat utime+stime (clock ticks). First sample returns
    0.0 (no delta yet), like sysinfo's first cpu_usage() read."""

    def __init__(self):
        import os

        self._hz = os.sysconf("SC_CLK_TCK")
        self._last: tuple[float, float] | None = None  # (wall, cpu_s)

    def __call__(self) -> float:
        try:
            with open("/proc/self/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields 14/15 (utime/stime), 1-based after comm — here
            # parts is offset by the stripped "pid (comm)" prefix
            cpu_s = (int(parts[11]) + int(parts[12])) / self._hz
        except (OSError, IndexError, ValueError):
            return 0.0
        now = time.monotonic()
        prev, self._last = self._last, (now, cpu_s)
        if prev is None or now <= prev[0]:
            return 0.0
        return 100.0 * (cpu_s - prev[1]) / (now - prev[0])


class ResourceController:
    """Driver-side ResourceController analogue.

    ``memory_probe``/``cpu_probe`` are injectable (tests pin limits
    against deterministic fakes); defaults read /proc/self.
    ``spark_context`` (optional) feeds the active_tasks gauge via
    statusTracker."""

    def __init__(
        self,
        limits: ResourceLimits | None = None,
        memory_probe=None,
        cpu_probe=None,
        spark_context=None,
    ):
        self.limits = limits or ResourceLimits()
        self._memory_probe = memory_probe or _read_rss_bytes
        self._cpu_probe = cpu_probe or _ProcCpuProbe()
        self._sc = spark_context
        self._stats = ResourceStats()
        self._lock = threading.Lock()
        self.throttled_count = 0  # rounds (or ticks) that throttled
        self.throttled_total_s = 0.0
        self._thread: threading.Thread | None = None
        self._stop_evt = threading.Event()
        self._stop_evt.set()  # not running until start()

    # ---- sampling (update_* + monitor tick, resource_control.rs:162-178) ----
    def _active_tasks(self) -> int:
        if self._sc is None:
            return 0
        try:
            tracker = self._sc.statusTracker()
            return sum(
                tracker.getStageInfo(sid).numActiveTasks or 0
                for jid in tracker.getActiveJobsIds()
                for sid in (tracker.getJobInfo(jid).stageIds or [])
                if tracker.getStageInfo(sid) is not None
            )
        except Exception:
            return 0

    def update(
        self,
        pending_requests: int | None = None,
        active_tasks: int | None = None,
    ) -> ResourceStats:
        """Refresh the snapshot; gauges passed as None keep their last
        value (memory/CPU always resample)."""
        mem = self._memory_probe()
        cpu = self._cpu_probe()
        with self._lock:
            self._stats.memory_usage = mem
            self._stats.cpu_usage = cpu
            if pending_requests is not None:
                self._stats.pending_requests = pending_requests
            if active_tasks is not None:
                self._stats.active_tasks = active_tasks
            elif self._sc is not None:
                self._stats.active_tasks = self._active_tasks()
            self._stats.last_update = time.monotonic()
            return ResourceStats(**vars(self._stats))

    def get_stats(self) -> ResourceStats:
        """resource_control.rs:175-178."""
        with self._lock:
            return ResourceStats(**vars(self._stats))

    # ---- throttling (resource_control.rs:180-203) ----
    def should_throttle(self) -> bool:
        lim, st = self.limits, self.get_stats()
        return (
            (lim.max_memory > 0 and st.memory_usage > lim.max_memory)
            or (lim.max_cpu > 0.0 and st.cpu_usage > lim.max_cpu)
            or (
                lim.max_pending_requests > 0
                and st.pending_requests > lim.max_pending_requests
            )
        )

    def throttle_if_needed(self, sleep=time.sleep) -> float:
        """Sleep throttle_factor × monitor_interval_ms when a limit is
        exceeded; returns the seconds slept (0.0 when within limits).
        Logs the exceedance like the reference's warn! (:139-141)."""
        if not self.should_throttle():
            return 0.0
        st = self.get_stats()
        throttle_s = (
            self.limits.monitor_interval_ms * self.limits.throttle_factor
        ) / 1000.0
        warnings.warn(
            "resource limits exceeded:"
            f" memory={st.memory_usage // (1024 * 1024)}MB"
            f" cpu={st.cpu_usage:.0f}%"
            f" pending={st.pending_requests}"
            f" — throttling {throttle_s:.2f}s",
            RuntimeWarning,
            stacklevel=2,
        )
        sleep(throttle_s)
        with self._lock:
            self.throttled_count += 1
            self.throttled_total_s += throttle_s
        return throttle_s

    # ---- optional background monitor (resource_control.rs:84-160) ----
    def start(self) -> None:
        """Background memory/CPU sampler on a daemon thread, for
        engines whose rounds are long enough that boundary sampling is
        too coarse. Idempotent. It only SAMPLES — throttling stays at
        round boundaries where the loop can safely block."""
        if not self._stop_evt.is_set():
            return
        self._stop_evt.clear()

        def _loop():
            interval = self.limits.monitor_interval_ms / 1000.0
            while not self._stop_evt.is_set():
                self.update()
                self._stop_evt.wait(interval)

        self._thread = threading.Thread(
            target=_loop, daemon=True, name="resource-monitor"
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop_evt.set()
        self._thread = None
