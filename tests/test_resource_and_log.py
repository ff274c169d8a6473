"""Round-5 full-parity closers for the last two partial rows.

* T4 — ResourceController analogue (plans/resource_control.py vs
  /root/reference/engine/src/resource_control.rs): limit knobs,
  throttle sleep + counters, /proc probes, engine round-boundary
  wiring (lib.rs:1093-1103) and get_resource_stats (lib.rs:1265-1272).
* S8 — per-item LogPipeline (operators/middleware.log_pipeline vs
  /root/reference/pipeline/src/lib.rs:62-101): driver-side exact
  reference behavior (caplog-pinned) and the executor-side
  mapInPandas pass-through (identity-pinned, in-crawl pinned).
"""

import logging

import pyspark.sql.functions as F
import pytest

from scrapy_rs_spark.operators.middleware import log_pipeline
from scrapy_rs_spark.plans.engine import CrawlEngine
from scrapy_rs_spark.plans.resource_control import (
    ResourceController,
    ResourceLimits,
    ResourceStats,
    _ProcCpuProbe,
    _read_rss_bytes,
)
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.mocksite import BASE_URL, mock_site_pages

N, LINKS = 20, 5


@pytest.fixture(scope="module")
def pages(spark):
    return mock_site_pages(
        spark, page_count=N, links_per_page=LINKS, partitions=4
    ).localCheckpoint(eager=True)


# ---- ResourceController unit behavior ----

def _controller(mem=0, cpu=0.0, **limits):
    return ResourceController(
        ResourceLimits(**limits),
        memory_probe=lambda: mem,
        cpu_probe=lambda: cpu,
    )


def test_no_limits_never_throttles():
    """Reference default limits are all 0 = unlimited
    (resource_control.rs:40-51)."""
    c = _controller(mem=1 << 40, cpu=3200.0)
    c.update(pending_requests=10**9)
    assert not c.should_throttle()
    assert c.throttle_if_needed(sleep=lambda s: None) == 0.0
    assert c.throttled_count == 0


@pytest.mark.parametrize(
    "limits,stats,expect",
    [
        ({"max_memory": 100}, {"mem": 101}, True),
        ({"max_memory": 100}, {"mem": 100}, False),  # strictly greater
        ({"max_cpu": 50.0}, {"cpu": 50.1}, True),
        ({"max_cpu": 50.0}, {"cpu": 49.9}, False),
        ({"max_pending_requests": 5}, {"pending": 6}, True),
        ({"max_pending_requests": 5}, {"pending": 5}, False),
    ],
)
def test_each_limit_knob(limits, stats, expect):
    c = _controller(
        mem=stats.get("mem", 0), cpu=stats.get("cpu", 0.0), **limits
    )
    c.update(pending_requests=stats.get("pending", 0))
    assert c.should_throttle() is expect


def test_throttle_sleeps_factor_times_interval_and_warns():
    c = _controller(
        mem=200,
        max_memory=100,
        throttle_factor=0.25,
        monitor_interval_ms=2000,
    )
    c.update()
    slept = []
    with pytest.warns(RuntimeWarning, match="resource limits exceeded"):
        out = c.throttle_if_needed(sleep=slept.append)
    assert slept == [0.5] and out == 0.5
    assert c.throttled_count == 1 and c.throttled_total_s == 0.5


def test_update_keeps_unpassed_gauges():
    c = _controller(mem=7)
    c.update(pending_requests=42)
    c.update()  # pending not passed → keeps last value
    st = c.get_stats()
    assert st.pending_requests == 42 and st.memory_usage == 7
    assert st.last_update is not None
    assert isinstance(st, ResourceStats)


def test_proc_probes_real_values():
    """Default probes read /proc/self: RSS is positive, CPU%% is
    non-negative and 0.0 on the first (delta-less) sample."""
    assert _read_rss_bytes() > 10 * 1024 * 1024  # a JVM-hosting pytest
    probe = _ProcCpuProbe()
    first = probe()
    assert first == 0.0
    sum(range(200_000))  # burn a little CPU for the delta
    assert probe() >= 0.0


def test_background_monitor_samples_and_stops():
    import time

    c = _controller(mem=9, monitor_interval_ms=5)
    c.start()
    c.start()  # idempotent
    deadline = time.monotonic() + 2.0
    while c.get_stats().last_update is None and time.monotonic() < deadline:
        time.sleep(0.01)
    assert c.get_stats().last_update is not None
    assert c.get_stats().memory_usage == 9
    c.stop()
    assert c._thread is None


# ---- engine wiring (T4) ----

def test_engine_resource_stats_none_when_disabled(spark, pages, tmp_path):
    eng = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=1, respect_robots_txt=False),
        store_path=str(tmp_path / "s0"),
    )
    assert eng.resource_controller is None
    assert eng.get_resource_stats() is None


def test_engine_throttles_on_frontier_backlog(spark, pages, tmp_path):
    """max_pending_requests=1 against a growing mock-site frontier:
    the controller trips at round boundaries (pending_requests fed
    from the frontier-size observation, lib.rs:1093-1103 analogue)
    while the crawl result stays IDENTICAL to an unthrottled run —
    the reference only ever sleeps, it never sheds work."""
    s = Settings(
        max_depth=3,
        respect_robots_txt=False,
        enable_resource_monitoring=True,
        max_pending_requests=1,
        monitor_interval_ms=20,  # throttle sleep = 10 ms/round
    )
    eng = CrawlEngine(spark, pages, s, store_path=str(tmp_path / "s1"))
    with pytest.warns(RuntimeWarning, match="resource limits exceeded"):
        stats = eng.run([f"{BASE_URL}/0"], max_rounds=10)
    assert eng.resource_controller.throttled_count >= 1
    st = eng.get_resource_stats()
    assert st is not None and st.memory_usage > 0
    assert st.last_update is not None

    base = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=3, respect_robots_txt=False),
        store_path=str(tmp_path / "s2"),
    )
    ref = base.run([f"{BASE_URL}/0"], max_rounds=10)
    assert (stats.requests, stats.items, stats.new_urls) == (
        ref.requests,
        ref.items,
        ref.new_urls,
    )


# ---- log pipeline (S8) ----

def _items_df(spark, n=5):
    return spark.range(n).select(
        F.concat(F.lit("http://site.test/page/"), F.col("id")).alias("url"),
        F.lit("extracted_text").alias("item_type"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def test_log_pipeline_driver_side_logs_each_item(spark, caplog):
    df = _items_df(spark, 4)
    pipe = log_pipeline(
        level="info", spider_name="quotes", executor_side=False
    )
    with caplog.at_level(logging.INFO, logger="scrapy_rs_spark.items"):
        out = pipe(df)
    assert out is df  # pass-through, like the reference returning Ok(item)
    lines = [
        r.getMessage()
        for r in caplog.records
        if "scraped item" in r.getMessage()
    ]
    assert len(lines) == 4
    assert all(line.startswith("Spider 'quotes' scraped item:") for line in lines)
    assert any("http://site.test/page/3" in line for line in lines)


def test_log_pipeline_driver_max_rows_suppresses(spark, caplog):
    pipe = log_pipeline(executor_side=False, max_rows=2)
    with caplog.at_level(logging.INFO, logger="scrapy_rs_spark.items"):
        pipe(_items_df(spark, 5))
    msgs = [r.getMessage() for r in caplog.records]
    assert sum("scraped item" in m for m in msgs) == 2
    assert sum("suppressed" in m for m in msgs) == 1


def test_log_pipeline_level_validation():
    with pytest.raises(ValueError, match="unknown log level"):
        log_pipeline(level="loud")
    # LogPipeline::info()/debug() analogues both construct
    log_pipeline(level="debug")
    log_pipeline(level="INFO")


def test_log_pipeline_executor_side_is_identity(spark):
    df = _items_df(spark, 7)
    out = log_pipeline(executor_side=True, max_rows=3)(df)
    assert out.schema == df.schema
    assert sorted(r.url for r in out.collect()) == sorted(
        r.url for r in df.collect()
    )


def test_log_pipeline_in_crawl_executor_side(spark, pages, tmp_path):
    """Wired as the item pipeline of a real crawl: rides the items
    write (zero extra jobs), crawl stats identical to a pipeline-less
    run and items persisted unchanged."""
    s = Settings(max_depth=2, respect_robots_txt=False)
    eng = CrawlEngine(
        spark,
        pages,
        s,
        store_path=str(tmp_path / "lp"),
        item_pipelines=log_pipeline(spider_name="mock"),
    )
    stats = eng.run([f"{BASE_URL}/0"], max_rounds=8)
    base = CrawlEngine(
        spark, pages, s, store_path=str(tmp_path / "lp_base")
    )
    ref = base.run([f"{BASE_URL}/0"], max_rounds=8)
    assert (stats.requests, stats.items) == (ref.requests, ref.items)
    assert eng.items().count() == base.items().count()


def test_monitor_surfaces_resource_stats(spark, pages, tmp_path):
    """Reference Metrics.resource_stats is an Option (monitoring/src/
    metrics.rs:11-40): None until a controller is attached; the DTO
    subset afterwards."""
    from scrapy_rs_spark.monitoring import CrawlMonitor

    s = Settings(
        max_depth=1,
        respect_robots_txt=False,
        enable_resource_monitoring=True,
    )
    eng = CrawlEngine(spark, pages, s, store_path=str(tmp_path / "mon"))
    eng.run([f"{BASE_URL}/0"], max_rounds=4)
    mon = CrawlMonitor(eng.store)
    assert mon.snapshot()["resource_stats"] is None
    mon.attach_resources(eng.resource_controller)
    rs = mon.snapshot()["resource_stats"]
    assert set(rs) == {
        "memory_usage",
        "cpu_usage",
        "active_tasks",
        "pending_requests",
    }
    assert rs["memory_usage"] > 0
    import json

    json.dumps(rs)  # DTO must be JSON-serializable for /metrics
