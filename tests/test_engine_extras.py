"""Engine extras: page_limit (F7), signals (X6), metrics table (A1/A4),
and plan hygiene (pushdown/pruning on the fetch path)."""

import pyspark.sql.functions as F

from scrapy_rs_spark.plans.engine import CrawlEngine
from scrapy_rs_spark.plans.signals import (
    ENGINE_STOPPED,
    ITEMS_SCRAPED,
    ROUND_FINISHED,
    SignalManager,
)
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.mocksite import BASE_URL, mock_site_pages


def test_page_limit_stops_crawl(spark, tmp_path):
    """F7: spider stops emitting after page_limit
    (benchmark/src/scrapy_rs.rs:202-216)."""
    pages = mock_site_pages(spark, 50, 5, partitions=4).localCheckpoint(True)
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", page_limit=7),
        store_path=str(tmp_path / "lim"),
    )
    stats = eng.run([f"{BASE_URL}/0"])
    assert stats.requests == 7
    assert stats.items == 7
    # deterministic batch selection under the limit: rank order is total
    got = sorted(r.url for r in eng.items().collect())
    assert f"{BASE_URL}/0" in got


def test_signals_fire_per_round(spark, tmp_path):
    pages = mock_site_pages(spark, 20, 5, partitions=4).localCheckpoint(True)
    seen: list[tuple[str, dict]] = []
    sm = SignalManager()
    sm.connect(ITEMS_SCRAPED, lambda s, p: seen.append((s, p)))
    sm.connect(ROUND_FINISHED, lambda s, p: seen.append((s, p)))
    sm.connect(ENGINE_STOPPED, lambda s, p: seen.append((s, p)))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", max_depth=1),
        store_path=str(tmp_path / "sig"),
        signals=sm,
    )
    stats = eng.run([f"{BASE_URL}/0"])
    kinds = [s for s, _ in seen]
    assert kinds.count(ROUND_FINISHED) == len(
        [m for m in stats.per_round if m["round"] > 0]
    )
    # signal totals equal engine stats (per-record handlers would see
    # identical sums — the set-oriented contract)
    assert sum(p["items"] for s, p in seen if s == ITEMS_SCRAPED) == stats.items
    stopped = [p for s, p in seen if s == ENGINE_STOPPED]
    assert stopped and stopped[0]["requests"] == stats.requests


def test_metrics_df_rates(spark, tmp_path):
    pages = mock_site_pages(spark, 20, 5, partitions=4).localCheckpoint(True)
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", max_depth=2),
        store_path=str(tmp_path / "met"),
    )
    stats = eng.run([f"{BASE_URL}/0"])
    # EngineStats duration/rate parity (stats/mod.rs:41-50):
    # observational wall clock on the returned object, never persisted
    assert stats.duration() > 0
    assert stats.requests_per_second() == stats.requests / stats.duration_s
    from scrapy_rs_spark.plans.engine import CrawlStats

    assert CrawlStats().requests_per_second() is None
    mdf = eng.store.metrics_df()
    assert mdf.agg(F.sum("requests")).collect()[0][0] == stats.requests
    # A4: per-round delta via lag
    from pyspark.sql.window import Window

    deltas = mdf.withColumn(
        "delta", F.col("requests") - F.lag("requests").over(Window.orderBy("round"))
    )
    assert deltas.count() == mdf.count()


def test_fetch_plan_prunes_pages_columns(spark, tmp_path):
    """Scan hygiene: the fetch join must NOT read pages.text/lang/warc_ts
    — at 100 TB the text column alone is a large scan fraction."""
    from scrapy_rs_spark.operators.fetch import fetch_join
    from scrapy_rs_spark.sources.seeds import seeds_frontier

    p = str(tmp_path / "pages_parquet")
    mock_site_pages(spark, 100, 5, partitions=2).write.parquet(p)
    pages = spark.read.parquet(p)
    batch = seeds_frontier(spark, [f"{BASE_URL}/0", f"{BASE_URL}/1"])
    plan = (
        fetch_join(batch, pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_lines = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan_lines, plan
    scan = scan_lines[0]
    for col in ("text", "lang", "warc_ts"):
        assert col not in scan, f"{col} not pruned from pages scan: {scan}"
    assert "html" in scan and "PushedFilters: [IsNotNull(url)]" in scan


def test_session_scale_configs(spark):
    """The session factory must keep the scale levers on (AQE, skew
    join, Arrow) — regressions here silently serialize at 100 TB."""
    c = spark.conf
    assert c.get("spark.sql.adaptive.enabled") == "true"
    assert c.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert c.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert c.get("spark.sql.session.timeZone") == "UTC"


def test_priority_order_with_page_limit(spark, tmp_path):
    """W1 at engine level: under a page_limit the batch takes the
    highest-priority rows first (the reference pops priority order)."""
    pages = mock_site_pages(spark, 30, 5, partitions=2).localCheckpoint(True)
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="memory", crawl_strategy="priority", page_limit=2),
        store_path=str(tmp_path / "prio"),
    )
    seeds = [
        (f"{BASE_URL}/3", 1, 0),
        (f"{BASE_URL}/7", 9, 0),  # highest priority
        (f"{BASE_URL}/11", 5, 0),
    ]
    eng.run(seeds)
    got = {r.url for r in eng.items().select("url").collect()}
    assert got == {f"{BASE_URL}/7", f"{BASE_URL}/11"}  # top-2 by priority


def test_pause_resume_midflight_and_signal_order(spark, tmp_path):
    """Cooperative pause (round-3 verdict ask): pause() gates the loop
    at a round boundary, unpause() continues, and the final crawl is
    identical to an uninterrupted one. Signal parity 12/12: the
    pause/resume/stopping/spider events fire in reference order
    (core/src/signal.rs:16-41; Notify gates engine/src/lib.rs:1153-1193)."""
    import threading
    import time

    from scrapy_rs_spark.plans.signals import (
        ENGINE_PAUSED,
        ENGINE_RESUMED,
        ENGINE_STARTED,
        ENGINE_STOPPING,
        SPIDER_CLOSED,
        SPIDER_OPENED,
    )

    pages = mock_site_pages(spark, 100, 10, partitions=4).localCheckpoint(True)

    # uninterrupted baseline
    base = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", max_depth=3),
        store_path=str(tmp_path / "base"),
    )
    base_stats = base.run([f"{BASE_URL}/0"])

    seen: list[tuple[str, dict]] = []
    sm = SignalManager()
    for sig in (ENGINE_STARTED, SPIDER_OPENED, ENGINE_PAUSED, ENGINE_RESUMED,
                ENGINE_STOPPING, SPIDER_CLOSED, ENGINE_STOPPED,
                ROUND_FINISHED):
        sm.connect(sig, lambda s, p: seen.append((s, p)))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", max_depth=3),
        store_path=str(tmp_path / "paused"),
        signals=sm,
    )
    # a signal handler requests the pause after round 2 commits — the
    # loop must gate at the NEXT boundary, not mid-round
    sm.connect(
        ROUND_FINISHED,
        lambda s, p: eng.pause() if p["round"] == 2 else None,
    )
    result = {}
    t = threading.Thread(
        target=lambda: result.update(stats=eng.run([f"{BASE_URL}/0"]))
    )
    t.start()
    deadline = time.time() + 120
    while time.time() < deadline and not any(
        s == ENGINE_PAUSED for s, _ in seen
    ):
        time.sleep(0.1)
    assert any(s == ENGINE_PAUSED for s, _ in seen), "pause never gated"
    assert t.is_alive()  # crawl is blocked, not finished
    # paused exactly at a committed round boundary
    assert eng.store.latest_round() == 2
    eng.unpause()
    t.join(timeout=180)
    assert not t.is_alive()
    # paused+resumed crawl ≡ uninterrupted crawl
    assert result["stats"].requests == base_stats.requests == 31
    assert result["stats"].items == base_stats.items
    names = [s for s, _ in seen]
    assert names.index(ENGINE_STARTED) < names.index(SPIDER_OPENED)
    assert names.count(ENGINE_PAUSED) == 1
    assert names.index(ENGINE_PAUSED) < names.index(ENGINE_RESUMED)
    assert (
        names.index(ENGINE_RESUMED)
        < names.index(ENGINE_STOPPING)
        < names.index(SPIDER_CLOSED)
        < names.index(ENGINE_STOPPED)
    )


def test_stop_gracefully_midcrawl(spark, tmp_path):
    """stop() ends the loop at a round boundary; the store remains
    resumable and resume() completes the crawl identically."""
    from scrapy_rs_spark.plans.signals import ENGINE_STOPPING

    pages = mock_site_pages(spark, 100, 10, partitions=4).localCheckpoint(True)
    seen = []
    sm = SignalManager()
    sm.connect(ENGINE_STOPPING, lambda s, p: seen.append((s, p)))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", max_depth=3),
        store_path=str(tmp_path / "stopme"),
        signals=sm,
    )
    sm.connect(
        ROUND_FINISHED,
        lambda s, p: eng.stop() if p["round"] == 2 else None,
    )
    stats = eng.run([f"{BASE_URL}/0"])
    assert stats.rounds == 2
    assert seen and seen[0][1]["stopped_by_request"] is True
    # the committed store resumes to the full 31-page crawl
    stats2 = eng.resume()
    assert stats2.requests == 31
