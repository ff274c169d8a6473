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
