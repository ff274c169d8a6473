"""Round-2 behavior fixes: follow_redirects gating, redirect priority
carry, run()-on-reused-store refusal, item-metric accuracy, DynamicItem
fields, POST/GET identity + fetch, multi-format settings files."""

import pyspark.sql.functions as F
import pytest

from scrapy_rs_spark.api import Spider, run_crawl
from scrapy_rs_spark.operators.fetch import fetch_join
from scrapy_rs_spark.operators.middleware import filter_pipeline, random_delay
from scrapy_rs_spark.plans.engine import CrawlEngine
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.seeds import seeds_frontier


def _pages(spark, rows):
    """rows: (url, status, html bytes, location-or-None)"""
    return spark.createDataFrame(
        [
            (u, st, bytearray(b or b""), {"location": loc} if loc else None)
            for u, st, b, loc in rows
        ],
        "url STRING, status INT, html BINARY, headers MAP<STRING,STRING>",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
        "status",
        "headers",
    )


def test_follow_redirects_false_is_honored(spark, tmp_path):
    pages = _pages(
        spark,
        [
            ("http://fr.test/a", 301, None, "/b"),
            ("http://fr.test/b", 200, b"<html><body>end</body></html>", None),
        ],
    )
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", follow_redirects=False),
        store_path=str(tmp_path / "nofollow"),
    )
    stats = eng.run(["http://fr.test/a"])
    # 3xx is a terminal response: counted, never re-enqueued
    assert stats.requests == 1
    assert eng.items().count() == 0


def test_redirect_preserves_priority(spark, tmp_path):
    pages = _pages(
        spark,
        [
            ("http://pr.test/a", 301, None, "/b"),
            ("http://pr.test/b", 200, b"<html><body>x</body></html>", None),
        ],
    )
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="memory", crawl_strategy="priority"),
        store_path=str(tmp_path / "prio"),
    )
    eng.run([("http://pr.test/a", 7, 0)])
    # the redirect target row carried the originating priority
    fr1 = eng.store.load_frontier(1)
    row = fr1.filter(F.col("url") == "http://pr.test/b").collect()
    assert len(row) == 1 and row[0].priority == 7


def test_run_refuses_reused_store(spark, tmp_path):
    pages = _pages(
        spark, [("http://ru.test/a", 200, b"<html>a</html>", None)]
    )
    store = str(tmp_path / "reuse")
    eng = CrawlEngine(
        spark, pages, Settings(scheduler_type="breadth_first"),
        store_path=store,
    )
    eng.run(["http://ru.test/a"])
    eng2 = CrawlEngine(
        spark, pages, Settings(scheduler_type="breadth_first"),
        store_path=store,
    )
    with pytest.raises(RuntimeError, match="already has committed rounds"):
        eng2.run(["http://ru.test/a"])
    # resume() remains the supported continuation path
    stats = eng2.resume()
    assert stats.requests == 1


def test_items_metric_counts_pipeline_output(spark, tmp_path):
    pages = _pages(
        spark,
        [
            ("http://im.test/a", 200, b"<html><body>keep me</body></html>", None),
            ("http://im.test/b", 200, b"<html><body>drop</body></html>", None),
        ],
    )
    pipeline = filter_pipeline(F.col("text") != "drop")
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first"),
        store_path=str(tmp_path / "metric"),
        item_pipelines=pipeline,
    )
    stats = eng.run(["http://im.test/a", "http://im.test/b"])
    assert stats.requests == 2
    assert stats.items == 1  # post-pipeline count, not n_success
    assert eng.items().count() == 1


def test_invalid_utf8_routed_to_errors(spark, tmp_path):
    pages = _pages(
        spark,
        [
            ("http://u8.test/good", 200, b"<html><body>ok</body></html>", None),
            ("http://u8.test/bad", 200, b"\xff\xfe<html>", None),
        ],
    )
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first"),
        store_path=str(tmp_path / "utf8"),
    )
    stats = eng.run(["http://u8.test/good", "http://u8.test/bad"])
    assert stats.items == 1
    assert stats.errors == 1  # decode failure is an error, not an item
    assert eng.items().filter(F.col("text").isNull()).count() == 0


def test_dynamic_item_fields_roundtrip(spark, tmp_path):
    """DynamicItem parity (core/src/item.rs:28-36): a spider extracting
    {title, price} round-trips through store.load_items()."""
    html = b"<html><head><title>Widget</title></head><body>price: 9.99</body></html>"
    pages = _pages(spark, [("http://dyn.test/p1", 200, html, None)])

    def parse_fields(b: bytes) -> dict:
        import re

        text = b.decode("utf-8")
        title = re.search(r"<title>(.*?)</title>", text)
        price = re.search(r"price: ([0-9.]+)", text)
        return {
            "title": title.group(1) if title else "",
            "price": price.group(1) if price else "",
        }

    spider = Spider(
        "dyn", start_urls=["http://dyn.test/p1"], parse_fields=parse_fields
    )
    stats = run_crawl(
        spark, spider, pages, Settings(scheduler_type="breadth_first"),
        store_path=str(tmp_path / "dyn"),
    )
    assert stats.items == 1
    row = stats.engine.items().collect()[0]
    assert row.fields["title"] == "Widget"
    assert row.fields["price"] == "9.99"
    assert row.text is not None  # default text extraction still runs


def test_post_get_distinct_identity_and_fetch(spark):
    """A POST and a GET of the same URL are distinct frontier rows
    (request.rs:240-253) and fetch distinct page rows when the pages
    table is method-aware."""
    seeds = seeds_frontier(
        spark,
        [
            {"url": "http://m.test/x", "method": "GET"},
            {"url": "http://m.test/x", "method": "POST", "body": b"q=1"},
        ],
    )
    rows = seeds.collect()
    assert len(rows) == 2
    hashes = {r.method: r.url_hash for r in rows}
    assert hashes["GET"] != hashes["POST"]
    post_row = [r for r in rows if r.method == "POST"][0]
    assert bytes(post_row.body) == b"q=1"

    pages = spark.createDataFrame(
        [
            ("http://m.test/x", "GET", 200, bytearray(b"<html>get</html>")),
            ("http://m.test/x", "POST", 201, bytearray(b"<html>post</html>")),
        ],
        "url STRING, method STRING, status INT, html BINARY",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    fetched = fetch_join(seeds, pages)
    got = {r.method: (r.status, bytes(r.html)) for r in fetched.collect()}
    assert got["GET"] == (200, b"<html>get</html>")
    assert got["POST"] == (201, b"<html>post</html>")


def test_cookies_copied_on_follow(spark, tmp_path):
    html = b'<html><body><a href="/next">n</a></body></html>'
    pages = _pages(
        spark,
        [
            ("http://ck.test/a", 200, html, None),
            ("http://ck.test/next", 200, b"<html>end</html>", None),
        ],
    )
    eng = CrawlEngine(
        spark, pages, Settings(scheduler_type="breadth_first"),
        store_path=str(tmp_path / "ck"),
    )
    seeds = seeds_frontier(
        spark, [{"url": "http://ck.test/a", "cookies": {"sid": "abc"}}]
    )
    eng.run(seeds)
    fr1 = eng.store.load_frontier(1)
    row = fr1.filter(F.col("url") == "http://ck.test/next").collect()
    assert len(row) == 1
    assert row[0].cookies == {"sid": "abc"}


def test_random_delay_jitter_deterministic(spark):
    seeds = seeds_frontier(
        spark, [f"http://rd.test/{i}" for i in range(20)]
    )
    mw = random_delay(500, seed=7)
    out1 = {r.url: int(r.meta["delay_ms"]) for r in mw(seeds).collect()}
    out2 = {r.url: int(r.meta["delay_ms"]) for r in mw(seeds).collect()}
    assert out1 == out2  # salted hash, not RNG: stable under re-run
    assert all(0 <= v < 500 for v in out1.values())
    assert len(set(out1.values())) > 1  # actually jitters


def test_settings_from_py_and_toml(tmp_path):
    py = tmp_path / "settings.py"
    py.write_text(
        "# reference-style settings.py\n"
        "CONCURRENT_REQUESTS = 8\n"
        "DOWNLOAD_DELAY_MS = 250\n"
        "FOLLOW_REDIRECTS = False\n"
        'USER_AGENT = "my-bot/1.0"  # trailing comment\n'
        'DOMAIN_WHITELIST = [\n    "a.test",\n    "b.test",\n]\n'
        "IGNORED_EXPR = 1 + foo()\n"
    )
    s = Settings.from_file(str(py))
    assert s.concurrent_requests == 8
    assert s.download_delay_ms == 250
    assert s.follow_redirects is False
    assert s.user_agent == "my-bot/1.0"
    assert s.domain_whitelist == ["a.test", "b.test"]

    toml = tmp_path / "settings.toml"
    toml.write_text(
        'SCHEDULER_TYPE = "memory"\nMAX_RETRIES = 5\n'
        'DOMAIN_BLACKLIST = ["x.test"]\n'
    )
    t = Settings.from_file(str(toml))
    assert t.scheduler_type == "memory"
    assert t.max_retries == 5
    assert t.domain_blacklist == ["x.test"]

    yml = tmp_path / "settings.yaml"
    yml.write_text(
        "SCHEDULER_TYPE: domain_group\nMAX_DEPTH: 4\n"
        "RESPECT_ROBOTS_TXT: false\n"
    )
    y = Settings.from_file(str(yml))
    assert y.scheduler_type == "domain_group"
    assert y.max_depth == 4
    assert y.respect_robots_txt is False


def test_monitoring_snapshot_and_http(spark, tmp_path):
    """Monitoring parity (reference monitoring/src/{metrics,server,
    dashboard}.rs): snapshot totals/rates from committed rounds, served
    over HTTP without touching executors."""
    import json as _json
    import urllib.request

    from scrapy_rs_spark.monitoring import CrawlMonitor

    pages = _pages(
        spark,
        [
            ("http://mon.test/a", 200, b"<html>a</html>", None),
            ("http://mon.test/b", 404, None, None),
        ],
    )
    eng = CrawlEngine(
        spark, pages, Settings(scheduler_type="breadth_first"),
        store_path=str(tmp_path / "mon"),
    )
    eng.run(["http://mon.test/a", "http://mon.test/b"])
    mon = CrawlMonitor(eng.store)
    snap = mon.snapshot()
    assert snap["totals"]["requests"] == 2
    assert snap["totals"]["items"] == 1
    assert snap["totals"]["errors"] == 1
    assert 0 < snap["rates"]["success_rate"] <= 1
    # queue-depth gauges from the latest committed round (reference
    # pending_requests, monitoring/src/metrics.rs:19-20): the crawl
    # finished, so the frontier is drained and seen holds both URLs
    assert snap["gauges"]["pending_requests"] == 0
    assert snap["gauges"]["seen_size"] == 2
    port = mon.serve()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=10
        ) as r:
            served = _json.load(r)
        assert served["totals"] == snap["totals"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ) as r:
            html = r.read().decode()
        assert "Crawl dashboard" in html and "requests" in html
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=10
        ) as r:
            assert _json.load(r)["status"] == "ok"
    finally:
        mon.stop()
