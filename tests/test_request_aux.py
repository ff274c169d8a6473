"""Request auxiliary fields (round-3 verdict ask): timeout_ms,
encoding, flags — reference Request surface core/src/request.rs:74-90.

* encoding: per-request response-body decode override — a shift-jis
  page fetched by a request that declared its encoding extracts text;
  without it the strict-UTF-8 default routes the page to the error
  channel (reference decodes per request encoding, response.rs:71-78).
* timeout_ms: rows whose observed fetch latency exceeds the request
  timeout behave as timeouts — retryable class, like Error::Timeout
  (error.rs:446-472), distinguished from 'connection' by
  fetch_error_class.
* flags: opaque ARRAY<STRING> pass-through that survives the store
  round trip.
"""

import pyspark.sql.functions as F

from scrapy_rs_spark.operators.fetch import fetch_error_class, fetch_join
from scrapy_rs_spark.plans.engine import CrawlEngine
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.seeds import seeds_frontier

_SJIS_TEXT = "こんにちは世界"
_SJIS_HTML = f"<html><body>{_SJIS_TEXT}</body></html>".encode("shift_jis")


def _sjis_pages(spark):
    return spark.createDataFrame(
        [("http://jp.test/a", 200, bytearray(_SJIS_HTML))],
        "url STRING, status INT, html BINARY",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))


def test_encoding_override_extracts_shiftjis_text(spark, tmp_path):
    eng = CrawlEngine(
        spark,
        _sjis_pages(spark),
        Settings(max_depth=0, respect_robots_txt=False),
        store_path=str(tmp_path / "sjis"),
    )
    stats = eng.run([{"url": "http://jp.test/a", "encoding": "shift_jis"}])
    assert stats.items == 1 and stats.errors == 0
    assert eng.items().collect()[0].text == _SJIS_TEXT


def test_without_encoding_strict_utf8_errors(spark, tmp_path):
    """Control: the same bytes without the override fail the strict
    UTF-8 decode and land in the error channel (C4 contract)."""
    eng = CrawlEngine(
        spark,
        _sjis_pages(spark),
        Settings(max_depth=0, respect_robots_txt=False),
        store_path=str(tmp_path / "strict"),
    )
    stats = eng.run(["http://jp.test/a"])
    assert stats.items == 0 and stats.errors == 1


def test_timeout_routes_to_retry_class(spark):
    """A row whose latency exceeds its timeout_ms classifies as
    'timeout' (status/html nulled → retryable), a missing page as
    'connection', an in-budget row fetches normally."""
    pages = spark.createDataFrame(
        [
            ("http://t.test/slow", 200, "<html>s</html>", 5000),
            ("http://t.test/fast", 200, "<html>f</html>", 10),
        ],
        "url STRING, status INT, html STRING, latency_ms BIGINT",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    batch = seeds_frontier(
        spark,
        [
            {"url": "http://t.test/slow", "timeout_ms": 1000},
            {"url": "http://t.test/fast", "timeout_ms": 1000},
            {"url": "http://t.test/missing"},
        ],
    )
    fetched = fetch_join(batch, pages).withColumn(
        "error_class", fetch_error_class(fetch_join(batch, pages))
    )
    rows = {r.url: r for r in fetched.collect()}
    slow, fast, missing = (
        rows["http://t.test/slow"],
        rows["http://t.test/fast"],
        rows["http://t.test/missing"],
    )
    assert slow.timed_out and slow.status is None and slow.html is None
    assert slow.error_class == "timeout"
    assert not fast.timed_out and fast.status == 200
    assert fast.error_class is None
    assert missing.error_class == "connection"


def test_timeout_retries_then_exhausts_e2e(spark, tmp_path):
    """E2E: the timed-out request enters the retry channel (retries
    metric) and exhausts into errors like any retryable failure."""
    pages = spark.createDataFrame(
        [
            ("http://t.test/slow", 200, "<html>s</html>", 5000),
            ("http://t.test/fast", 200, "<html>f</html>", 10),
        ],
        "url STRING, status INT, html STRING, latency_ms BIGINT",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=0, respect_robots_txt=False, max_retries=1),
        store_path=str(tmp_path / "to"),
    )
    stats = eng.run(
        [
            {"url": "http://t.test/slow", "timeout_ms": 1000},
            {"url": "http://t.test/fast", "timeout_ms": 1000},
        ]
    )
    assert stats.items == 1  # fast fetched fine
    assert stats.retries == 1  # slow retried once (max_retries=1)...
    assert stats.errors == 1  # ...then exhausted into the error count


def test_flags_pass_through_store(spark, tmp_path):
    """flags ride the frontier untouched through commit/load."""
    from scrapy_rs_spark.sources.store import CrawlStore

    df = seeds_frontier(
        spark, [{"url": "http://f.test/x", "flags": ["nocache", "audit"]}]
    )
    store = CrawlStore(spark, str(tmp_path / "flags"))
    store.commit_round(0, df, df.select("url_hash"), None, None,
                       {"round": 0})
    row = store.load_frontier(0).collect()[0]
    assert row.flags == ["nocache", "audit"]
    assert row.timeout_ms is None and row.encoding is None
