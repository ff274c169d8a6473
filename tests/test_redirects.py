"""Redirect semantics (C6): Location resolution, hop bounding, loops.

Reference: status ∈ {301,302,303,307,308} (response.rs:126-142),
max_redirects default 10 (request.rs:97-99)."""

import pyspark.sql.functions as F

from scrapy_rs_spark.plans.engine import CrawlEngine
from scrapy_rs_spark.settings import Settings


def _pages(spark, rows):
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


def test_redirect_chain_followed(spark, tmp_path):
    pages = _pages(
        spark,
        [
            ("http://r.test/a", 301, None, "/b"),
            ("http://r.test/b", 302, None, "/c"),
            ("http://r.test/c", 200, b"<html><body>end</body></html>", None),
        ],
    )
    eng = CrawlEngine(
        spark, pages, Settings(scheduler_type="breadth_first"),
        store_path=str(tmp_path / "chain"),
    )
    stats = eng.run(["http://r.test/a"])
    got = {r.url for r in eng.items().select("url").collect()}
    assert got == {"http://r.test/c"}  # only the final 200 yields an item
    assert stats.responses == 3  # two redirects + one success


def test_redirect_loop_bounded(spark, tmp_path):
    pages = _pages(
        spark,
        [
            ("http://r.test/x", 301, None, "/y"),
            ("http://r.test/y", 301, None, "/x"),
        ],
    )
    eng = CrawlEngine(
        spark, pages, Settings(scheduler_type="breadth_first", max_redirects=5),
        store_path=str(tmp_path / "loop"),
    )
    # must terminate: the seen-set drops re-visits, hop meta bounds fresh
    # chains; no items ever produced
    stats = eng.run(["http://r.test/x"], max_rounds=20)
    assert stats.items == 0
    assert stats.requests <= 4
