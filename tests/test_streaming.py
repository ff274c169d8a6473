"""Structured-Streaming crawl: same operators, standing query, same
final item set as the batch engine (the streaming restatement of
SURVEY.md §2.9)."""

import pytest

from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.mocksite import BASE_URL, mock_site_pages
from scrapy_rs_spark.streaming.frontier_stream import StreamingCrawl


def test_streaming_crawl_matches_batch(spark, tmp_path):
    pages = mock_site_pages(
        spark, page_count=20, links_per_page=5, partitions=4
    ).localCheckpoint(eager=True)
    sc = StreamingCrawl(
        spark,
        pages,
        str(tmp_path / "stream"),
        Settings(scheduler_type="breadth_first", max_depth=2),
    )
    items = sc.run([f"{BASE_URL}/0"], timeout_s=240, idle_stop_s=12)
    got = {r.url for r in items.select("url").collect()}
    # closed-form BFS depth≤2 from page 0 over (i+k+1)%20 with 5 links:
    # {0} ∪ {1..5} ∪ {6..10}
    assert got == {f"{BASE_URL}/{i}" for i in list(range(0, 11))}
    # byte-identical text invariant holds in streaming mode too
    joined = items.alias("i").join(
        pages.alias("p"), items["url"] == pages["url"]
    )
    import pyspark.sql.functions as F

    assert (
        joined.filter(~F.col("i.text").eqNullSafe(F.col("p.text"))).count()
        == 0
    )


def test_incremental_seeding_generations(spark, tmp_path):
    """A second seed() call must not clobber the first generation's
    files (the file source tracks processed files by path, so a reused
    name is silently never re-read) nor its seen partition (round-3
    advice regression)."""
    import os

    from pyspark.sql import functions as F

    from scrapy_rs_spark.settings import Settings
    from scrapy_rs_spark.streaming.frontier_stream import StreamingCrawl

    pages = spark.createDataFrame(
        [(f"http://s.test/{i}", 200, bytearray(b"<html>x</html>"))
         for i in range(6)],
        "url STRING, status INT, html BINARY",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    sc = StreamingCrawl(
        spark, pages, str(tmp_path / "stream"),
        Settings(respect_robots_txt=False),
    )
    sc.seed([f"http://s.test/{i}" for i in range(3)])
    sc.seed([f"http://s.test/{i}" for i in range(3, 6)])
    files = sorted(os.listdir(sc.frontier_dir))
    gens = {f.split("-")[1] for f in files if f.startswith("seed-")}
    assert gens == {"0000", "0001"}, files
    # both generations' frontier rows and seen hashes are visible
    frontier = spark.read.parquet(sc.frontier_dir)
    assert frontier.count() == 6
    assert sc._load_seen().distinct().count() == 6
    # a replaying micro-batch (exclude its own bid) still sees ALL seeds
    assert sc._load_seen(exclude_batch=0).distinct().count() == 6
