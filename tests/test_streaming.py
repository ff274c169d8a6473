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
