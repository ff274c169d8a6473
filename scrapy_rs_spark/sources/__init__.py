from scrapy_rs_spark.sources.mocksite import mock_site_pages, mock_site_robots
from scrapy_rs_spark.sources.store import CrawlStore
from scrapy_rs_spark.sources.seeds import seeds_frontier
from scrapy_rs_spark.sources.warc import (
    read_warc,
    warc_to_pages,
    pages_to_warc_records,
    cdx_index,
    fetch_cdx_record,
    stream_warc,
)
from scrapy_rs_spark.sources.sitemap import (
    robots_sitemaps,
    sitemap_entries,
    sitemap_index_entries,
    sitemap_seeds,
)

__all__ = [
    "mock_site_pages",
    "mock_site_robots",
    "CrawlStore",
    "seeds_frontier",
    "read_warc",
    "warc_to_pages",
    "pages_to_warc_records",
    "cdx_index",
    "fetch_cdx_record",
    "stream_warc",
    "robots_sitemaps",
    "sitemap_entries",
    "sitemap_index_entries",
    "sitemap_seeds",
]
