from scrapy_rs_spark.sources.mocksite import mock_site_pages, mock_site_robots
from scrapy_rs_spark.sources.store import CrawlStore
from scrapy_rs_spark.sources.seeds import seeds_frontier

__all__ = ["mock_site_pages", "mock_site_robots", "CrawlStore", "seeds_frontier"]
