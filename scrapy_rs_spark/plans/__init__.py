from scrapy_rs_spark.plans.engine import CrawlEngine, CrawlStats

__all__ = ["CrawlEngine", "CrawlStats"]
