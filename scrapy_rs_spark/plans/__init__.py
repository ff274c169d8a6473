from scrapy_rs_spark.plans.engine import CrawlEngine, CrawlStats
from scrapy_rs_spark.plans.resource_control import (
    ResourceController,
    ResourceLimits,
    ResourceStats,
)

__all__ = [
    "CrawlEngine",
    "CrawlStats",
    "ResourceController",
    "ResourceLimits",
    "ResourceStats",
]
