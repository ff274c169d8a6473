"""scrapy_rs_spark — a PySpark-native web-crawl analytics engine.

A brand-new, Spark-first reimplementation of the capabilities of the
zeliu/scrapy-rs reference crawler (see /root/reference, SURVEY.md):

* distributed URL frontier over bucketed tables (Iceberg in production,
  parquet-backed in this sandbox — see ``sources.store``),
* URL canonicalization + 64-bit hashing feeding a partitioned seen-set
  probed by left-anti join (with bloom pre-filter),
* per-host politeness scheduling (robots.txt, crawl-delay, per-domain
  caps) expressed as salted per-host repartitioning + Window ranks,
* fetch→parse→extract as vectorized pandas/Arrow UDF batches,
* iterative DataFrame crawl rounds with checkpoint/resume + lineage.

Everything is declarative DataFrame/SQL so Catalyst/AQE handle pushdown,
join strategy, and skew; Python runs only inside Arrow-batched UDFs.
"""

from scrapy_rs_spark.session import build_session
from scrapy_rs_spark.settings import Settings


def __getattr__(name):
    # lazy: these pull in the engine stack / optional surfaces
    if name in ("Spider", "run_crawl"):
        from scrapy_rs_spark import api

        return getattr(api, name)
    if name == "CrawlEngine":
        from scrapy_rs_spark.plans.engine import CrawlEngine

        return CrawlEngine
    if name == "CrawlMonitor":
        from scrapy_rs_spark.monitoring import CrawlMonitor

        return CrawlMonitor
    raise AttributeError(name)


__all__ = [
    "build_session",
    "Settings",
    "Spider",
    "run_crawl",
    "CrawlEngine",
    "CrawlMonitor",
]
__version__ = "0.1.0"
