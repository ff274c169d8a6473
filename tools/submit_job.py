"""The north rule's ship vehicle, exercised for real:

    spark-submit --master local[N] --py-files crawlspark.zip \
        tools/submit_job.py [store_path]

The job imports the package ONLY from the shipped zip (it refuses to
fall back to a repo checkout on sys.path), runs the closed-form
mock-site BFS crawl, and prints one JSON line of stats — the driver
pattern a multi-executor cluster runs, minus the cluster. Pinned by
tests/test_spark_submit.py, which launches an actual spark-submit
subprocess and checks the closed-form numbers.
"""

import json
import sys

from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("crawlspark-submit-check").getOrCreate()

# the package must resolve from the --py-files zip: on a real cluster
# there is no /root/repo on the executors, so a job that silently
# imports a local checkout would hide a broken ship path
import scrapy_rs_spark  # noqa: E402

pkg_file = scrapy_rs_spark.__file__ or ""
if ".zip" not in pkg_file:
    print(
        json.dumps(
            {"error": f"package imported outside the shipped zip: {pkg_file}"}
        )
    )
    sys.exit(2)

from scrapy_rs_spark import Settings  # noqa: E402
from scrapy_rs_spark.plans.engine import CrawlEngine  # noqa: E402
from scrapy_rs_spark.sources.mocksite import (  # noqa: E402
    BASE_URL,
    mock_site_pages,
)

store = sys.argv[1] if len(sys.argv) > 1 else None
pages = mock_site_pages(spark, page_count=100, links_per_page=10)
eng = CrawlEngine(
    spark,
    pages,
    Settings(scheduler_type="breadth_first", max_depth=3),
    store_path=store,
)
stats = eng.run([f"{BASE_URL}/0"])
# single JSON line on stdout — the test parses the LAST line
print(
    json.dumps(
        {
            "requests": stats.requests,
            "items": stats.items,
            "errors": stats.errors,
            "new_urls": stats.new_urls,
            "per_round_requests": [m["requests"] for m in stats.per_round],
            "pkg": "zip",
        }
    )
)
spark.stop()
