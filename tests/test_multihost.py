"""Multi-host crawl semantics: per-domain politeness fairness and
domain-group scheduling across many hosts (W2/J4/T1 at engine level)."""

import pyspark.sql.functions as F

from scrapy_rs_spark.plans.engine import CrawlEngine
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.mocksite import mock_multihost_pages

N, HOSTS, LINKS = 60, 6, 5


def test_multihost_full_crawl(spark, tmp_path):
    pages = mock_multihost_pages(
        spark, N, HOSTS, LINKS, partitions=4
    ).localCheckpoint(True)
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="domain_group", crawl_strategy="priority"),
        store_path=str(tmp_path / "mh"),
    )
    stats = eng.run(["http://host0.test/0"])
    # (i+k+1)%N from 0 reaches every page eventually
    assert stats.requests == N
    assert stats.errors == 0
    hosts = {
        r.host
        for r in eng.items()
        .select(F.expr("parse_url(url, 'HOST')").alias("host"))
        .distinct()
        .collect()
    }
    assert len(hosts) == HOSTS


def test_multihost_politeness_is_per_host(spark, tmp_path):
    """crawl_delay gives each HOST an independent per-round budget —
    rounds fetch up to budget × n_hosts rows, never more per host."""
    pages = mock_multihost_pages(
        spark, N, HOSTS, LINKS, partitions=4
    ).localCheckpoint(True)
    eng = CrawlEngine(
        spark,
        pages,
        Settings(
            scheduler_type="domain_group",
            domain_delay_ms=5000,
            round_duration_ms=10_000,  # budget = 2 per host per round
        ),
        store_path=str(tmp_path / "pol"),
    )
    # seed one page on every host
    stats = eng.run([f"http://host{h}.test/{h}" for h in range(HOSTS)])
    assert stats.requests == N
    assert stats.errors == 0
    # per-round cap = 2 × 6 hosts; and per host ≤ 2 (checked via items/rnd)
    items = eng.items().withColumn(
        "host", F.expr("parse_url(url, 'HOST')")
    )
    per = items.groupBy("rnd", "host").count().collect()
    assert all(r["count"] <= 2 for r in per)
    per_round = items.groupBy("rnd").count().collect()
    assert all(r["count"] <= 2 * HOSTS for r in per_round)
