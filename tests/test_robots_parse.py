"""robots.txt parsing (RFC 9309 subset + Crawl-delay) → policy table →
J3 filter end-to-end. The reference carries only a flag; SURVEY J3
documents enforcement as our deviation."""

import pyspark.sql.functions as F

from scrapy_rs_spark.operators.scheduler import robots_filter
from scrapy_rs_spark.sources.robots import (
    parse_robots,
    parse_robots_body,
    robots_from_pages,
)

ROBOTS = """\
# comment line
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /admin/
Disallow: /tmp/
Crawl-delay: 2
Allow: /admin/public
Disallow:

User-agent: badbot
Disallow: /
"""


def test_parse_robots_body_star_group():
    out = parse_robots_body(ROBOTS, "crawlspark/0.1")
    assert out["disallow"] == ["/admin/", "/tmp/"]
    assert out["allow"] == ["/admin/public"]
    assert out["crawl_delay_ms"] == 2000


def test_parse_robots_body_specific_agent_wins():
    out = parse_robots_body(ROBOTS, "Mozilla/5.0 compatible; Googlebot/2.1")
    assert out["disallow"] == ["/google-only/"]
    assert out["crawl_delay_ms"] is None
    bad = parse_robots_body(ROBOTS, "badbot")
    assert bad["disallow"] == ["/"]


def test_parse_robots_body_edge_cases():
    assert parse_robots_body(None) == {
        "disallow": [], "allow": [], "crawl_delay_ms": None
    }
    assert parse_robots_body("")["disallow"] == []
    # consecutive User-agent lines share one rule group
    multi = "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
    assert parse_robots_body(multi, "anything")["disallow"] == ["/x/"]


def test_parse_robots_df_and_filter(spark):
    policies = parse_robots(
        spark.createDataFrame(
            [("h1.test", ROBOTS), ("h2.test", None)],
            "host STRING, body STRING",
        )
    )
    rows = {r.host: r for r in policies.collect()}
    assert rows["h1.test"].disallow_prefixes == ["/admin/", "/tmp/"]
    assert rows["h1.test"].crawl_delay_ms == 2000
    assert rows["h2.test"].disallow_prefixes == []

    frontier = spark.createDataFrame(
        [
            ("http://h1.test/admin/x", "h1.test"),
            ("http://h1.test/admin/public/page", "h1.test"),  # Allow wins
            ("http://h1.test/ok", "h1.test"),
            ("http://h2.test/admin/x", "h2.test"),
        ],
        "url STRING, host STRING",
    ).withColumn("url_canon", F.col("url"))
    kept = {r.url for r in robots_filter(frontier, policies).collect()}
    # RFC longest-match: /admin/public (13) beats /admin/ (7)
    assert kept == {
        "http://h1.test/admin/public/page",
        "http://h1.test/ok",
        "http://h2.test/admin/x",
    }


def test_robots_from_pages(spark):
    pages = spark.createDataFrame(
        [
            ("http://h1.test/robots.txt", bytearray(ROBOTS.encode())),
            ("http://h1.test/page", bytearray(b"<html>x</html>")),
        ],
        "url STRING, html BINARY",
    )
    rows = {r.host: r for r in robots_from_pages(pages).collect()}
    assert set(rows) == {"h1.test"}
    assert rows["h1.test"].disallow_prefixes == ["/admin/", "/tmp/"]


def test_engine_robots_auto(spark, tmp_path):
    """CrawlEngine(robots='auto'): policies parsed from the pages table
    gate the crawl — a disallowed link is never fetched."""
    from scrapy_rs_spark.plans.engine import CrawlEngine
    from scrapy_rs_spark.settings import Settings

    body = b'<html><body><a href="/admin/x">a</a><a href="/ok">o</a></body></html>'
    rows = [
        ("http://ra.test/robots.txt", 200, bytearray(b"User-agent: *\nDisallow: /admin/\n")),
        ("http://ra.test/start", 200, bytearray(body)),
        ("http://ra.test/admin/x", 200, bytearray(b"<html>secret</html>")),
        ("http://ra.test/ok", 200, bytearray(b"<html>fine</html>")),
    ]
    pages = spark.createDataFrame(
        rows, "url STRING, status INT, html BINARY"
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(scheduler_type="breadth_first", max_depth=2),
        robots="auto",
        store_path=str(tmp_path / "ra"),
    )
    eng.run(["http://ra.test/start"])
    fetched = {r.url for r in eng.items().select("url").collect()}
    assert "http://ra.test/ok" in fetched
    assert "http://ra.test/admin/x" not in fetched


def test_per_host_crawl_delay_budgets(spark, tmp_path):
    """Robots Crawl-delay drives PER-HOST round budgets (J6/T1): with
    round_duration 2000 ms, a 1000 ms Crawl-delay host serves 2 per
    round while an unconstrained host drains immediately."""
    from scrapy_rs_spark.plans.engine import CrawlEngine
    from scrapy_rs_spark.settings import Settings

    pages = spark.createDataFrame(
        [
            ("http://slow.test/robots.txt", 200,
             bytearray(b"User-agent: *\nCrawl-delay: 1\n")),
        ]
        + [
            (f"http://{h}.test/{i}", 200, bytearray(b"<html>p</html>"))
            for h in ("slow", "fast")
            for i in range(6)
        ],
        "url STRING, status INT, html BINARY",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(
            scheduler_type="domain_group",
            round_duration_ms=2000,
            max_depth=0,
        ),
        robots="auto",
        store_path=str(tmp_path / "hd"),
    )
    seeds = [f"http://{h}.test/{i}" for h in ("slow", "fast") for i in range(6)]
    stats = eng.run(seeds)
    per_round = {m["round"]: m["requests"] for m in stats.per_round}
    # round 1: fast drains all 6, slow serves 2; rounds 2-3: slow 2+2
    assert per_round[1] == 8
    assert per_round[2] == 2 and per_round[3] == 2
    assert stats.requests == 12


def test_sitemap_does_not_terminate_agent_group():
    """RFC 9309 §2.2.2: non-group lines (Sitemap, unknown keys) do not
    end a user-agent line group — agents a and b here share the
    Disallow (round-3 advice regression)."""
    body = (
        "User-agent: a\n"
        "Sitemap: http://x.test/sitemap.xml\n"
        "User-agent: b\n"
        "Disallow: /priv\n"
    )
    assert parse_robots_body(body, "a")["disallow"] == ["/priv"]
    assert parse_robots_body(body, "b")["disallow"] == ["/priv"]
    # a Disallow DOES start the rule section: the next User-agent opens
    # a new group
    body2 = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert parse_robots_body(body2, "a")["disallow"] == ["/x"]
    assert parse_robots_body(body2, "b")["disallow"] == ["/y"]


def test_robots_from_pages_lowercases_host(spark):
    """A pages row with an uppercase host must still produce a policy
    row that joins against the lowercased frontier host (round-3
    advice regression — mismatch silently disabled enforcement)."""
    from scrapy_rs_spark.sources.robots import robots_from_pages

    pages = spark.createDataFrame(
        [("http://UPPER.Test/robots.txt", 200,
          bytearray(b"User-agent: *\nDisallow: /admin\n"))],
        "url STRING, status INT, html BINARY",
    )
    rows = robots_from_pages(pages).collect()
    assert len(rows) == 1
    assert rows[0].host == "upper.test"
    assert rows[0].disallow_prefixes == ["/admin"]


def test_long_crawl_delay_gates_across_rounds(spark, tmp_path):
    """Crawl-delay LONGER than the round duration (round-3 advice):
    'Crawl-delay: 30' against a 10 s round must serve 1 request every
    ceil(30/10)=3 rounds — not 1 per round (3x too fast). Delay-gated
    rows stay queued (never retired) and consecutive serves are
    exactly period rounds apart."""
    from scrapy_rs_spark.plans.engine import CrawlEngine
    from scrapy_rs_spark.settings import Settings

    pages = spark.createDataFrame(
        [
            ("http://slow.test/robots.txt", 200,
             bytearray(b"User-agent: *\nCrawl-delay: 30\n")),
        ]
        + [
            (f"http://slow.test/{i}", 200, bytearray(b"<html>p</html>"))
            for i in range(4)
        ],
        "url STRING, status INT, html BINARY",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(
            scheduler_type="domain_group",
            round_duration_ms=10_000,
            max_depth=0,
        ),
        robots="auto",
        store_path=str(tmp_path / "longdelay"),
    )
    stats = eng.run([f"http://slow.test/{i}" for i in range(4)])
    assert stats.requests == 4  # nothing retired by the delay gate
    served_rounds = sorted(
        m["round"] for m in stats.per_round if m["requests"] > 0
    )
    # one request per serving round...
    assert all(
        m["requests"] == 1 for m in stats.per_round if m["requests"] > 0
    )
    # ...spaced exactly period=3 rounds apart → 30 s between fetches
    gaps = [b - a for a, b in zip(served_rounds, served_rounds[1:])]
    assert gaps == [3, 3, 3], served_rounds
