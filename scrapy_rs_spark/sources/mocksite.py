"""Deterministic synthetic web: the reference mock server as a pages table.

Replicates /root/reference/benchmark/src/mock_server.rs byte-for-byte:
  * N pages at http://mocksite.test/{i}, i ∈ [0, N)
  * page i links to (i + k + 1) % N for k ∈ [0, links_per_page)
    (mock_server.rs:270-279)
  * exact HTML template of generate_page_html (mock_server.rs:253-290)
  * robots.txt: allow-all, or "Disallow: /5 /10 /15" in failure-sim mode
    (mock_server.rs:177-192)

Generation is fully JVM-side (spark.range + concat/transform/sequence) so
a 10^8-page web materializes without Python in the loop; the golden
``text`` column is produced by the pinned extractor UDF so the crawl's
re-extraction is byte-identical by construction.

The closed-form link graph gives closed-form BFS frontiers, used by the
end-to-end goldens (tests/test_crawl_e2e.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrapy_rs_spark.functions.text import extract_text_udf

BASE_URL = "http://mocksite.test"
# fixed deterministic warc_ts base: 2025-01-01T00:00:00Z
_WARC_EPOCH = 1735689600

_HTML_HEAD = """<!DOCTYPE html>
<html>
<head>
    <title>Mock Page {id}</title>
    <meta name="description" content="This is a mock page for benchmarking scrapy and scrapy-rs">
</head>
<body>
    <h1>Mock Page {id}</h1>
    <p>This is a generated page for benchmarking scrapy and scrapy-rs.</p>
    <p>Current page ID: {id}</p>
    <p>Total pages: {n}</p>
    <h2>Links</h2>
    <ul>
"""

_HTML_TAIL = """    </ul>
    <div class="content">
        <p>Lorem ipsum dolor sit amet, consectetur adipiscing elit. Sed do eiusmod tempor incididunt
        ut labore et dolore magna aliqua. Ut enim ad minim veniam, quis nostrud exercitation ullamco
        laboris nisi ut aliquip ex ea commodo consequat.</p>
    </div>
</body>
</html>"""


def expected_links(i: int, page_count: int, links_per_page: int) -> list[int]:
    """Closed-form link targets of page i (mock_server.rs:270-279)."""
    return [(i + k + 1) % page_count for k in range(links_per_page)]


def mock_site_pages(
    spark: SparkSession,
    page_count: int = 100,
    links_per_page: int = 10,
    partitions: int | None = None,
    golden_text: bool = True,
) -> DataFrame:
    """Pages table (url, warc_ts, html, text, lang, status, headers)."""
    sid = F.col("id").cast("string")

    def _lit_seg(fmt: str) -> list:
        head, *rest = fmt.split("{id}")
        out = [F.lit(head)]
        for seg in rest:
            out += [sid, F.lit(seg)]
        return out

    head_fmt = _HTML_HEAD.replace("{n}", str(page_count))
    link_item = lambda t: F.concat(  # noqa: E731
        F.lit('        <li><a href="/'),
        t,
        F.lit('">Link to Page '),
        t,
        F.lit("</a></li>\n"),
    )
    links_col = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(links_per_page - 1)),
            lambda k: link_item(
                F.pmod(F.col("id") + k + 1, F.lit(page_count)).cast("string")
            ),
        ),
        "",
    )
    html_str = F.concat(*_lit_seg(head_fmt), links_col, F.lit(_HTML_TAIL))

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, page_count // 50_000)
    df = (
        spark.range(0, page_count, 1, partitions)
        .withColumn("url", F.concat(F.lit(BASE_URL + "/"), sid))
        .withColumn(
            "warc_ts", F.timestamp_seconds(F.lit(_WARC_EPOCH) + F.col("id"))
        )
        .withColumn("html", html_str.cast("binary"))
        # golden text column (byte-identity oracle) is optional: crawls
        # never read it (fetch prunes to url/status/html/headers), so
        # benchmarks skip the generation-time extraction pass
        .withColumn(
            "text",
            extract_text_udf(F.col("html"))
            if golden_text
            else F.lit(None).cast("string"),
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("status", F.lit(200))
        .withColumn(
            "headers",
            F.create_map(F.lit("content-type"), F.lit("text/html")),
        )
        .drop("id")
    )
    return df


def mock_multihost_pages(
    spark: SparkSession,
    page_count: int = 100,
    n_hosts: int = 10,
    links_per_page: int = 10,
    partitions: int | None = None,
    golden_text: bool = True,
) -> DataFrame:
    """Multi-host variant of the mock web: page i lives at
    http://host{i % n_hosts}.test/{i} and links to (i+k+1) % N (same
    closed-form graph, so targets hop across hosts). Exercises
    per-domain scheduling fairness / politeness budgets / hot-host
    salting across many domains — the shape a Common-Crawl frontier
    actually has. Same byte-exact HTML body as mock_site_pages except
    links are absolute (cross-host hrefs must carry the host)."""
    sid = F.col("id").cast("string")

    def _lit_seg(fmt: str) -> list:
        head, *rest = fmt.split("{id}")
        out = [F.lit(head)]
        for seg in rest:
            out += [sid, F.lit(seg)]
        return out

    head_fmt = _HTML_HEAD.replace("{n}", str(page_count))
    target = lambda k: F.pmod(F.col("id") + k + 1, F.lit(page_count))  # noqa: E731
    url_of = lambda t: F.concat(  # noqa: E731
        F.lit("http://host"),
        F.pmod(t, F.lit(n_hosts)).cast("string"),
        F.lit(".test/"),
        t.cast("string"),
    )
    link_item = lambda t: F.concat(  # noqa: E731
        F.lit('        <li><a href="'),
        url_of(t),
        F.lit('">Link to Page '),
        t.cast("string"),
        F.lit("</a></li>\n"),
    )
    links_col = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(links_per_page - 1)),
            lambda k: link_item(target(k)),
        ),
        "",
    )
    html_str = F.concat(*_lit_seg(head_fmt), links_col, F.lit(_HTML_TAIL))
    if partitions is None:
        partitions = max(
            spark.sparkContext.defaultParallelism, page_count // 50_000
        )
    return (
        spark.range(0, page_count, 1, partitions)
        .withColumn("url", url_of(F.col("id")))
        .withColumn(
            "warc_ts", F.timestamp_seconds(F.lit(_WARC_EPOCH) + F.col("id"))
        )
        .withColumn("html", html_str.cast("binary"))
        .withColumn(
            "text",
            extract_text_udf(F.col("html"))
            if golden_text
            else F.lit(None).cast("string"),
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("status", F.lit(200))
        .withColumn(
            "headers",
            F.create_map(F.lit("content-type"), F.lit("text/html")),
        )
        .drop("id")
    )


def mock_site_robots(
    spark: SparkSession, failure_mode: bool = False
) -> DataFrame:
    """Per-host robots policy table (host, disallow_prefixes,
    crawl_delay_ms, max_concurrent).

    Mirrors the mock server's two robots modes (mock_server.rs:177-192).
    Prefix semantics are RFC 9309 path-prefix match: "/5" also blocks
    "/50" — documented, matches the mock server's Disallow lines.
    The reference crawler itself never enforces robots (flag only,
    /root/reference/engine/src/config/mod.rs:45-46); enforcement is our
    documented extension per the north rule."""
    prefixes = ["/5", "/10", "/15"] if failure_mode else []
    return spark.createDataFrame(
        [("mocksite.test", prefixes, 0, None)],
        "host STRING, disallow_prefixes ARRAY<STRING>, crawl_delay_ms BIGINT, max_concurrent INT",
    )
