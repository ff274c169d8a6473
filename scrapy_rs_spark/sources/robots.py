"""robots.txt → per-host policy table.

The reference carries only a respect_robots_txt flag
(/root/reference/engine/src/config/mod.rs:45-46, default true) and its
mock server serves a fixed robots body
(/root/reference/benchmark/src/mock_server.rs:177-192); no parser
exists there. A real crawl needs one, so this module parses fetched
robots.txt bodies into the ROBOTS_SCHEMA policy table that
operators/scheduler.robots_filter broadcast-joins (J3).

RFC 9309 subset (+ the de-facto Crawl-delay extension):
  * groups start at User-agent lines; consecutive User-agent lines
    share the following rules
  * the most specific matching group wins: exact product token match
    beats '*'; within the winning group all Disallow values apply
  * empty Disallow = allow all (dropped); comments (#) stripped
  * Allow prefixes are collected too — robots_filter applies the RFC's
    longest-match rule (ties → allow)
  * Crawl-delay: seconds → crawl_delay_ms

Parsing runs as an Arrow-batched pandas UDF over the (host, body)
rows — robots bodies are tiny and one per host, so this stage is
negligible next to the crawl itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def parse_robots_body(body: str | None, user_agent: str = "*") -> dict:
    """One robots.txt body → {disallow: [...], allow: [...],
    crawl_delay_ms}."""
    if body is None:
        return {"disallow": [], "allow": [], "crawl_delay_ms": None}
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    agents: list[str] = []
    rules: list[str] = []
    allows: list[str] = []
    delay: float | None = None
    in_rules = False

    def flush():
        nonlocal agents, rules, allows, delay, in_rules
        if agents:
            groups.append((agents, rules, allows, delay))
        agents, rules, allows, delay, in_rules = [], [], [], None, False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val:
                rules.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                delay = float(val)
            except ValueError:
                pass
        elif key == "allow":
            in_rules = True
            if val:
                allows.append(val)
        elif key == "sitemap":
            # recognized, not modeled. Per RFC 9309 §2.2.2 non-group
            # lines (sitemap, unknown keys) do NOT terminate a
            # user-agent line group — 'User-agent: a / Sitemap: ... /
            # User-agent: b / Disallow: /' is ONE group of two agents,
            # so sitemap must not flip in_rules
            pass
    flush()

    ua = user_agent.lower()
    exact = [g for g in groups if any(a != "*" and a in ua for a in g[0])]
    star = [g for g in groups if "*" in g[0]]
    chosen = exact if exact else star
    disallow: list[str] = []
    allow: list[str] = []
    ms: float | None = None
    for _, rls, alw, dly in chosen:
        disallow.extend(rls)
        allow.extend(alw)
        if dly is not None:
            ms = dly
    return {
        "disallow": disallow,
        "allow": allow,
        "crawl_delay_ms": None if ms is None else int(ms * 1000),
    }


def parse_robots(
    df: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) rows → ROBOTS_SCHEMA policy table."""
    ua = user_agent

    @pandas_udf(
        "disallow_prefixes ARRAY<STRING>, allow_prefixes ARRAY<STRING>,"
        " crawl_delay_ms BIGINT"
    )
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        parsed = bodies.map(
            lambda b: parse_robots_body(
                bytes(b).decode("utf-8", errors="replace")
                if isinstance(b, (bytes, bytearray))
                else b,
                ua,
            )
        )
        return pd.DataFrame(
            {
                "disallow_prefixes": parsed.map(lambda d: d["disallow"]),
                "allow_prefixes": parsed.map(lambda d: d["allow"]),
                "crawl_delay_ms": parsed.map(lambda d: d["crawl_delay_ms"]),
            }
        )

    return df.select(
        F.col(host_col).alias("host"), _parse(F.col(body_col)).alias("p")
    ).select(
        "host",
        F.col("p.disallow_prefixes").alias("disallow_prefixes"),
        F.col("p.allow_prefixes").alias("allow_prefixes"),
        F.col("p.crawl_delay_ms").alias("crawl_delay_ms"),
        F.lit(None).cast("int").alias("max_concurrent"),
    )


def robots_from_pages(
    pages: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """Pages-table rows whose path is /robots.txt → policy table.

    The scan prunes to (url, html) and the path predicate pushes down;
    at 100 TB the robots rows are a vanishing fraction and the result
    is small enough to broadcast into robots_filter."""
    robots_rows = pages.filter(
        F.col("url").endswith("/robots.txt")
    ).select(
        # lowercase: frontier host comes from lowercased url_canon — a
        # raw-cased pages url would yield a policy row that never joins
        # in robots_filter (silently disabling enforcement for the host)
        F.lower(F.expr("parse_url(url, 'HOST')")).alias("host"),
        F.col("html").alias("body"),
    )
    return parse_robots(robots_rows, user_agent)
