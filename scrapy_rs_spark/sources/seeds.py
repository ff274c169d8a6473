"""Seed source: start URLs → first frontier generation.

Mirrors Spider::start_requests (one GET per seed,
/root/reference/core/src/spider.rs:24-26) fed to the scheduler at
/root/reference/engine/src/lib.rs:333-415.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scrapy_rs_spark.functions.url import with_url_identity


def seeds_frontier(
    spark: SparkSession,
    seeds: list[str] | list[tuple] | DataFrame,
    default_priority: int = 0,
) -> DataFrame:
    """Build frontier generation 0 from a seed list.

    Accepts ["url", ...] or [(url, priority, depth), ...] or a DataFrame
    with at least a ``url`` column. discovery_seq is the seed-list
    position (deterministic FIFO arrival order, never wall clock)."""
    if isinstance(seeds, DataFrame):
        df = seeds
        if "priority" not in df.columns:
            df = df.withColumn("priority", F.lit(default_priority))
        if "depth" not in df.columns:
            df = df.withColumn("depth", F.lit(0))
        if "discovery_seq" not in df.columns:
            w = Window.orderBy("url")
            df = df.withColumn(
                "discovery_seq", F.row_number().over(w).cast("long") - 1
            )
    else:
        rows = []
        for i, s in enumerate(seeds):
            if isinstance(s, str):
                rows.append((s, default_priority, 0, i))
            else:
                url, prio, depth = (list(s) + [default_priority, 0])[:3]
                rows.append((url, int(prio), int(depth), i))
        df = spark.createDataFrame(
            rows, "url STRING, priority INT, depth INT, discovery_seq BIGINT"
        )
    df = with_url_identity(df, "url")
    return (
        df.withColumn("method", F.lit("GET"))
        .withColumn("priority", F.col("priority").cast("int"))
        .withColumn("depth", F.col("depth").cast("int"))
        .withColumn("discovery_round", F.lit(0))
        .withColumn("retry_count", F.lit(0))
        .withColumn("dont_filter", F.lit(False))
        .withColumn("retry_not_before_round", F.lit(0))
        .withColumn(
            "meta", F.lit(None).cast("map<string,string>")
        )
        .select(
            "url",
            "url_canon",
            "url_hash",
            "host",
            "method",
            "priority",
            "depth",
            "discovery_round",
            "discovery_seq",
            "retry_count",
            "dont_filter",
            "retry_not_before_round",
            "meta",
        )
    )
