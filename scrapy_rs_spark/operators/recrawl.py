"""Freshness-driven re-crawl scheduling (beyond-reference: the
reference crawls a frontier to exhaustion and stops; a standing
Common-Crawl-style operation must decide WHEN to revisit every URL).

Classic change-rate estimation (Cho & Garcia-Molina, "Estimating
Frequency of Change", discretized to crawl rounds): from the store's
observation history — one row per (url, round, content_hash) taken
from each round's committed pages — estimate per-URL change rate as
changes-per-observation-gap, schedule the next visit after
ceil(gaps/changes) rounds (never-changed URLs back off to
``max_interval``), and flag what is due now.

Shape at 10^10 URLs: one lag-window + partial-agg per URL — the
window partition is a URL's OWN observation history (bounded by
revisit count, never corpus-scale, so no skew concern), the groupBy
rides the same url-hash shuffle, and every output column is integer
arithmetic (no floats in the contract, so results hash exactly
against the oracle). The due-set feeds seeds_frontier directly: a
standing crawl's round N+1 seed list is ``recrawl_schedule(history,
N).filter("due = 1")``."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    history: DataFrame,
    current_round: int,
    max_interval: int = 16,
    url_col: str = "url",
    round_col: str = "round",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(url, n_obs, n_changes, last_seen, age, revisit_interval,
    next_due, due) per URL in ``history``.

    * ``n_changes`` — consecutive-observation pairs whose hash differs
      (a NULL hash never counts as a change partner).
    * ``revisit_interval`` — ceil((n_obs−1)/n_changes) rounds between visits;
      URLs never seen to change use ``max_interval``. Both sides of
      the division are exact ints, the quotient an IEEE double, so
      the oracle's CEIL matches bit-for-bit.
    * ``due`` — 1 when ``next_due ≤ current_round`` (always for
      single-observation URLs with a change: interval 0 re-arms
      immediately; never-observed-to-change singletons wait).
    """
    w = Window.partitionBy(url_col).orderBy(round_col)
    obs = history.withColumn("__prev", F.lag(hash_col).over(w))
    changed = (
        F.col("__prev").isNotNull()
        & F.col(hash_col).isNotNull()
        & (F.col(hash_col) != F.col("__prev"))
    )
    per = obs.groupBy(url_col).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(changed.cast("long")).alias("n_changes"),
        F.max(round_col).cast("long").alias("last_seen"),
    )
    interval = (
        F.when(
            F.col("n_changes") > 0,
            F.ceil((F.col("n_obs") - 1) / F.col("n_changes")),
        )
        .otherwise(F.lit(int(max_interval)))
        .cast("long")
    )
    out = per.select(
        F.col(url_col),
        "n_obs",
        "n_changes",
        "last_seen",
        (F.lit(int(current_round)) - F.col("last_seen")).alias("age"),
        interval.alias("revisit_interval"),
        (F.col("last_seen") + interval).alias("next_due"),
    )
    return out.withColumn(
        "due",
        (F.col("next_due") <= F.lit(int(current_round)))
        .cast("int"),
    )


def host_backoff(
    attempts: DataFrame,
    current_round: int,
    threshold: int = 3,
    max_backoff: int = 16,
    host_col: str = "host",
    round_col: str = "round",
    ok_col: str = "ok",
) -> DataFrame:
    """Per-host circuit breaker over fetch-attempt history (host,
    round, ok∈{0,1}): a host that keeps failing stops burning its
    politeness budget on dead rounds (the Heritrix/Nutch "server
    gone" treatment the reference lacks — its error handler retries
    per-request only, core/src/error_handler.rs).

    Per host: ``trailing_failures`` counts failed rounds AFTER the
    last success (all rounds when none succeeded); ``tripped`` when
    that reaches ``threshold``; ``cooldown_until`` = last attempt +
    min(2^trailing, max_backoff) rounds — exponential backoff, integer
    arithmetic only. ``blocked`` says whether current_round is still
    inside the cooldown of a tripped host: feed
    ``filter("blocked = 1")`` hosts into the scheduler's domain
    blacklist (F4) for the next rounds.

    One partial aggregation per host (last-success max + conditional
    counts ride the same shuffle); host cardinality ≪ URL cardinality,
    so this is cheap at any corpus size."""
    per = attempts.groupBy(host_col).agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.max(
            F.when(F.col(ok_col) == 1, F.col(round_col))
        ).cast("long").alias("last_ok_round"),
        F.max(round_col).cast("long").alias("last_round"),
    )
    # trailing failures = failures with round > last success — computed
    # as a second conditional agg joined on the same host key (stays in
    # one shuffle under AQE since both aggs share the groupBy key)
    fails = (
        attempts.join(
            per.select(host_col, "last_ok_round"), host_col, "left"
        )
        .filter(
            (F.col(ok_col) == 0)
            & (
                F.col("last_ok_round").isNull()
                | (F.col(round_col) > F.col("last_ok_round"))
            )
        )
        .groupBy(host_col)
        .agg(F.count("*").cast("long").alias("trailing_failures"))
    )
    out = (
        per.join(fails, host_col, "left")
        .withColumn(
            "trailing_failures",
            F.coalesce(F.col("trailing_failures"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "tripped",
            (F.col("trailing_failures") >= F.lit(int(threshold)))
            .cast("int"),
        )
        .withColumn(
            "cooldown_until",
            F.when(
                F.col("tripped") == 1,
                F.col("last_round")
                + F.least(
                    F.lit(int(max_backoff)).cast("long"),
                    # shiftleft with a COLUMN bit count only resolves
                    # via SQL expr (the pyspark wrapper wants an int
                    # literal — same note as simhash's shiftright)
                    F.expr(
                        "shiftleft(cast(1 as bigint), "
                        "cast(least(trailing_failures, 30) as int))"
                    ),
                ),
            ).cast("long"),
        )
        .withColumn(
            "blocked",
            F.coalesce(
                (F.col("cooldown_until") > F.lit(int(current_round))),
                F.lit(False),
            ).cast("int"),
        )
    )
    return out.select(
        host_col,
        "n_attempts",
        "last_ok_round",
        "trailing_failures",
        "tripped",
        "cooldown_until",
        "blocked",
    )
