"""Middleware & pipeline chains — the reference's extension surface,
set-at-a-time.

Reference model (/root/reference/middleware/src/lib.rs): ordered
RequestMiddleware / ResponseMiddleware chains, priority-sorted
(Highest=1000 … Lowest=0, higher runs first, lib.rs:478-483); item
Pipelines with open/process/close lifecycle
(/root/reference/pipeline/src/lib.rs:14-32, chained :261-268).

Here a middleware is a named (priority, DataFrame → DataFrame)
transform; a chain sorts by priority DESC and composes. Everything is
declarative — Catalyst fuses the whole chain into one plan, so N
middlewares cost zero extra passes (vs the reference's N sequential
async hops per record).

Built-ins mirror the reference set:
  * DefaultHeadersMiddleware  (lib.rs:95-211: UA + default headers)
  * UrlFilterMiddleware       (lib.rs:213-299: allow/deny regex)
  * RateLimitMiddleware       (lib.rs:953-1047: N per window → per-round cap)
  * ConditionalMiddleware     (lib.rs:813-951: predicate-gated transform)
  * FilterPipeline            (pipeline/src/lib.rs:203-237)
  * JsonFilePipeline / CsvFilePipeline sinks (pipeline/src/lib.rs:104-200;
    CSV was design-doc only in the reference — design.md:43)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]

# reference priority constants (middleware/src/lib.rs:30-40)
HIGHEST, HIGH, NORMAL, LOW, LOWEST = 1000, 800, 500, 200, 0


@dataclass
class Middleware:
    name: str
    transform: Transform
    priority: int = NORMAL
    # optional close-lifecycle hook (reference: middleware/pipeline
    # close, pipeline/src/lib.rs:14-32) — called once at crawl exit,
    # bounded by Settings.close_timeout_ms (engine/src/lib.rs:1285-1420)
    close: Callable[[], None] | None = None


@dataclass
class MiddlewareChain:
    """Ordered transform composition (priority DESC, then insertion)."""

    middlewares: list[Middleware] = field(default_factory=list)

    def add(
        self,
        name: str,
        transform: Transform,
        priority: int = NORMAL,
        close: Callable[[], None] | None = None,
    ):
        self.middlewares.append(Middleware(name, transform, priority, close))
        return self

    def __call__(self, df: DataFrame) -> DataFrame:
        ordered = sorted(
            enumerate(self.middlewares),
            key=lambda t: (-t[1].priority, t[0]),
        )
        for _, mw in ordered:
            df = mw.transform(df)
        return df

    def close_hooks(self) -> list[tuple[str, Callable[[], None]]]:
        """(name, hook) pairs in chain order (priority DESC) — the
        engine runs each under the close timeout at crawl exit."""
        ordered = sorted(
            enumerate(self.middlewares),
            key=lambda t: (-t[1].priority, t[0]),
        )
        return [
            (mw.name, mw.close) for _, mw in ordered if mw.close is not None
        ]


# ---- built-in request middlewares ----

def default_headers(headers: dict[str, str], user_agent: str | None = None) -> Transform:
    """Inject default headers into the request meta map (reference adds
    them to every outgoing request)."""
    h = dict(headers)
    if user_agent:
        h["user-agent"] = user_agent

    def _t(df: DataFrame) -> DataFrame:
        kv = []
        for k, v in h.items():
            kv += [F.lit(k), F.lit(v)]
        new = F.create_map(*kv)
        if "headers" in df.columns:
            # request-set headers win over defaults (reference semantics:
            # default_headers only fills missing keys)
            merged = F.map_concat(
                F.map_filter(
                    new, lambda k, v: ~F.map_contains_key(F.coalesce(F.col("headers"), F.create_map()), k)
                ),
                F.coalesce(F.col("headers"), F.create_map().cast("map<string,string>")),
            )
            return df.withColumn("headers", merged)
        return df.withColumn("headers", new)

    return _t


def url_filter(allow: str | None = None, deny: str | None = None) -> Transform:
    """F5: regex allow/deny on the URL (denied rows dropped — the
    reference rejects them into the error manager)."""

    def _t(df: DataFrame) -> DataFrame:
        out = df
        if deny:
            out = out.filter(~F.col("url").rlike(deny))
        if allow:
            out = out.filter(F.col("url").rlike(allow))
        return out

    return _t


def rate_limit(max_per_round: int, order: list[Column] | None = None) -> Transform:
    """T3: sliding-window rate limit, discretized to a per-round cap
    (N per T secs → N·round/T rows per round); deterministic order."""

    def _t(df: DataFrame) -> DataFrame:
        ob = order or [F.col("url").asc()]
        return df.orderBy(*ob).limit(max_per_round)

    return _t


def conditional(predicate: Column, transform: Transform) -> Transform:
    """F9: apply `transform` only to rows matching predicate; others
    pass through untouched. Branch-as-union (both sides stay in one
    Catalyst plan)."""

    def _t(df: DataFrame) -> DataFrame:
        hit = transform(df.filter(predicate))
        miss = df.filter(~F.coalesce(predicate, F.lit(False)))
        return hit.unionByName(miss, allowMissingColumns=True)

    return _t


def random_delay(max_delay_ms: int, seed: int = 0) -> Transform:
    """RandomDelayMiddleware analogue (middleware/src/lib.rs:166-211:
    per-request random delay in [0, max_delay_ms)). A set-at-a-time
    engine has no per-request sleep — pacing is governed by the
    politeness budget (T1) — so the set-oriented equivalent is a
    DETERMINISTIC salted jitter column: delay_ms = xxhash64(identity,
    seed) % max. No RNG state → stable under task retry; use it to
    randomize dispatch order (e.g. as rate_limit's order) or as a meta
    signal for downstream sinks."""

    def _t(df: DataFrame) -> DataFrame:
        jitter = F.pmod(
            F.xxhash64(F.col("url_hash"), F.lit(seed)), F.lit(max_delay_ms)
        )
        entry = F.create_map(F.lit("delay_ms"), jitter.cast("string"))
        merged = F.when(
            F.col("meta").isNull(), entry
        ).otherwise(F.map_concat(F.col("meta"), entry))
        return df.withColumn("meta", merged)

    return _t


# ---- item pipelines / sinks ----

def log_pipeline(
    level: str = "info",
    spider_name: str = "spider",
    executor_side: bool = True,
    max_rows: int | None = None,
    logger_name: str = "scrapy_rs_spark.items",
) -> Transform:
    """S8: per-item LogPipeline (pipeline/src/lib.rs:62-101 — logs
    ``Spider '<name>' scraped item: <item>`` per processed item at the
    configured level; LogPipeline::info()/debug() == level kwarg).

    Two placements:

    * executor_side=True (default, the scale-right one): an Arrow
      mapInPandas pass-through that logs each item from the task that
      produces it, INSIDE the items-write job — zero extra Spark jobs,
      items never cross to the driver, and the log lines land in
      executor logs exactly where a 1000-executor cluster wants
      per-record diagnostics. ``max_rows`` caps lines PER TASK (a
      global cap would need cross-task coordination).
    * executor_side=False: exact reference behavior — the reference is
      a single process, so its LogPipeline logs on the driver.
      Restated as a toLocalIterator() stream (partition-at-a-time, the
      driver never holds the whole item set) logging to the driver's
      ``logging`` tree, with a ``max_rows`` global cap. This costs one
      extra job and a driver-side scan — the documented 10^10
      anti-pattern (SURVEY §2.9); use it for debugging small crawls,
      per-round aggregates (A1-A4) for production telemetry.

      CAUTION — eager execution: this variant runs its job the moment
      the pipeline chain is INVOKED (during the engine's round-plan
      construction, before the items write), re-executing the parse
      lineage once, and it logs items even if the round later fails to
      commit. Deferring to post-commit would need an engine-level
      write hook; the executor_side=True default has neither problem.
    """
    import logging

    lvl = logging.getLevelName(level.upper())
    if not isinstance(lvl, int):
        raise ValueError(f"unknown log level: {level!r}")

    def _t(df: DataFrame) -> DataFrame:
        if executor_side:
            schema = df.schema

            def _log_batches(batches):
                import logging as _logging

                logger = _logging.getLogger(logger_name)
                n = 0
                for pdf in batches:
                    if max_rows is None or n < max_rows:
                        for rec in pdf.to_dict("records"):
                            if max_rows is not None and n >= max_rows:
                                logger.log(
                                    lvl,
                                    "Spider '%s': item logs past"
                                    " max_rows=%d suppressed (this task)",
                                    spider_name,
                                    max_rows,
                                )
                                break
                            logger.log(
                                lvl,
                                "Spider '%s' scraped item: %r",
                                spider_name,
                                rec,
                            )
                            n += 1
                    yield pdf

            return df.mapInPandas(_log_batches, schema=schema)
        logger = logging.getLogger(logger_name)
        n = 0
        for row in df.toLocalIterator():
            if max_rows is not None and n >= max_rows:
                logger.log(
                    lvl,
                    "Spider '%s': item logs past max_rows=%d suppressed",
                    spider_name,
                    max_rows,
                )
                break
            logger.log(
                lvl,
                "Spider '%s' scraped item: %r",
                spider_name,
                row.asDict(recursive=True),
            )
            n += 1
        return df

    return _t


def filter_pipeline(predicate: Column) -> Transform:
    """F8: drop items failing the predicate."""
    return lambda df: df.filter(predicate)


def json_file_pipeline(path: str, mode: str = "overwrite") -> Transform:
    """S6: JSON sink (distributed json-lines; the reference writes one
    growing JSON array per process — per-row appends don't scale)."""

    def _t(df: DataFrame) -> DataFrame:
        df.write.mode(mode).json(path)
        return df

    return _t


def csv_file_pipeline(path: str, mode: str = "overwrite") -> Transform:
    """S7 (design.md:43 — unimplemented in the reference; trivial here).
    Map/array columns are dropped (CSV can't carry them)."""

    def _t(df: DataFrame) -> DataFrame:
        flat = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() not in ("map", "array", "struct")
        ]
        df.select(*flat).write.mode(mode).option("header", True).csv(path)
        return df

    return _t
