"""CrawlEngine: the set-at-a-time restatement of Engine::run().

Reference loop (/root/reference/engine/src/lib.rs:260-1140): seed →
while scheduler non-empty: pop (priority order) → request middleware →
download → response middleware → retry check → parse → enqueue new
requests → pipeline items. One crawl ROUND here is one Spark DAG:

  frontier ──rank (W1/W2, politeness budgets)──► batch
     batch ──equi-join pages (fetch)──► fetched
   fetched ──status routing──► success / redirect / retry / error
   success ──parse pandas UDF──► items + exploded links
     links ──canonicalize──► candidates ──enqueue filters──►
           ──in-batch dedup──► ──anti-join seen──► new frontier rows
  commit(frontier', seen_delta, items, metrics) → next round

The driver loop repeats until the frontier drains (scheduler empty,
lib.rs:519) or page_limit is reached. Every round is an atomic commit
(CrawlStore) → pause/resume at any round boundary (reference
save_state/load_state, lib.rs:1196-1252).

Determinism: all ordering/identity columns derive from (priority,
depth, discovery_round, discovery_seq, url) — no wall clock, no rand —
so Spark task retries and re-runs produce identical crawls.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrapy_rs_spark.functions.text import (
    extract_links_udf,
    extract_text_udf,
    parse_page_enc_udf,
)
from scrapy_rs_spark.functions.url import urljoin_udf, url_hash_expr
from scrapy_rs_spark.operators.dedup import anti_join_seen, dedup_in_batch
from scrapy_rs_spark.operators.fetch import (
    build_retries,
    fetch_join,
    split_fetched,
)
from scrapy_rs_spark.operators.scheduler import (
    apply_enqueue_filters,
    frontier_order,
    per_host_topk,
    robots_filter,
    take_batch,
)
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.seeds import seeds_frontier
from scrapy_rs_spark.sources.store import CrawlStore

FRONTIER_COLS = [
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
    "body",
    "cookies",
    "timeout_ms",
    "encoding",
    "flags",
    "proxy",
]

# effectively-unlimited per-host budget when no politeness delay is set
_UNLIMITED = 1 << 31


@dataclass
class CrawlStats:
    """EngineStats analogue (/root/reference/engine/src/stats/mod.rs:8-28)."""

    requests: int = 0
    responses: int = 0
    items: int = 0
    errors: int = 0
    retries: int = 0
    rounds: int = 0
    new_urls: int = 0
    # wall-clock of the run()/resume() call that produced this object
    # (stats/mod.rs:30-39 start/end times). Observational only — it
    # never feeds dataflow identity/order, and it is NOT persisted
    # (committed state stays wall-clock-free for deterministic resume).
    duration_s: float = 0.0
    per_round: list[dict] = field(default_factory=list)

    def record(self, m: dict) -> None:
        self.per_round.append(m)
        self.rounds = max(self.rounds, m["round"])
        self.requests += m["requests"]
        self.responses += m["responses"]
        self.items += m["items"]
        self.errors += m["errors"]
        self.retries += m["retries"]
        self.new_urls += m["new_urls"]

    def duration(self) -> float:
        """stats/mod.rs:41-44 analogue (seconds)."""
        return self.duration_s

    def requests_per_second(self) -> float | None:
        """stats/mod.rs:46-50: request_count / duration; None before a
        run or for a zero-length one, like the reference's Option."""
        if self.duration_s <= 0:
            return None
        return self.requests / self.duration_s


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        settings: Settings | None = None,
        robots: DataFrame | None = None,
        store_path: str | None = None,
        parse_text_udf=None,
        parse_links_udf=None,
        parse_fields_udf=None,
        request_middlewares=None,
        response_middlewares=None,
        item_pipelines=None,
        signals=None,
        spider_close_hook=None,
    ):
        self.spark = spark
        self.pages = pages
        self.settings = settings or Settings()
        # robots: a ROBOTS_SCHEMA DataFrame, or "auto" to parse
        # /robots.txt rows out of the pages table (sources/robots.py) —
        # opt-in because it adds a pages scan at construction; the
        # resulting policy table is broadcast into every round's filter
        if isinstance(robots, str) and robots == "auto":
            from scrapy_rs_spark.sources.robots import robots_from_pages

            robots = robots_from_pages(
                pages, self.settings.user_agent
            ).localCheckpoint(eager=True)
        self.robots = robots
        # X1: user parse hooks (Arrow pandas UDFs); defaults = pinned
        # extractors. X2-X4: ordered transform chains
        # (operators/middleware.MiddlewareChain or any DataFrame→DataFrame)
        self._default_parse = (
            parse_text_udf is None
            and parse_links_udf is None
            and parse_fields_udf is None
        )
        self.parse_text_udf = parse_text_udf or extract_text_udf
        self.parse_links_udf = parse_links_udf or extract_links_udf
        # DynamicItem parity (core/src/item.rs:28-36): arbitrary
        # spider-extracted fields ride in items.fields MAP<STRING,STRING>
        self.parse_fields_udf = parse_fields_udf
        self.request_middlewares = request_middlewares
        self.response_middlewares = response_middlewares
        self.item_pipelines = item_pipelines
        self.signals = signals  # plans.signals.SignalManager (X6)
        # close lifecycle (engine/src/lib.rs:1285-1420): spider close +
        # chain close hooks run at crawl exit, EACH bounded by
        # settings.close_timeout_ms so a hanging hook cannot hang exit
        self.spider_close_hook = spider_close_hook
        self.close_errors: list[dict] = []
        self.store = CrawlStore(
            spark,
            store_path or tempfile.mkdtemp(prefix="crawlstore_"),
            seen_buckets=self.settings.seen_buckets,
            bucketed_seen=self.settings.bucketed_seen,
        )
        # cooperative pause/stop gates, checked at round boundaries —
        # the set-model restatement of the reference's Notify gates
        # (engine/src/lib.rs:1153-1193): pause() blocks the crawl loop
        # BETWEEN rounds (state is already committed there), unpause()
        # releases it, stop() ends the loop gracefully at the boundary
        import threading

        self._pause_requested = False
        self._stop_requested = False
        self._resume_event = threading.Event()
        # incrementally-extended seen DataFrame: store.load_seen()
        # re-lists EVERY delta directory (partition discovery included)
        # on each call — measured ~1.5 s/round of pure driver time on a
        # politeness crawl. The cache unions only NEW rounds' deltas
        # onto the existing DataFrame (whose file indexes Spark already
        # holds) and rebuilds after compaction prunes cached paths.
        self._seen_df_cache: DataFrame | None = None
        self._seen_cache_rounds: set[int] = set()
        # running seen-set size (cumulative seen-delta rows) for the
        # METRICS_SCHEMA seen_size field; re-derived from committed
        # metrics at resume()
        self._seen_total: int = 0
        self._seen_cache_gen: int = -1
        # T4: driver-side resource controller (engine/src/lib.rs:155-157
        # creates one iff config.enable_resource_monitoring) — sampled
        # and throttle-checked at round boundaries, where the loop can
        # safely block (state is committed there)
        self.resource_controller = None
        if self.settings.enable_resource_monitoring:
            from scrapy_rs_spark.plans.resource_control import (
                ResourceController,
                ResourceLimits,
            )

            self.resource_controller = ResourceController(
                ResourceLimits(
                    max_memory=self.settings.max_memory_bytes,
                    max_cpu=self.settings.max_cpu_pct,
                    max_pending_requests=self.settings.max_pending_requests,
                    throttle_factor=self.settings.throttle_factor,
                    monitor_interval_ms=self.settings.monitor_interval_ms,
                ),
                spark_context=spark.sparkContext,
            )
        self.bloom = None
        if self.settings.use_bloom_sidecar:
            from scrapy_rs_spark.sources.bloom import BloomSidecar

            self.bloom = BloomSidecar(
                os.path.join(self.store.root, "bloom"),
                n_buckets=self.settings.seen_buckets,
                bits_per_bucket=self.settings.bloom_bits_per_bucket,
            )

    # ---- per-host budget for a round (politeness T1 + per-domain cap F6) ----
    @property
    def _has_host_delays(self) -> bool:
        """True when the robots policy table carries per-host
        Crawl-delay values (J6: host→politeness lookup). Cached; costs
        one tiny job on the (small, broadcastable) policy table."""
        if not hasattr(self, "_host_delays_flag"):
            flag = False
            if (
                self.robots is not None
                and self.settings.respect_robots_txt
                and "crawl_delay_ms" in self.robots.columns
            ):
                flag = not self.robots.filter(
                    F.col("crawl_delay_ms").isNotNull()
                    & (F.col("crawl_delay_ms") > 0)
                ).isEmpty()
            self._host_delays_flag = flag
        return self._host_delays_flag

    @property
    def _has_long_delays(self) -> bool:
        """True when ANY effective delay can exceed round_duration_ms —
        only then does the budget need the cross-round phase machinery
        (ceil/pmod/xxhash64 per row). Short-delay crawls take the cheap
        round/delay budget expression. Cached; at most one tiny agg on
        the broadcastable robots policy table."""
        if not hasattr(self, "_long_delays_flag"):
            s = self.settings
            if max(s.domain_delay_ms, s.download_delay_ms) > s.round_duration_ms:
                self._long_delays_flag = True
            elif not self._has_host_delays:
                self._long_delays_flag = False
            else:
                self._long_delays_flag = not self.robots.filter(
                    F.col("crawl_delay_ms") > F.lit(s.round_duration_ms)
                ).isEmpty()
        return self._long_delays_flag

    def _load_seen(self) -> DataFrame:
        """The committed seen set, via the incremental cache (see
        __init__). Semantically identical to store.load_seen(); costs
        one directory listing for the newest delta instead of one per
        committed delta per round."""
        if self.store.bucketed_seen:
            # the bucketed table is ONE catalog-backed scan — no
            # per-round delta dirs to union, so the incremental cache
            # has nothing to save; the scan's bucketed partitioning is
            # what makes the anti-join exchange-free on this side
            return self.store.load_seen()
        valid = self.store.seen_delta_rounds()
        gen = self.store.seen_generation()
        if (
            self._seen_df_cache is None
            or not (self._seen_cache_rounds <= valid)
            or gen != self._seen_cache_gen
        ):
            # first use, compaction removed a cached delta dir, or the
            # generation moved (compact_seen rewrites the NEWEST delta
            # dir IN PLACE — invisible to the round-set key; an external
            # store.compact_seen() between runs would otherwise leave the
            # cache pointing at deleted parquet) — rebuild from scratch
            # (one full listing, ≤16 deltas + base)
            self._seen_df_cache = self.store.load_seen()
            self._seen_cache_rounds = valid
            self._seen_cache_gen = gen
            return self._seen_df_cache
        for r in sorted(valid - self._seen_cache_rounds):
            delta = self.store.load_seen_delta(r)
            if delta is not None:
                self._seen_df_cache = self._seen_df_cache.unionByName(delta)
            self._seen_cache_rounds.add(r)
        return self._seen_df_cache

    def _cap_left_col(self):
        """Remaining lifetime per-domain budget (F6). Unlike the delay
        budget this is the ONLY condition that may RETIRE frontier rows
        — a delay-gated host's rows must stay queued for a later round."""
        s = self.settings
        if s.max_requests_per_domain is None:
            return F.lit(_UNLIMITED)
        return F.lit(s.max_requests_per_domain) - F.coalesce(
            F.col("__served"), F.lit(0)
        )

    def _host_budget_col(self, served: DataFrame | None, rnd: int = 0):
        """Per-row round budget under the effective delay = the LARGER
        of the host's robots Crawl-delay (__host_delay, joined by
        _with_budget_inputs) and the global configured delay — the
        conservative reading a polite crawler takes.

        * delay ≤ round_duration: round_duration / delay requests this
          round (the per-round discretization, T1).
        * delay > round_duration (e.g. Crawl-delay: 30 vs a 10 s
          round): ONE request every ceil(delay/round_duration) rounds,
          phase-staggered by host hash so long-delay hosts don't all
          serve in the same round. Flooring at 1/round here would serve
          3× faster than the host requested.
        The per-domain lifetime cap further bounds it."""
        s = self.settings
        delay = max(s.domain_delay_ms, s.download_delay_ms)
        eff_delay = F.greatest(
            F.coalesce(F.col("__host_delay"), F.lit(0)).cast("bigint"),
            F.lit(delay).cast("bigint"),
        )
        round_ms = F.lit(s.round_duration_ms).cast("bigint")
        short_budget = F.when(eff_delay <= 0, F.lit(_UNLIMITED)).otherwise(
            F.greatest(F.lit(1), (round_ms / eff_delay).cast("int"))
        )
        if self._has_long_delays:
            period = F.ceil(eff_delay / round_ms).cast("int")
            on_phase = F.pmod(F.lit(rnd), period) == F.pmod(
                F.xxhash64(F.col("host")), period
            )
            # eff_delay ≤ 0 falls into the ≤ round_ms branch → UNLIMITED
            budget = F.when(eff_delay <= round_ms, short_budget).otherwise(
                F.when(on_phase, F.lit(1)).otherwise(F.lit(0))
            )
        else:
            # no host's effective delay exceeds the round → the phase
            # branch is unreachable; skip the per-row ceil/pmod/xxhash64
            # entirely (the r3→r4 crawl_polite recovery)
            budget = short_budget
        if s.max_requests_per_domain is not None:
            budget = F.least(budget, self._cap_left_col())
        return budget

    def _with_budget_inputs(
        self, df: DataFrame, served: DataFrame | None
    ) -> DataFrame:
        """Attach the columns _host_budget_col reads: __served (lifetime
        per-host counts when a cap is set) and __host_delay (robots
        Crawl-delay per host when present) — both via broadcast joins of
        small tables."""
        if served is None or self.settings.max_requests_per_domain is None:
            df = df.withColumn("__served", F.lit(0))
        else:
            s = served.select(
                F.col("host").alias("__s_host"),
                F.col("served").alias("__served"),
            )
            df = df.join(
                F.broadcast(s), df["host"] == s["__s_host"], "left"
            ).drop("__s_host")
        if self._has_host_delays:
            hd = self.robots.filter(
                F.col("crawl_delay_ms").isNotNull()
            ).select(
                F.col("host").alias("__d_host"),
                F.col("crawl_delay_ms").alias("__host_delay"),
            )
            df = df.join(
                F.broadcast(hd), df["host"] == hd["__d_host"], "left"
            ).drop("__d_host")
        else:
            df = df.withColumn("__host_delay", F.lit(None).cast("bigint"))
        return df

    # ---- round-local cache hygiene ----
    def _persisted_rdd_ids(self) -> set[int]:
        try:
            jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        except Exception:
            return set()

    def _release_round_rdds(self, before: set[int]) -> None:
        """Drop localCheckpoint blocks created during a round once the
        round is committed. Every round checkpoints its batch/fetched/
        parsed/candidates frames (html + text payloads — hundreds of MB
        per large round); the next round re-reads state from the store,
        so these blocks are dead weight that otherwise accumulates for
        the whole crawl (guide §5: unpersist when done — measured as
        round-over-round slowdown and GC pressure on the 200k crawl,
        and the dominant memory load of the 4M sustained crawl)."""
        try:
            jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
            for k in jmap.keySet().toArray():
                if int(k) not in before:
                    rdd = jmap.get(k)
                    if rdd is not None:
                        rdd.unpersist(False)
        except Exception:
            pass  # cache hygiene only — never fail a committed round

    # ---- one round ----
    def _run_round(
        self,
        rnd: int,
        frontier: DataFrame,
        served: DataFrame | None,
        pages_served_total: int,
        frontier_hint: int = 1 << 62,
    ) -> dict:
        import time as _time

        _prof = os.environ.get("SPARK_GRAFT_PROFILE") == "1"
        _t0 = _time.time()
        _marks = []
        _rdds_before = self._persisted_rdd_ids()

        def _mark(label):
            if _prof:
                _marks.append((label, round(_time.time() - _t0, 2)))

        s = self.settings
        order = frontier_order(s.scheduler_type, s.crawl_strategy)

        gated = frontier.filter(F.col("retry_not_before_round") > rnd)
        ready = frontier.filter(F.col("retry_not_before_round") <= rnd)

        if self.robots is not None and s.respect_robots_txt:
            allowed = robots_filter(ready, self.robots)
        else:
            allowed = ready

        # per-host budget rank (politeness + per-domain cap); hosts that
        # exhausted their LIFETIME cap get cap_left<=0 → rows retired
        # (counted; the reference would skip them at dequeue forever,
        # domain_group_scheduler.rs:234-238 — documented deviation:
        # we retire them so the crawl terminates). Hosts whose round
        # budget is 0 only because of delay phase-gating stay queued.
        # page_limit is the only global cap; concurrent_requests is a
        # throughput knob in the reference (not a semantic boundary), so
        # a round fetches every politeness-eligible row.
        batch_cap = None
        if s.page_limit is not None:
            batch_cap = max(0, s.page_limit - pages_served_total)

        delay = max(s.domain_delay_ms, s.download_delay_ms)
        unlimited = (
            delay <= 0
            and s.max_requests_per_domain is None
            and not self._has_host_delays
        )
        batch = None
        leftover = None
        if unlimited:
            # fast path: no politeness, no cap → no per-host ranking at
            # all (saves two Window shuffles per round)
            ranked = allowed
            if batch_cap is None and self.request_middlewares is None:
                # the batch takes EVERY eligible row (no cap, no budget,
                # no middleware that could drop rows) → nothing defers
                # to the next round; robots-blocked rows are retired by
                # construction. Skip the frontier-sized anti-join that
                # would only prove leftover is empty.
                leftover = ready.limit(0).select(*FRONTIER_COLS)
        else:
            allowed = self._with_budget_inputs(allowed, served)
            budget = self._host_budget_col(served, rnd)
            # single-window budget path: on a frontier small enough that
            # per-host skew is bounded by the threshold itself, rank once
            # per host with the budget as a column and split batch /
            # leftover from ONE checkpointed rank — saves the salted
            # second window AND the leftover anti-join per round
            single = (
                frontier_hint <= s.salt_min_frontier or s.host_salts <= 1
            ) and self.request_middlewares is None and batch_cap is None
            if single:
                from pyspark.sql.window import Window

                w = Window.partitionBy("host").orderBy(*order)
                # lazy checkpoint: materialized by the round's FIRST
                # action (the counter agg reads batch → ranked_all), so
                # rank+cache+count land in one Spark job, not two
                ranked_all = (
                    allowed.withColumn("__budget", budget)
                    .withColumn("host_rank", F.row_number().over(w))
                    .localCheckpoint(eager=False)
                )
                batch = (
                    ranked_all.filter(F.col("host_rank") <= F.col("__budget"))
                    .select(*FRONTIER_COLS)
                    .withColumn("batch_rank", F.lit(None).cast("int"))
                )
                # over-budget rows stay queued — INCLUDING delay-gated
                # hosts whose round budget is 0 (they serve in a later
                # round); only lifetime-cap-exhausted hosts are retired;
                # robots-blocked rows never entered ranked_all → retired
                leftover = ranked_all.filter(
                    (F.col("host_rank") > F.col("__budget"))
                    & (self._cap_left_col() > 0)
                ).select(*FRONTIER_COLS)
            else:
                ranked = per_host_topk(
                    allowed.withColumn("__budget", budget),
                    F.col("__budget"),
                    order,
                    salts=s.host_salts,
                )

        if batch is None:
            batch = take_batch(ranked, order, batch_cap).select(
                *FRONTIER_COLS, "batch_rank"
            )
            if self.request_middlewares is not None:
                batch = self.request_middlewares(batch)  # X2
            # lazy: the counter agg below is the materializing action;
            # every later consumer reads the cached partitions
            batch = batch.localCheckpoint(eager=False)  # reused 5× below
        _mark("rank+batch")

        if leftover is None:
            # rows that were politeness-deferred or over page_limit stay
            # queued
            leftover = ready.join(
                batch.select("url_hash"), "url_hash", "left_anti"
            ).select(*FRONTIER_COLS)
            if self.robots is not None and s.respect_robots_txt:
                # robots-blocked rows are retired from the frontier (they
                # can never become fetchable), else they would loop forever
                leftover = robots_filter(leftover, self.robots)

            # capped-out hosts: cap_left<=0 rows must also be retired
            # from leftover (delay gating never retires — cap only)
            if s.max_requests_per_domain is not None:
                leftover = self._with_budget_inputs(leftover, served)
                leftover = leftover.filter(
                    self._cap_left_col() > 0
                ).drop("__served", "__host_delay")

        # ---- fetch (J2) + route ----
        # strict mode (T1 fidelity, slot.rs:127-137): pace ONLY the frame
        # feeding the fetch join — the fetched checkpoint below
        # materializes it exactly once, so the sleeps run once per round
        # and every other consumer of `batch` (leftover anti-join,
        # counters) reads the unpaced rows. Row membership is identical.
        fetch_src = batch
        if s.strict_delay and (
            max(s.domain_delay_ms, s.download_delay_ms) > 0
            or self._has_host_delays
        ):
            from scrapy_rs_spark.operators.fetch import strict_spacing

            fetch_src = strict_spacing(
                batch,
                default_delay_ms=max(s.domain_delay_ms, s.download_delay_ms),
                host_delays=self.robots if self._has_host_delays else None,
            )
        # broadcast-batch fetch when the committed frontier size (an
        # upper bound on this batch) fits the broadcast gate: the pages
        # side — whose html payload dominates — is then scanned in
        # place instead of sort-merge-shuffled every round. Strict
        # pacing keeps the join shape that streams the paced rows.
        fetched = fetch_join(
            fetch_src,
            self.pages,
            default_timeout_ms=s.request_timeout_ms,
            broadcast_batch=(
                frontier_hint <= s.fetch_broadcast_max_batch
                and not s.strict_delay
            ),
        )
        if self.response_middlewares is not None:
            fetched = self.response_middlewares(fetched)  # X3
        # lazy: the counter agg right below materializes the fetch join
        # and computes all five route counters in ONE job
        fetched = fetched.localCheckpoint(eager=False)
        routes = split_fetched(fetched)
        # ONE aggregation for all route counters (5 counts = 1 job, not 5
        # — per-round driver actions are the fixed cost of a round)
        from scrapy_rs_spark.operators.fetch import (
            is_redirect,
            is_retryable,
            is_success,
        )

        st = F.col("status")
        crow = fetched.agg(
            F.count("*").alias("n"),
            F.sum(is_success(st).cast("long")).alias("ok"),
            F.sum(is_redirect(st).cast("long")).alias("red"),
            F.sum(is_retryable(st).cast("long")).alias("rty"),
            F.sum(
                (
                    ~is_success(st) & ~is_redirect(st) & ~is_retryable(st)
                ).cast("long")
            ).alias("err"),
        ).collect()[0]
        n_batch = crow["n"] or 0
        n_success = crow["ok"] or 0
        n_redirect = crow["red"] or 0
        n_retry_in = crow["rty"] or 0
        n_error = crow["err"] or 0
        _mark("fetch+route")

        # ---- parse (X1): items + links, one pandas-UDF pass ----
        # AQE coalesces a sort-merge fetch-join's output by SIZE (html
        # bytes), which can serialize the Python parse stage onto 1-2
        # tasks; the parse cost is per-row CPU, so spread it across all
        # cores explicitly — but ONLY when the join actually collapsed
        # the partitioning: the broadcast-batch join preserves the
        # pages scan's partitioning, and repartitioning there would
        # shuffle every html byte once for nothing (guide §2.4)
        success = routes["success"]
        try:
            fetched_parts = fetched.rdd.getNumPartitions()
        except Exception:
            fetched_parts = 0
        if fetched_parts < self.spark.sparkContext.defaultParallelism:
            success = success.repartition(
                self.spark.sparkContext.defaultParallelism
            )
        # optional transport metadata (response.rs:35-45) projected by
        # fetch_join when the pages table carries it — surfaced to item
        # pipelines through the items.fields map (response middlewares
        # already see the raw columns on the fetched frame)
        transport = [
            c
            for c in ("certificate", "ip_address", "protocol")
            if c in fetched.columns
        ]
        if transport:
            transport_fields = F.map_filter(
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in transport]),
                    F.array(*[F.col(c).cast("string") for c in transport]),
                ),
                lambda _, v: v.isNotNull(),
            )
        else:
            transport_fields = F.lit(None).cast("map<string,string>")
        if self._default_parse:
            # single-pass parse: text+links in ONE UDF over each page,
            # materialized once (html dropped immediately after) — both
            # the items write and the link expansion read the result
            parsed = success.select(
                "url",
                "url_canon",
                "depth",
                "cookies",
                transport_fields.alias("__tf"),
                # per-request decode override (request.rs:74-90):
                # encoding NULL → strict UTF-8, like the reference
                parse_page_enc_udf(F.col("html"), F.col("encoding")).alias(
                    "p"
                ),
                # lazy: the items write materializes the parse; the link
                # expansion then reads the cached result
            ).localCheckpoint(eager=False)
            items = parsed.select(
                F.col("url"),
                F.lit("extracted_text").alias("item_type"),
                F.col("p.text").alias("text"),
                F.col("__tf").alias("fields"),
                F.lit(rnd).alias("rnd"),
            )
            raw_links = parsed.select(
                F.col("url_canon").alias("base"),
                F.col("depth").alias("parent_depth"),
                F.col("cookies").alias("parent_cookies"),
                F.explode(F.col("p.links")).alias("href"),
            )
        else:
            # a custom parse_fields_udf owns the fields map; otherwise
            # transport metadata (when present) rides there
            fields_col = (
                self.parse_fields_udf(F.col("html"))
                if self.parse_fields_udf is not None
                else transport_fields
            )
            items = success.select(
                F.col("url"),
                F.lit("extracted_text").alias("item_type"),
                self.parse_text_udf(F.col("html")).alias("text"),
                fields_col.alias("fields"),
                F.lit(rnd).alias("rnd"),
            )
            raw_links = success.select(
                F.col("url_canon").alias("base"),
                F.col("depth").alias("parent_depth"),
                F.col("cookies").alias("parent_cookies"),
                F.explode(self.parse_links_udf(F.col("html"))).alias("href"),
            )
        # invalid-UTF-8 / unparsable pages yield text NULL → routed to
        # the error channel (functions/text.py contract), never written
        # as items. Counts come free from observations on the items
        # write (no extra driver jobs).
        from pyspark.sql import Observation

        obs_raw = Observation(f"items_raw_r{rnd}")
        items = items.observe(
            obs_raw,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("text").isNull().cast("long")).alias("n_null"),
        ).filter(F.col("text").isNotNull())
        obs_out = None
        if self.item_pipelines is not None:
            items = self.item_pipelines(items)  # X4
            obs_out = Observation(f"items_out_r{rnd}")
            items = items.observe(obs_out, F.count(F.lit(1)).alias("n"))
        links = raw_links.withColumn(
            "url", urljoin_udf(F.col("base"), F.col("href"))
        ).filter(F.col("url").isNotNull())
        # ONE Project node in FRONTIER_COLS order — a withColumn chain
        # here adds ~16 nested Projects that Catalyst must analyze and
        # collapse EVERY round; measured ~1.5 s/round of pure planning
        # time on the politeness crawl (localCheckpoint plans the query
        # even when lazy). unresolvable hrefs already filtered above;
        # url is canonical post-urljoin; Response::follow copies the
        # cookie jar onto followed requests (response.rs:186-203)
        candidates = links.select(
            F.col("url"),
            F.col("url").alias("url_canon"),
            url_hash_expr(F.col("url"), F.lit("GET")).alias("url_hash"),
            F.expr("parse_url(url, 'HOST')").alias("host"),
            F.lit("GET").alias("method"),
            F.lit(0).alias("priority"),
            (F.col("parent_depth") + 1).cast("int").alias("depth"),
            F.lit(rnd + 1).alias("discovery_round"),
            F.lit(0).cast("long").alias("discovery_seq"),
            F.lit(0).alias("retry_count"),
            F.lit(False).alias("dont_filter"),
            F.lit(0).alias("retry_not_before_round"),
            F.lit(None).cast("map<string,string>").alias("meta"),
            F.lit(None).cast("binary").alias("body"),
            F.col("parent_cookies").alias("cookies"),
            F.lit(None).cast("bigint").alias("timeout_ms"),
            F.lit(None).cast("string").alias("encoding"),
            F.lit(None).cast("array<string>").alias("flags"),
            F.lit(None).cast("string").alias("proxy"),
        )

        # redirects re-enter at the same depth AND priority
        # (response.rs:126-142), cookies copied like Response::follow;
        # hop count rides in meta, bounded by max_redirects. The whole
        # chain (UDF + union) is skipped when the round saw none — or
        # when follow_redirects is off, in which case 3xx rows are
        # terminal responses (counted, never re-enqueued).
        follow = n_redirect > 0 and s.follow_redirects
        redirs = None if not follow else routes["redirect"].select(
            urljoin_udf(
                F.col("url_canon"), F.element_at(F.col("headers"), "location")
            ).alias("url"),
            F.col("depth"),
            F.col("priority"),
            F.col("cookies"),
            # the reference downloader follows redirects within the SAME
            # Request, so per-request timeout/encoding/flags persist
            # across hops — carry them onto the re-enqueued row (a
            # shift-jis page behind a 301 keeps its decode override)
            F.col("timeout_ms"),
            F.col("encoding"),
            F.col("flags"),
            (
                F.coalesce(
                    F.element_at(F.col("meta"), "redirect_hops").cast("int"),
                    F.lit(0),
                )
                + 1
            ).alias("hops"),
        )
        # single Project (see candidates note). hop count survives into
        # the new row's meta or max_redirects could never bound a
        # multi-hop chain; proxy NOT inherited across redirects (the
        # reference never copies it onto the follow-up Request)
        redirs = None if redirs is None else (
            redirs.filter(
                F.col("url").isNotNull()
                & (F.col("hops") <= F.lit(s.max_redirects))
            ).select(
                F.col("url"),
                F.col("url").alias("url_canon"),
                url_hash_expr(F.col("url"), F.lit("GET")).alias("url_hash"),
                F.expr("parse_url(url, 'HOST')").alias("host"),
                F.lit("GET").alias("method"),
                F.col("priority"),
                F.col("depth"),
                F.lit(rnd + 1).alias("discovery_round"),
                F.lit(0).cast("long").alias("discovery_seq"),
                F.lit(0).alias("retry_count"),
                F.lit(False).alias("dont_filter"),
                F.lit(0).alias("retry_not_before_round"),
                F.map_from_arrays(
                    F.array(F.lit("redirect_hops")),
                    F.array(F.col("hops").cast("string")),
                ).alias("meta"),
                F.lit(None).cast("binary").alias("body"),
                F.col("cookies"),
                F.col("timeout_ms"),
                F.col("encoding"),
                F.col("flags"),
                F.lit(None).cast("string").alias("proxy"),
            )
        )
        _mark("cand-built")
        candidates = candidates.select(*FRONTIER_COLS)
        if redirs is not None:
            candidates = candidates.unionByName(redirs.select(*FRONTIER_COLS))

        # ---- enqueue: filters → in-batch dedup → seen anti-join (F1-F4, J1) ----
        candidates = apply_enqueue_filters(candidates, s)
        candidates = dedup_in_batch(candidates)
        _mark("enq-built")
        seen = self._load_seen()
        _mark("seen-load")
        candidates = anti_join_seen(
            candidates, seen, bloom=self.bloom
        ).select(*FRONTIER_COLS)
        _mark("antijoin-built")
        # one materialization — candidates feed the count, the seen delta,
        # and the frontier commit; without this the parse-UDF chain would
        # recompute 3-4× per round. Lazy: the new-URL count below is the
        # materializing action (count+cache = one job)
        candidates = candidates.localCheckpoint(eager=False)
        _mark("parse+enqueue")

        # ---- retries (J5/X5): skipped entirely on clean rounds ----
        retries = (
            None
            if n_retry_in == 0
            else build_retries(routes["retry"], rnd, s).select(*FRONTIER_COLS)
        )

        next_frontier = (
            gated.select(*FRONTIER_COLS)
            .unionByName(leftover.select(*FRONTIER_COLS))
            .unionByName(candidates)
        )
        if retries is not None:
            next_frontier = next_frontier.unionByName(retries)

        # ---- commit (S9): seen grows at enqueue time, like the reference ----
        seen_delta = candidates.select("url_hash")
        if s.max_requests_per_domain is not None:
            new_served = batch.groupBy("host").agg(
                F.count("*").cast("long").alias("served")
            )
            if served is not None:
                new_served = (
                    new_served.unionByName(served)
                    .groupBy("host")
                    .agg(F.sum("served").alias("served"))
                )
        else:
            new_served = None  # lifetime per-host accounting only with a cap

        # items are written first (inside the round dir, still invisible
        # until MANIFEST) so the observations attached to the items plan
        # resolve — item/decode-error counts cost no extra jobs.
        # The three staged writes run SERIALLY on the driver thread, by
        # measurement: overlapping them from a thread pool was tried
        # this round and reverted — concurrent consumers of the lazily
        # localCheckpointed candidates RDD race its checkpoint
        # finalization (the first completed job truncates lineage while
        # a sibling job is mid-schedule), which showed up as bursts of
        # DAGScheduler accumulator-update failures, slower sustained
        # crawls, and one outright write failure at the 4M design point.
        self.store.begin_round(rnd)
        _mark("pre-items")
        self.store.write_items(rnd, items)
        _mark("items-write")
        raw = obs_raw.get
        n_parsed = int(raw["n"] or 0)
        n_null_text = int(raw["n_null"] or 0)
        if obs_out is not None:
            n_items = int(obs_out.get["n"] or 0)
        else:
            n_items = n_parsed - n_null_text

        metrics = {
            "round": rnd,
            "requests": n_batch,
            "responses": n_success + n_redirect,
            "items": n_items,
            "errors": n_error,
            "retries": 0,  # filled below
            "new_urls": 0,  # filled below
        }
        # frontier staged next (still invisible until MANIFEST): its
        # write is the action that materializes the candidates
        # checkpoint, and an Observation riding it returns BOTH the
        # committed frontier size and the new-URL count — within this
        # round, candidate rows (parsed links + redirects, post
        # filter/dedup/anti-join) are exactly the discovery_round ==
        # rnd+1 rows of the union; leftover/gated/retry rows are all
        # older. This replaces the standalone candidates.count() job AND
        # the crawl loop's per-round frontier.isEmpty() probe — two
        # driver round-trips off the fixed per-round job floor.
        obs_fr = Observation(f"frontier_r{rnd}")
        next_frontier = next_frontier.observe(
            obs_fr,
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("discovery_round") == F.lit(rnd + 1)).cast("long")
            ).alias("n_new"),
        )
        self.store.write_frontier(rnd, next_frontier)
        # seen delta staged last (reads the now-cached candidates
        # partitions); commit_round below seals metrics + MANIFEST
        self.store.write_seen_delta(rnd, seen_delta)
        fr_vals = obs_fr.get
        n_new = int(fr_vals["n_new"] or 0)
        n_retries_requeued = 0 if retries is None else retries.count()
        _mark("counts")
        n_exhausted = n_retry_in - n_retries_requeued
        metrics["retries"] = n_retries_requeued
        # decode failures (text NULL) are errors, not items — the page
        # fetched but produced nothing (text.py error-channel contract)
        metrics["errors"] = n_error + n_exhausted + n_null_text
        metrics["new_urls"] = n_new
        metrics["frontier_size"] = int(fr_vals["n"] or 0)
        # seen grows only at enqueue: cumulative seen-delta rows
        self._seen_total += n_new
        metrics["seen_size"] = self._seen_total

        self.store.commit_round(
            rnd,
            None,  # frontier already staged above
            None,  # seen delta already staged above
            None,  # items already written above
            new_served,
            metrics,
            clean=False,
        )
        if self.bloom is not None and metrics["new_urls"]:
            # sidecar built AFTER the exact commit: a crash can leave the
            # bloom lagging (extra anti-join probes) but never ahead
            # (which could wrongly mark URLs maybe-seen before they are)
            self.bloom.update_from(
                candidates.select(
                    "url_hash",
                    F.pmod(
                        F.col("url_hash"), F.lit(self.settings.seen_buckets)
                    )
                    .cast("int")
                    .alias("bucket"),
                )
            )
        self._release_round_rdds(_rdds_before)
        _mark("commit")
        if _prof:
            print(f"[round {rnd}] n={n_batch} " + " ".join(
                f"{k}={v}s" for k, v in _marks))
        return metrics

    # ---- public API (X7 parity: Engine::run → stats) ----
    def run(
        self,
        seeds: list | DataFrame,
        max_rounds: int = 1_000,
    ) -> CrawlStats:
        import time as _time

        _t_run = _time.monotonic()
        s = self.settings
        # a store with committed rounds must be resumed, not re-seeded:
        # re-running run() would commit fresh seeds as round 0 while
        # resume() continues from the OLD latest frontier, silently
        # ignoring the new seeds and returning stale state
        prior = self.store.latest_round()
        if prior is not None:
            raise RuntimeError(
                f"store at {self.store.root} already has committed rounds"
                f" (latest={prior}); call resume() to continue that crawl,"
                " or point store_path at a fresh directory"
            )
        seeds_df = seeds_frontier(self.spark, seeds)
        # invalid URLs error at Request construction in the reference
        # (request.rs:107-108) — reject at enqueue, never fetch/retry.
        # Both seed counters ride Observations on the frontier WRITE
        # (the same trick the round loop uses): one execution of the
        # seeds plan — canonicalize UDF included — instead of two
        # standalone counts plus a write
        from pyspark.sql import Observation

        obs_valid = Observation("seed_validity")
        seeds_df = seeds_df.observe(
            obs_valid,
            F.sum(F.col("url_canon").isNull().cast("long")).alias(
                "n_invalid"
            ),
        ).filter(F.col("url_canon").isNotNull())
        frontier0 = apply_enqueue_filters(seeds_df, s)
        frontier0 = dedup_in_batch(frontier0)
        obs_fr0 = Observation("seed_frontier")
        frontier0 = frontier0.observe(
            obs_fr0, F.count(F.lit(1)).alias("n")
        )
        # round 0 = seeding commit: enqueue marks seen immediately
        # (memory_scheduler.rs:40-46). The frontier is staged first so
        # the observations resolve; the seen delta then reads the
        # committed parquet back instead of re-running the seeds plan
        self.store.begin_round(0)
        self.store.write_frontier(0, frontier0)
        invalid = int(obs_valid.get["n_invalid"] or 0)
        n_seeds = int(obs_fr0.get["n"] or 0)
        frontier0_disk = self.store.load_frontier(0)
        self.store.commit_round(
            0,
            None,  # staged above
            frontier0_disk.select("url_hash"),
            None,
            None,
            {
                "round": 0,  # seeds are marked seen at enqueue (bloom below)
                "requests": 0,
                "responses": 0,
                "items": 0,
                "errors": invalid,
                "retries": 0,
                "new_urls": n_seeds,
                "frontier_size": n_seeds,
                "seen_size": n_seeds,
            },
            clean=False,
        )
        if self.bloom is not None:
            self.bloom.update_from(
                frontier0_disk.select(
                    "url_hash",
                    F.pmod(
                        F.col("url_hash"), F.lit(s.seen_buckets)
                    )
                    .cast("int")
                    .alias("bucket"),
                )
            )
        stats = self.resume(max_rounds=max_rounds)
        # run()'s duration includes the seeding commit above
        stats.duration_s = _time.monotonic() - _t_run
        return stats

    # ---- cooperative pause/stop (reference Notify gates,
    #      engine/src/lib.rs:1153-1193; signals engine_paused/resumed) ----
    def pause(self) -> None:
        """Request a pause: the crawl loop blocks at the NEXT round
        boundary (after the in-flight round commits) and emits
        engine_paused; unpause() releases it. Thread-safe — call from
        another thread or from a signal handler.

        A pause issued while no crawl loop is running is discarded when
        the next run()/resume() starts (a stale flag would otherwise
        wedge it forever, ADVICE r3); to pause a crawl right after
        launching it from another thread, wait for the engine_started
        signal before calling pause()."""
        self._pause_requested = True

    def unpause(self) -> None:
        """Release a pause() gate; the loop emits engine_resumed and
        continues. (Named unpause — resume() restarts a crawl from its
        committed store, the reference's load_state analogue.)"""
        self._resume_event.set()

    def stop(self) -> None:
        """Request a graceful stop at the next round boundary (emits
        engine_stopping; committed state remains resumable). Also
        releases an active pause so a paused crawl can stop."""
        self._stop_requested = True
        self._resume_event.set()

    def _emit(self, signal: str, payload: dict) -> None:
        if self.signals is not None:
            self.signals.send(signal, payload)

    def _run_close_hooks(self) -> list[dict]:
        """Run spider → response-middleware → request-middleware →
        pipeline close hooks at crawl exit, EACH bounded by
        settings.close_timeout_ms (the reference wraps every close in a
        5 s timeout, engine/src/lib.rs:1285-1420). A hook that exceeds
        the bound is abandoned on a daemon thread and recorded as an
        error — crawl exit and the final spider_closed/engine_stopped
        signals are never blocked by user code. Returns the recorded
        errors (also kept on self.close_errors)."""
        import threading
        import warnings

        hooks: list[tuple[str, object]] = []
        if self.spider_close_hook is not None:
            hooks.append(("spider", self.spider_close_hook))
        for chain in (
            self.response_middlewares,
            self.request_middlewares,
            self.item_pipelines,
        ):
            get = getattr(chain, "close_hooks", None)
            if callable(get):
                hooks.extend(get())
        errors: list[dict] = []
        timeout_s = self.settings.close_timeout_ms / 1000.0
        for name, fn in hooks:
            raised: list[str] = []

            def _target(fn=fn, raised=raised):
                try:
                    fn()
                except Exception as e:  # recorded, never propagated
                    raised.append(f"{type(e).__name__}: {e}")

            t = threading.Thread(
                target=_target, daemon=True, name=f"close:{name}"
            )
            t.start()
            t.join(timeout_s)
            if t.is_alive():
                msg = (
                    f"close hook '{name}' still running after"
                    f" {self.settings.close_timeout_ms} ms — abandoned"
                )
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
                errors.append({"hook": name, "error": msg})
            elif raised:
                warnings.warn(
                    f"close hook '{name}' raised: {raised[0]}",
                    RuntimeWarning,
                    stacklevel=2,
                )
                errors.append({"hook": name, "error": raised[0]})
        self.close_errors = errors
        return errors

    def resume(self, max_rounds: int = 1_000) -> CrawlStats:
        """Continue from the latest committed round (pause/resume T5)."""
        from scrapy_rs_spark.plans.signals import (
            ENGINE_PAUSED,
            ENGINE_RESUMED,
            ENGINE_STARTED,
            SPIDER_OPENED,
        )

        import time as _time

        _t_start = _time.monotonic()
        stats = CrawlStats()
        # a prior stop() leaves the resume event set; a stale set event
        # would make the next pause() fall straight through. Likewise a
        # pause() issued during (or after) the previous run's final
        # round leaves _pause_requested set — without the reset the next
        # run/resume would block forever at its first round boundary
        # waiting for an unpause nobody will send
        self._resume_event.clear()
        self._pause_requested = False
        committed_metrics = self.store.load_metrics()
        for m in committed_metrics:
            stats.record(m)
        self._seen_total = sum(
            int(m.get("new_urls", 0)) for m in committed_metrics
        )
        last = self.store.latest_round()
        if last is None:
            raise RuntimeError("nothing to resume: no committed rounds")
        self._emit(ENGINE_STARTED, {"resume_from": last})
        self._emit(SPIDER_OPENED, {"resume_from": last})
        frontier = self.store.load_frontier(last)
        served = self.store.load_host_served(last) if last > 0 else None
        pages_served = stats.requests
        rnd = last
        # exact committed-frontier size, carried from metrics: each
        # round's frontier write observes its own row count
        # (frontier_size), so the loop never runs an isEmpty/count job
        # against a frontier it just committed. None = unknown (store
        # committed by a pre-frontier_size build) → fall back to probing.
        last_m = committed_metrics[-1] if committed_metrics else None
        fr_size = (
            int(last_m["frontier_size"])
            if last_m is not None and "frontier_size" in last_m
            else None
        )
        # frontier-size hint for the adaptive single-window budget rank
        # AND the fetch-join broadcast gate (exact when metrics carry
        # it; never undercounts either way). Budget paths need a hint
        # to pick the rank shape, so they probe when metrics lack one;
        # unlimited crawls just skip the broadcast gate in that case.
        fhint = fr_size
        delay = max(self.settings.domain_delay_ms,
                    self.settings.download_delay_ms)
        if fhint is None and (
            delay > 0
            or self.settings.max_requests_per_domain is not None
        ):
            fhint = frontier.count()
        while rnd < max_rounds:
            if self._stop_requested:
                break
            if self._pause_requested:
                # round boundary: state for round `rnd` is committed, so
                # a paused crawl is exactly a resumable store + a gate
                self._emit(ENGINE_PAUSED, {"round": rnd})
                self._resume_event.wait()
                self._resume_event.clear()
                self._pause_requested = False
                if self._stop_requested:
                    break
                self._emit(ENGINE_RESUMED, {"round": rnd})
            if (
                self.settings.page_limit is not None
                and pages_served >= self.settings.page_limit
            ):
                break
            if fr_size == 0 or (fr_size is None and frontier.isEmpty()):
                break
            committed = rnd + 1
            m = self._run_round(
                committed, frontier, served, pages_served,
                frontier_hint=fhint if fhint is not None else 1 << 62,
            )
            fr_size = m["frontier_size"]
            fhint = fr_size
            stats.record(m)
            if self.signals is not None:
                self.signals.emit_round(m)
            pages_served += m["requests"]
            if self.resource_controller is not None:
                # pending_requests = the frontier size this round just
                # observed on its own write — zero extra Spark jobs,
                # the scheduler.len() feed of lib.rs:1093-1103
                self.resource_controller.update(
                    pending_requests=fr_size if fr_size is not None else 0
                )
                self.resource_controller.throttle_if_needed()
            frontier = self.store.load_frontier(committed)
            if self.settings.max_requests_per_domain is not None:
                served = self.store.load_host_served(committed)
            if committed % self.settings.seen_compact_every == 0:
                # keep the seen-set one read wide (deltas pile up 1/round)
                self.store.compact_seen()
                # compaction deleted the cached delta dirs — drop the
                # cache so the next round rebuilds from the folded base
                self._seen_df_cache = None
                self._seen_cache_rounds = set()
            rnd = committed
            if m["requests"] == 0 and m["new_urls"] == 0:
                # only retry-gated or delay-phase-gated rows remain;
                # fast-forward the round counter to the earliest round
                # any row can serve instead of committing empty rounds
                # (a Crawl-delay-30 host against a 10 s round would
                # otherwise cost 2 empty commits per fetch)
                if not fr_size:
                    break
                nxt = F.greatest(
                    F.col("retry_not_before_round").cast("bigint"),
                    F.lit(rnd + 1).cast("bigint"),
                )
                if self._has_long_delays:
                    # phase-aware fast-forward whenever ANY delay (robots
                    # per-host OR global download/domain delay) exceeds
                    # the round — exactly the rounds where the budget
                    # phase-gates; _with_budget_inputs leaves
                    # __host_delay NULL when robots delays are absent so
                    # eff_delay falls back to the global delay
                    s = self.settings
                    fr2 = self._with_budget_inputs(frontier, None)
                    delay = max(s.domain_delay_ms, s.download_delay_ms)
                    eff_delay = F.greatest(
                        F.coalesce(F.col("__host_delay"), F.lit(0)).cast(
                            "bigint"
                        ),
                        F.lit(delay).cast("bigint"),
                    )
                    round_ms = F.lit(s.round_duration_ms).cast("bigint")
                    period = F.ceil(eff_delay / round_ms).cast("bigint")
                    phase = F.pmod(F.xxhash64(F.col("host")), period)
                    # first on-phase round ≥ the row's retry gate
                    nxt = F.when(
                        eff_delay > round_ms,
                        nxt + F.pmod(phase - nxt, period),
                    ).otherwise(nxt)
                    target = fr2.agg(F.min(nxt)).collect()[0][0]
                else:
                    target = frontier.agg(F.min(nxt)).collect()[0][0]
                if target is not None and target > rnd + 1:
                    rnd = int(target) - 1
        from scrapy_rs_spark.plans.signals import (
            ENGINE_STOPPED,
            ENGINE_STOPPING,
            SPIDER_CLOSED,
        )

        final = {"requests": stats.requests, "items": stats.items,
                 "errors": stats.errors, "rounds": stats.rounds,
                 "stopped_by_request": self._stop_requested}
        self._emit(ENGINE_STOPPING, final)
        # close hooks run between stopping and closed, like the
        # reference; each is timeout-bounded so the final signals below
        # fire even when a hook hangs
        close_errors = self._run_close_hooks()
        if close_errors:
            final["close_errors"] = close_errors
        self._emit(SPIDER_CLOSED, final)
        self._emit(ENGINE_STOPPED, final)
        self._stop_requested = False  # the store stays resumable
        stats.duration_s = _time.monotonic() - _t_start
        return stats

    def get_resource_stats(self):
        """Current ResourceStats snapshot, or None when resource
        monitoring is disabled (engine/src/lib.rs:1265-1272)."""
        if self.resource_controller is None:
            return None
        return self.resource_controller.get_stats()

    # convenience accessors
    def items(self) -> DataFrame:
        return self.store.load_items()

    def seen(self) -> DataFrame:
        return self.store.load_seen()

    def frontier(self) -> DataFrame:
        last = self.store.latest_round()
        return self.store.load_frontier(last)
