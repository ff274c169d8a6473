"""Round-4 fixes: default request timeout, proxy pass-through,
response transport metadata, monitoring event history, chunk-dedup
scale guard, redirect aux persistence, pause-flag reset, long-delay
budget gating.

Reference anchors: request.rs:86 (proxy), response.rs:35-45
(certificate/ip_address/protocol), monitoring/src/lib.rs:99-105
(event buffer), downloader redirect-following semantics (aux fields
persist across hops within one Request).
"""

import threading

import pyspark.sql.functions as F
import pytest

from scrapy_rs_spark.operators.fetch import fetch_error_class, fetch_join
from scrapy_rs_spark.plans.engine import FRONTIER_COLS, CrawlEngine
from scrapy_rs_spark.settings import Settings
from scrapy_rs_spark.sources.seeds import seeds_frontier


# ---- default request timeout (ADVICE r3, schemas.py NULL semantics) ----

def test_default_timeout_applies_when_per_row_null(spark):
    """timeout_ms NULL falls back to default_timeout_ms — the documented
    settings.request_timeout_ms semantics (previously silently dead)."""
    pages = spark.createDataFrame(
        [
            ("http://t.test/slow", 200, "<html>s</html>", 50_000),
            ("http://t.test/fast", 200, "<html>f</html>", 10),
        ],
        "url STRING, status INT, html STRING, latency_ms BIGINT",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    batch = seeds_frontier(
        spark, ["http://t.test/slow", "http://t.test/fast"]
    )
    fetched = fetch_join(batch, pages, default_timeout_ms=30_000)
    fetched = fetched.withColumn("error_class", fetch_error_class(fetched))
    rows = {r.url: r for r in fetched.collect()}
    assert rows["http://t.test/slow"].timed_out
    assert rows["http://t.test/slow"].error_class == "timeout"
    assert not rows["http://t.test/fast"].timed_out


def test_engine_applies_settings_request_timeout(spark, tmp_path):
    """E2E: no per-row timeout, latency over settings.request_timeout_ms
    → timeout class → retried, then exhausted into errors."""
    pages = spark.createDataFrame(
        [("http://t.test/slow", 200, "<html>s</html>", 5_000)],
        "url STRING, status INT, html STRING, latency_ms BIGINT",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(
            max_depth=0,
            respect_robots_txt=False,
            max_retries=0,
            request_timeout_ms=1_000,
        ),
        store_path=str(tmp_path / "to_default"),
    )
    stats = eng.run(["http://t.test/slow"])
    assert stats.items == 0 and stats.errors == 1


# ---- proxy request column (request.rs:86, with_proxy :218-222) ----

def test_proxy_in_frontier_cols():
    assert "proxy" in FRONTIER_COLS


def test_proxy_round_trip_through_fetch_and_store(spark, tmp_path):
    from scrapy_rs_spark.sources.store import CrawlStore

    df = seeds_frontier(
        spark,
        [
            {"url": "http://p.test/x", "proxy": "http://proxy.local:8080"},
            {"url": "http://p.test/y"},
        ],
    )
    store = CrawlStore(spark, str(tmp_path / "proxy"))
    store.commit_round(0, df, df.select("url_hash"), None, None, {"round": 0})
    rows = {r.url: r for r in store.load_frontier(0).collect()}
    assert rows["http://p.test/x"].proxy == "http://proxy.local:8080"
    assert rows["http://p.test/y"].proxy is None
    # survives the fetch join (visible to response middlewares)
    pages = spark.createDataFrame(
        [("http://p.test/x", 200, "<html>x</html>")],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    fetched = fetch_join(store.load_frontier(0), pages)
    got = {r.url: r.proxy for r in fetched.collect()}
    assert got["http://p.test/x"] == "http://proxy.local:8080"


def test_proxy_not_inherited_by_followed_links(spark, tmp_path):
    """The reference never copies proxy onto follow-ups; discovered
    links enqueue with proxy NULL (observable in the committed
    round-1 frontier before the link is fetched)."""
    pages = spark.createDataFrame(
        [
            ("http://p.test/a", 200, '<a href="/b">b</a>'),
            ("http://p.test/b", 200, "<html>b</html>"),
        ],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(respect_robots_txt=False, page_limit=1),
        store_path=str(tmp_path / "noinherit"),
    )
    eng.run([{"url": "http://p.test/a", "proxy": "http://proxy.local:1"}])
    follow = eng.frontier().filter(F.col("url") == "http://p.test/b")
    rows = follow.collect()
    assert len(rows) == 1 and rows[0].proxy is None


# ---- response transport metadata (response.rs:35-45) ----

def test_transport_metadata_reaches_item_pipeline(spark, tmp_path):
    pages = spark.createDataFrame(
        [
            (
                "http://s.test/a",
                200,
                "<html>secure</html>",
                "CN=s.test",
                "93.184.216.34",
                "h2",
            )
        ],
        "url STRING, status INT, html STRING, certificate STRING,"
        " ip_address STRING, protocol STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    seen_in_pipeline = {}

    def pipeline(items):
        # an item pipeline that reads the transport fields — the filter
        # only keeps items whose ip_address survived into fields
        seen_in_pipeline["called"] = True
        return items.filter(F.col("fields")["ip_address"].isNotNull())

    eng = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=0, respect_robots_txt=False),
        store_path=str(tmp_path / "transport"),
        item_pipelines=pipeline,
    )
    stats = eng.run(["http://s.test/a"])
    assert seen_in_pipeline.get("called")
    assert stats.items == 1  # the pipeline's ip_address filter kept it
    row = eng.items().collect()[0]
    assert row.fields["ip_address"] == "93.184.216.34"
    assert row.fields["certificate"] == "CN=s.test"
    assert row.fields["protocol"] == "h2"


# ---- monitoring event history (monitoring/src/lib.rs:99-105) ----

def test_monitor_event_history_order_and_cap(spark, tmp_path):
    import json
    import urllib.request

    from scrapy_rs_spark.monitoring import CrawlMonitor
    from scrapy_rs_spark.plans.signals import SignalManager

    pages = spark.createDataFrame(
        [("http://m.test/a", 200, "<html>a</html>")],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    sig = SignalManager()
    eng = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=0, respect_robots_txt=False),
        store_path=str(tmp_path / "events"),
        signals=sig,
    )
    monitor = CrawlMonitor(eng.store, max_events=4)
    monitor.attach_signals(sig)
    eng.run(["http://m.test/a"])
    events = monitor.events()
    # documented cap: only the most recent max_events retained
    assert len(events) == 4
    seqs = [e["seq"] for e in events]
    assert seqs == sorted(seqs) and seqs[-1] - seqs[0] == 3
    # a full crawl emits more than the cap → oldest evicted (seq > 0)
    assert seqs[0] > 0
    # delivery order: the last lifecycle events close the crawl
    assert events[-1]["signal"] == "engine_stopped"
    assert [e["signal"] for e in events[-3:]] == [
        "engine_stopping",
        "spider_closed",
        "engine_stopped",
    ]
    # served over HTTP at /events (server.rs route parity)
    port = monitor.serve()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/events", timeout=10
        ) as resp:
            body = json.loads(resp.read())
        assert body["max_events"] == 4
        assert [e["seq"] for e in body["events"]] == seqs
    finally:
        monitor.stop()


# ---- chunk-dedup scale guard ----

def test_chunk_dedup_guard_trips_loudly(spark):
    from scrapy_rs_spark.operators.curation import chunk_dedup

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(200)))],
        "doc_id INT, text STRING",
    )
    with pytest.raises(Exception, match="max_chunks_per_doc"):
        chunk_dedup(
            docs, chunk_words=10, max_chunks_per_doc=5
        ).collect()
    # within bounds: returns normally (20 chunks < 64)
    out = chunk_dedup(docs, chunk_words=10, max_chunks_per_doc=64).collect()
    assert out[0].n_chunks == 20


# ---- redirect preserves request auxiliaries (ADVICE r3) ----

def test_redirect_preserves_encoding_and_timeout(spark, tmp_path):
    """A shift-jis page behind a 301 keeps its decode override; the
    per-request timeout keeps applying after the hop."""
    sjis_html = "<html><body>こんにちは</body></html>".encode("shift_jis")
    pages = spark.createDataFrame(
        [
            ("http://jp.test/r", 301, None, {"location": "/a"}, 10),
            ("http://jp.test/a", 200, bytearray(sjis_html), None, 5_000),
        ],
        "url STRING, status INT, html BINARY,"
        " headers MAP<STRING,STRING>, latency_ms BIGINT",
    )
    eng = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=0, respect_robots_txt=False),
        store_path=str(tmp_path / "redir_enc"),
    )
    stats = eng.run([{"url": "http://jp.test/r", "encoding": "shift_jis"}])
    assert stats.items == 1 and stats.errors == 0
    assert eng.items().collect()[0].text == "こんにちは"
    # timeout carried across the hop: same site, tight per-request
    # timeout → the slow redirect target times out (error, no item)
    eng2 = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=0, respect_robots_txt=False, max_retries=0),
        store_path=str(tmp_path / "redir_to"),
    )
    stats2 = eng2.run(
        [
            {
                "url": "http://jp.test/r",
                "encoding": "shift_jis",
                "timeout_ms": 1_000,
            }
        ]
    )
    assert stats2.items == 0 and stats2.errors == 1


# ---- pause flag reset (ADVICE r3) ----

def test_pause_after_final_round_does_not_block_next_resume(
    spark, tmp_path
):
    pages = spark.createDataFrame(
        [("http://pz.test/a", 200, "<html>a</html>")],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(max_depth=0, respect_robots_txt=False),
        store_path=str(tmp_path / "pauseflag"),
    )
    eng.run(["http://pz.test/a"])
    # a pause() landing after the crawl ended must not wedge the next
    # resume() at its first round boundary
    eng.pause()
    done = {}

    def _resume():
        done["stats"] = eng.resume()

    t = threading.Thread(target=_resume, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "resume() blocked on a stale pause flag"
    assert done["stats"].requests >= 1


# ---- long-delay budget gating (round-4 verdict ask #1) ----

def test_has_long_delays_flag(spark, tmp_path):
    pages = spark.createDataFrame(
        [("http://h.test/a", 200, "<html>a</html>")],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))

    def make(settings):
        return CrawlEngine(
            spark, pages, settings, store_path=str(tmp_path / "flagchk")
        )

    assert make(
        Settings(domain_delay_ms=100, round_duration_ms=10_000)
    )._has_long_delays is False
    assert make(
        Settings(download_delay_ms=30_000, round_duration_ms=10_000)
    )._has_long_delays is True
    robots = spark.createDataFrame(
        [("h.test", None, None, 30_000, None)],
        "host STRING, disallow_prefixes ARRAY<STRING>,"
        " allow_prefixes ARRAY<STRING>, crawl_delay_ms BIGINT,"
        " max_concurrent INT",
    )
    eng = CrawlEngine(
        spark,
        pages,
        Settings(round_duration_ms=10_000),
        robots=robots,
        store_path=str(tmp_path / "flagchk2"),
    )
    assert eng._has_long_delays is True


def test_global_long_delay_gates_and_fast_forwards(spark, tmp_path):
    """With only a global download_delay_ms > round_duration_ms the
    crawl must (a) space fetches period rounds apart and (b) never
    commit two consecutive empty rounds (phase-aware fast-forward,
    ADVICE r3)."""
    pages = spark.createDataFrame(
        [
            ("http://g.test/a", 200, '<a href="/b">b</a>'),
            ("http://g.test/b", 200, '<a href="/c">c</a>'),
            ("http://g.test/c", 200, "<html>end</html>"),
        ],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(
            respect_robots_txt=False,
            download_delay_ms=25_000,  # period = ceil(25/10) = 3 rounds
            round_duration_ms=10_000,
        ),
        store_path=str(tmp_path / "longglobal"),
    )
    stats = eng.run(["http://g.test/a"], max_rounds=40)
    assert stats.requests == 3 and stats.items == 3
    serving = [
        m["round"] for m in stats.per_round if m.get("requests", 0) > 0
    ]
    assert len(serving) == 3
    # one fetch every `period` rounds — the long-delay gating
    assert serving[1] - serving[0] == 3
    assert serving[2] - serving[1] == 3
    # fast-forward: at most one committed empty round between fetches
    committed = [
        m for m in stats.per_round if m.get("round", 0) > 0
    ]
    empties = [
        m["round"]
        for m in committed
        if m.get("requests", 0) == 0 and m.get("new_urls", 0) == 0
    ]
    for i in range(1, len(empties)):
        assert empties[i] - empties[i - 1] > 1, (
            "two consecutive empty rounds committed — fast-forward"
            " not applied for global long delays"
        )


# ---- incremental seen cache (r4 perf) ----

def test_seen_cache_self_heals_after_external_compaction(spark, tmp_path):
    """The engine's cached seen DataFrame references per-round delta
    dirs; compaction (even one the engine didn't trigger) deletes
    them. The validity check must rebuild from the folded base, and
    membership must stay exact — a crawl paused, compacted, and
    resumed re-fetches nothing."""
    pages = spark.createDataFrame(
        [
            (f"http://sc.test/{i}", 200,
             f'<a href="/{i + 1}">n</a>' if i < 5 else "<html>end</html>")
            for i in range(6)
        ],
        "url STRING, status INT, html STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    eng = CrawlEngine(
        spark,
        pages,
        Settings(respect_robots_txt=False, page_limit=3),
        store_path=str(tmp_path / "seencache"),
    )
    eng.run(["http://sc.test/0"])  # fetches 0,1,2 then hits the limit
    # engine's cache now spans the committed deltas; compact externally
    eng.store.compact_seen()
    eng.settings.page_limit = None
    stats = eng.resume()
    # resume continues 3,4,5 — nothing re-fetched despite the cache
    # having pointed at now-deleted delta dirs
    assert stats.requests == 6
    items = {r.url for r in eng.items().collect()}
    assert items == {f"http://sc.test/{i}" for i in range(6)}


# ---- code-review fixes (r4) ----

def test_dedup_winner_intmin_and_null_priority(spark):
    """min_by order key must survive priority=INT_MIN under ANSI (no
    ARITHMETIC_OVERFLOW) and rank NULL priority LAST (desc NULLS LAST),
    matching the old window formulation."""
    from scrapy_rs_spark.operators.dedup import dedup_in_batch

    rows = [
        # url_hash 1: INT_MIN priority vs normal — normal wins (desc)
        ("http://x/a", 1, -2147483648, 0, 0, 0),
        ("http://x/b", 1, 5, 0, 0, 0),
        # url_hash 2: NULL priority loses to any real priority
        ("http://y/a", 2, None, 0, 0, 0),
        ("http://y/b", 2, -7, 0, 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url STRING, url_hash BIGINT, priority INT, depth INT,"
        " discovery_round INT, discovery_seq BIGINT",
    )
    out = {r.url_hash: r.url for r in dedup_in_batch(df).collect()}
    assert out == {1: "http://x/b", 2: "http://y/b"}


def test_monitor_attach_idempotent_and_detach(spark, tmp_path):
    from scrapy_rs_spark.monitoring import CrawlMonitor
    from scrapy_rs_spark.plans.signals import ENGINE_STARTED, SignalManager
    from scrapy_rs_spark.sources.store import CrawlStore

    store = CrawlStore(spark, str(tmp_path / "mon"))
    sig = SignalManager()
    monitor = CrawlMonitor(store, max_events=16)
    monitor.attach_signals(sig)
    monitor.attach_signals(sig)  # idempotent — no double recording
    sig.send(ENGINE_STARTED, {"n": 1})
    assert len(monitor.events()) == 1
    monitor.detach_signals(sig)
    sig.send(ENGINE_STARTED, {"n": 2})
    assert len(monitor.events()) == 1  # detached → not recorded


def test_transport_collision_renamed_req(spark):
    """A batch already carrying a transport-named column gets req_*
    treatment like status/html/headers — no ambiguous reference."""
    pages = spark.createDataFrame(
        [("http://c.test/a", 200, "<html>a</html>", "h2")],
        "url STRING, status INT, html STRING, protocol STRING",
    ).withColumn("headers", F.lit(None).cast("map<string,string>"))
    batch = seeds_frontier(spark, ["http://c.test/a"]).withColumn(
        "protocol", F.lit("req-side")
    )
    fetched = fetch_join(batch, pages)
    row = fetched.collect()[0]
    assert row.protocol == "h2"  # response owns the plain name
    assert row.req_protocol == "req-side"


def test_dedup_minby_equals_window_formulation(spark):
    """Property: the min_by aggregate picks exactly the winner the old
    window-rank formulation picked, on a seeded random frame whose
    order keys are unique per group (the only regime where either
    formulation is deterministic)."""
    import random

    from pyspark.sql.window import Window

    from scrapy_rs_spark.operators.dedup import dedup_in_batch, winner_order

    rng = random.Random(42)
    rows = []
    for i in range(400):
        rows.append(
            (
                f"http://h{rng.randrange(5)}.test/p{i}",  # unique url
                rng.randrange(60),  # url_hash: ~7 rows per group
                rng.randrange(-5, 6),  # priority
                rng.randrange(4),  # depth
                rng.randrange(3),  # discovery_round
                rng.randrange(1000),  # discovery_seq
            )
        )
    df = spark.createDataFrame(
        rows,
        "url STRING, url_hash BIGINT, priority INT, depth INT,"
        " discovery_round INT, discovery_seq BIGINT",
    )
    w = Window.partitionBy("url_hash").orderBy(*winner_order())
    via_window = {
        (r.url_hash, r.url)
        for r in df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .collect()
    }
    via_minby = {
        (r.url_hash, r.url) for r in dedup_in_batch(df).collect()
    }
    assert via_minby == via_window
