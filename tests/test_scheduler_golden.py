"""Scheduler golden-order tests, ported 1:1 from the reference's crown
jewels (/root/reference/scheduler/src/tests.rs:1-227). Same URLs,
priorities, depths, expected pop orders — executed through the real
DataFrame rank pipeline (identity UDFs, enqueue filters, in-batch dedup,
seen anti-join, Window ordering)."""

import pytest

from scrapy_rs_spark.operators.scheduler import FrontierScheduler


def test_memory_scheduler(spark):
    """tests.rs:5-58 — priority pop order, dup-enqueue no-op, clear."""
    sched = FrontierScheduler(spark, scheduler_type="memory")
    sched.enqueue("https://example.com/1", priority=1)
    sched.enqueue("https://example.com/2", priority=2)
    sched.enqueue("https://example.com/3", priority=3)
    assert sched.len() == 3
    for u in ("/1", "/2", "/3"):
        assert sched.has_seen(f"https://example.com{u}")
    # duplicate enqueue is silently dropped (memory_scheduler.rs:40-43)
    sched.enqueue("https://example.com/1", priority=1)
    assert sched.len() == 3
    # highest priority first (memory_scheduler.rs:58-61)
    assert sched.next().url == "https://example.com/3"
    assert sched.next().url == "https://example.com/2"
    assert sched.next().url == "https://example.com/1"
    assert sched.is_empty()
    assert sched.next() is None
    sched.clear()
    assert not sched.has_seen("https://example.com/1")


def test_fifo_scheduler(spark):
    """tests.rs:60-89 — arrival order."""
    sched = FrontierScheduler(spark, scheduler_type="fifo")
    for i in (1, 2, 3):
        sched.enqueue(f"https://example.com/{i}")
    assert sched.len() == 3
    assert sched.drain_urls() == [
        "https://example.com/1",
        "https://example.com/2",
        "https://example.com/3",
    ]
    assert sched.is_empty()


def test_domain_group_scheduler(spark):
    """tests.rs:91-147 — cross-domain priority order with
    max_requests_per_domain=2."""
    sched = FrontierScheduler(
        spark,
        scheduler_type="domain_group",
        strategy="priority",
        max_requests_per_domain=2,
    )
    sched.enqueue("https://example.com/1", priority=1)
    sched.enqueue("https://example.org/1", priority=2)
    sched.enqueue("https://example.net/1", priority=3)
    sched.enqueue("https://example.com/2", priority=4)
    assert sched.len() == 4
    assert sched.drain_urls() == [
        "https://example.com/2",
        "https://example.net/1",
        "https://example.org/1",
        "https://example.com/1",
    ]
    assert sched.is_empty()


def test_depth_first_scheduler(spark):
    """tests.rs:149-187 — LIFO pop + depth-limit drop at enqueue."""
    sched = FrontierScheduler(
        spark, scheduler_type="depth_first", max_depth=2
    )
    sched.enqueue("https://example.com/1", depth=0)
    sched.enqueue("https://example.com/2", depth=1)
    sched.enqueue("https://example.com/3", depth=2)
    sched.enqueue("https://example.com/4", depth=3)  # exceeds max depth
    assert sched.len() == 3
    assert sched.drain_urls() == [
        "https://example.com/3",
        "https://example.com/2",
        "https://example.com/1",
    ]
    assert sched.is_empty()


def test_breadth_first_scheduler(spark):
    """tests.rs:189-227 — FIFO pop + depth-limit drop at enqueue."""
    sched = FrontierScheduler(
        spark, scheduler_type="breadth_first", max_depth=2
    )
    sched.enqueue("https://example.com/1", depth=0)
    sched.enqueue("https://example.com/2", depth=1)
    sched.enqueue("https://example.com/3", depth=2)
    sched.enqueue("https://example.com/4", depth=3)  # exceeds max depth
    assert sched.len() == 3
    assert sched.drain_urls() == [
        "https://example.com/1",
        "https://example.com/2",
        "https://example.com/3",
    ]
    assert sched.is_empty()


def test_domain_cap_skips_exhausted_domain(spark):
    """domain_group_scheduler.rs:98-106/:234-238 — a domain past its cap
    is skipped at dequeue even if its rows have the highest priority."""
    sched = FrontierScheduler(
        spark,
        scheduler_type="domain_group",
        strategy="priority",
        max_requests_per_domain=1,
    )
    sched.enqueue("https://example.com/a", priority=10)
    sched.enqueue("https://example.com/b", priority=9)
    sched.enqueue("https://example.org/c", priority=1)
    assert sched.next().url == "https://example.com/a"
    # example.com is now capped → /b is skipped, org/c served
    assert sched.next().url == "https://example.org/c"
