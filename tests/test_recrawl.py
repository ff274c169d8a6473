"""Re-crawl scheduling: closed-form change-rate cases."""

from scrapy_rs_spark.operators.recrawl import recrawl_schedule


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, round long, content_hash string"
    )


def test_recrawl_schedule_closed_form(spark):
    rows = [
        # a: 4 obs, changes every gap (h0 h1 h2 h3) → interval ceil(3/3)=1
        *[("a", r, f"h{r}") for r in range(4)],
        # b: 4 obs, one change (h h h H) → interval ceil(3/1)=3
        ("b", 0, "h"), ("b", 1, "h"), ("b", 2, "h"), ("b", 3, "H"),
        # c: 3 obs, never changes → interval = max_interval
        ("c", 0, "h"), ("c", 5, "h"), ("c", 9, "h"),
        # d: single observation → no gaps, max_interval backoff
        ("d", 2, "h"),
        # e: NULL hash in the middle never counts as a change partner
        ("e", 0, "h"), ("e", 1, None), ("e", 2, "h"),
    ]
    out = {
        r["url"]: r
        for r in recrawl_schedule(
            _hist(spark, rows), current_round=10, max_interval=16
        ).collect()
    }
    a = out["a"]
    assert (a["n_obs"], a["n_changes"], a["revisit_interval"], a["next_due"]) == (
        4, 3, 1, 4
    )
    assert (a["age"], a["due"]) == (7, 1)
    b = out["b"]
    assert (b["n_changes"], b["revisit_interval"], b["next_due"], b["due"]) == (
        1, 3, 6, 1
    )
    c = out["c"]
    assert (c["n_changes"], c["revisit_interval"], c["next_due"], c["due"]) == (
        0, 16, 25, 0
    )
    d = out["d"]
    assert (d["n_obs"], d["revisit_interval"], d["due"]) == (1, 16, 0)
    e = out["e"]
    assert (e["n_obs"], e["n_changes"], e["revisit_interval"]) == (3, 0, 16)


def test_due_set_feeds_frontier(spark):
    """due=1 rows convert straight into frontier generation rows."""
    from scrapy_rs_spark.sources.seeds import seeds_frontier

    rows = [("x", 0, "h0"), ("x", 1, "h1"), ("y", 9, "h")]
    due = (
        recrawl_schedule(_hist(spark, rows), current_round=10)
        .filter("due = 1")
        .select("url")
    )
    fr = seeds_frontier(spark, due)
    got = [r["url"] for r in fr.collect()]
    assert got == ["x"]
    assert "priority" in fr.columns and "depth" in fr.columns


def test_host_backoff_closed_form(spark):
    from scrapy_rs_spark.operators.recrawl import host_backoff

    rows = [
        # h1: ok, ok → healthy
        ("h1", 0, 1), ("h1", 1, 1),
        # h2: ok at 1, then 3 failures → tripped, cooldown 4 + min(16, 2^3)=12
        ("h2", 0, 0), ("h2", 1, 1), ("h2", 2, 0), ("h2", 3, 0), ("h2", 4, 0),
        # h3: never ok, 2 failures → below threshold
        ("h3", 0, 0), ("h3", 1, 0),
        # h4: never ok, 5 failures → tripped, backoff capped at 16
        *[("h4", r, 0) for r in range(5)],
    ]
    df = spark.createDataFrame(rows, "host string, round long, ok int")
    out = {
        r["host"]: r
        for r in host_backoff(df, current_round=10, threshold=3).collect()
    }
    h1 = out["h1"]
    assert (h1["trailing_failures"], h1["tripped"], h1["blocked"]) == (0, 0, 0)
    assert h1["cooldown_until"] is None
    h2 = out["h2"]
    assert (h2["last_ok_round"], h2["trailing_failures"], h2["tripped"]) == (
        1, 3, 1
    )
    assert h2["cooldown_until"] == 4 + 8
    assert h2["blocked"] == 1  # 12 > 10
    h3 = out["h3"]
    assert (h3["last_ok_round"], h3["trailing_failures"], h3["tripped"]) == (
        None, 2, 0
    )
    h4 = out["h4"]
    assert (h4["trailing_failures"], h4["cooldown_until"]) == (5, 4 + 16)
    assert h4["blocked"] == 1
    # a tripped host past its cooldown is no longer blocked
    out25 = {
        r["host"]: r
        for r in host_backoff(df, current_round=25, threshold=3).collect()
    }
    assert out25["h2"]["tripped"] == 1 and out25["h2"]["blocked"] == 0
