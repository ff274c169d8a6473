"""CrawlStore commit/resume/compaction semantics (S9)."""

import os

import pyspark.sql.functions as F

from scrapy_rs_spark.sources.store import CrawlStore


def _seen_rows(spark, hashes):
    return spark.createDataFrame([(h,) for h in hashes], "url_hash BIGINT")


def _empty_frontier(spark):
    from scrapy_rs_spark.schemas import FRONTIER_DDL

    return spark.createDataFrame([], FRONTIER_DDL)


def test_manifest_last_commit_visibility(spark, tmp_path):
    store = CrawlStore(spark, str(tmp_path / "s"), seen_buckets=4)
    store.commit_round(
        1, _empty_frontier(spark), _seen_rows(spark, [1, 2]), None, None,
        {"round": 1},
    )
    assert store.committed_rounds() == [1]
    # a round dir without MANIFEST is invisible (uncommitted)
    os.makedirs(str(tmp_path / "s/rounds/round=000002"))
    assert store.committed_rounds() == [1]
    assert store.latest_round() == 1


def test_compact_seen_preserves_membership(spark, tmp_path):
    store = CrawlStore(spark, str(tmp_path / "c"), seen_buckets=4)
    all_hashes = set()
    for r in range(1, 5):
        hs = list(range(r * 100, r * 100 + 10))
        all_hashes.update(hs)
        store.commit_round(
            r, _empty_frontier(spark), _seen_rows(spark, hs), None, None,
            {"round": r},
        )
    before = {x.url_hash for x in store.load_seen().collect()}
    assert before == all_hashes
    store.compact_seen()
    after = {x.url_hash for x in store.load_seen().collect()}
    assert after == all_hashes
    # earlier deltas are gone; everything lives in the last round
    for r in range(1, 4):
        assert not os.path.isdir(
            str(tmp_path / f"c/rounds/round={r:06d}/seen_delta")
        )
    # buckets preserved for partition-pruned probes
    assert {x.bucket for x in store.load_seen().collect()} <= {0, 1, 2, 3}


def test_lineage_plain_store_reconciles_with_deltas(spark, tmp_path):
    """Per-partition lineage (north rule): every committed round writes
    lineage.json whose per-file row counts sum to the actual delta/
    frontier row counts, with seen_delta rows attributed to their
    bucket= partitions."""
    store = CrawlStore(spark, str(tmp_path / "lin"), seen_buckets=4)
    store.commit_round(
        1, _empty_frontier(spark), _seen_rows(spark, range(100)), None,
        None, {"round": 1},
    )
    store.commit_round(
        2, _empty_frontier(spark), _seen_rows(spark, range(100, 130)),
        None, None, {"round": 2},
    )
    lin = store.load_lineage()
    assert {r["round"] for r in lin} == {1, 2}
    seen1 = [r for r in lin if r["round"] == 1 and r["dataset"] == "seen_delta"]
    assert sum(r["rows"] for r in seen1) == 100
    # bucket partitions are recorded and complete (pmod over 0..99 hits
    # all 4 buckets)
    assert {r["partition"].split("=")[0] for r in seen1} == {"bucket"}
    assert len({r["partition"] for r in seen1}) == 4
    assert all(r["bytes"] > 0 and r["file"].endswith(".parquet") for r in lin)
    seen2 = [r for r in lin if r["round"] == 2 and r["dataset"] == "seen_delta"]
    assert sum(r["rows"] for r in seen2) == 30
    # the DataFrame view aggregates the same way
    agg = {
        (r["round"], r["dataset"]): r["total"]
        for r in store.lineage_df()
        .groupBy("round", "dataset")
        .agg(F.sum("rows").alias("total"))
        .collect()
    }
    assert agg[(1, "seen_delta")] == 100
    assert agg[(2, "seen_delta")] == 30


def test_lineage_bucketed_store_attributes_rounds(spark, tmp_path):
    """Bucketed-seen lineage identifies each append's files inside the
    shared table via footer round-statistics: per-round sums match the
    delta sizes even though all rounds share one table directory."""
    store = CrawlStore(
        spark, str(tmp_path / "linb"), seen_buckets=4, bucketed_seen=True
    )
    store.commit_round(
        1, _empty_frontier(spark), _seen_rows(spark, range(50)), None,
        None, {"round": 1},
    )
    store.commit_round(
        2, _empty_frontier(spark), _seen_rows(spark, range(50, 70)), None,
        None, {"round": 2},
    )
    lin = store.load_lineage()
    for rnd, expect in ((1, 50), (2, 20)):
        rows = [
            r for r in lin
            if r["round"] == rnd and r["dataset"] == "seen_delta"
        ]
        assert sum(r["rows"] for r in rows) == expect
        assert all(r["partition"].startswith("bucket=") for r in rows)
    # lineage survives compaction as a historical commit record
    store.compact_seen()
    assert store.load_lineage() == lin
