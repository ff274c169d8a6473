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
