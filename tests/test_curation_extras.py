"""Corpus-curation operators: snapshot selection, deterministic splits,
sequence packing (operators/curation.py)."""

import pyspark.sql.functions as F

from scrapy_rs_spark.operators.curation import (
    latest_snapshot,
    pack_sequences,
    split_by_hash,
)


def test_latest_snapshot_picks_newest_with_tiebreak(spark):
    rows = [
        ("http://a.test/", "2024-01-01 00:00:00", 1),
        ("http://a.test/", "2024-06-01 00:00:00", 2),
        ("http://a.test/", "2024-06-01 00:00:00", 3),  # ts tie → max id
        ("http://b.test/", "2023-01-01 00:00:00", 4),
    ]
    df = spark.createDataFrame(
        rows, "url STRING, ts STRING, cap_id INT"
    ).withColumn("warc_ts", F.to_timestamp("ts"))
    out = {
        r.url: r.cap_id
        for r in latest_snapshot(
            df, tiebreak=[F.col("cap_id").desc()]
        ).collect()
    }
    assert out == {"http://a.test/": 3, "http://b.test/": 4}


def test_split_by_hash_deterministic_and_proportional(spark):
    docs = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_by_hash(docs, frac)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # pure function of the key: same assignment on re-run AND on a
    # subset (late-arriving data never moves existing rows)
    b = {r.doc_id: r["split"] for r in split_by_hash(docs, frac).collect()}
    sub = {
        r.doc_id: r["split"]
        for r in split_by_hash(
            docs.filter(F.col("doc_id") < 100), frac
        ).collect()
    }
    for k, v in sub.items():
        assert b[k] == v


def test_pack_sequences_budget_property(spark):
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.pmod(F.col("id"), 37) + 1).cast("int"))
        ).alias("text"),
    )
    out = pack_sequences(docs, max_tokens=100, n_groups=4)
    rows = out.collect()
    assert len(rows) == 400
    # bins: total tokens minus the (possibly overflowing) last doc fit
    # the budget — the streaming-pack contract
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r.group_id, r.bin_id)].append((r.doc_id, r.n_tokens))
    for (g, b), members in bins.items():
        members.sort()
        total = sum(n for _, n in members)
        assert total - members[-1][1] < 100, (g, b, total)
    # deterministic: same input → same bins
    again = {
        (r.doc_id): (r.group_id, r.bin_id)
        for r in pack_sequences(docs, max_tokens=100, n_groups=4).collect()
    }
    for r in rows:
        assert again[r.doc_id] == (r.group_id, r.bin_id)
