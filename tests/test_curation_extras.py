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


def test_repetition_score_closed_form(spark):
    from scrapy_rs_spark.operators.textdedup import repetition_score

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z w"), (3, "solo")],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r for r in repetition_score(docs, n=2).collect()}
    # "a b a b a b": bigrams [ab, ba, ab, ba, ab] → 5 total, 2 distinct
    assert out[1].n_grams == 5 and out[1].n_distinct == 2
    assert out[1].rep_ratio == 0.6
    assert out[2].rep_ratio == 0.0
    # shorter than n words → no grams, ratio 0 (not NULL)
    assert out[3].n_grams == 0 and out[3].rep_ratio == 0.0


def test_contamination_finds_planted_copy(spark):
    from scrapy_rs_spark.operators.textdedup import contamination_check

    words = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"v{i}" for i in range(20))
    bench = spark.createDataFrame([(0, words)], "doc_id BIGINT, text STRING")
    corpus = spark.createDataFrame(
        [(10, words), (11, other)], "doc_id BIGINT, text STRING"
    )
    rows = contamination_check(corpus, bench, n=13).collect()
    # doc 10 shares all 8 of its 13-grams with the benchmark; 11 none
    assert {(r.doc_id, r.n_contaminated_grams) for r in rows} == {(10, 8)}


def test_quota_sample_deterministic_and_subset_stable(spark):
    from scrapy_rs_spark.operators.curation import quota_sample

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 1.0, "zh": 0.2}
    kept1 = {r.doc_id for r in quota_sample(docs, rates).collect()}
    kept2 = {r.doc_id for r in quota_sample(docs, rates).collect()}
    assert kept1 == kept2  # pure function of the key
    # every en row kept; zh thinned to ~20%
    assert all(d in kept1 for d in range(0, 1000, 2))
    zh_kept = sum(1 for d in kept1 if d % 2 == 1)
    assert 50 <= zh_kept <= 150
    # subset stability: decisions don't change when rows are removed
    sub = docs.filter(F.col("doc_id") < 500)
    kept_sub = {r.doc_id for r in quota_sample(sub, rates).collect()}
    assert kept_sub == {d for d in kept1 if d < 500}


def test_chunk_dedup_drops_corpus_duplicates_only(spark):
    from scrapy_rs_spark.operators.curation import chunk_dedup

    dup = " ".join(f"d{i}" for i in range(20))  # 2 chunks of 10
    unique = " ".join(f"u{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, dup), (2, dup), (3, unique)], "doc_id BIGINT, text STRING"
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, chunk_words=10).collect()}
    # both copies of the duplicated doc lose ALL their chunks
    assert out[1].n_dropped_chunks == 2 and out[1].text_clean == ""
    assert out[2].n_dropped_chunks == 2
    # the unique doc is reassembled byte-identically
    assert out[3].n_dropped_chunks == 0 and out[3].text_clean == unique


def test_pii_scrub_patterns(spark):
    from scrapy_rs_spark.functions.analysis import pii_count, pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.b-c%d@sub.example.org then 192.168.0.1 and"
             " +44 20-7946-0958 done"),
         (2, "no pii here at all")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_scrub("text").alias("s"),
            pii_count("text", "email").alias("e"),
            pii_count("text", "ipv4").alias("i"),
            pii_count("text", "phone").alias("p"),
        ).collect()
    }
    assert out[1].s == "mail <EMAIL> then <IPV4> and <PHONE> done"
    assert (out[1].e, out[1].i, out[1].p) == (1, 1, 1)
    assert out[2].s == "no pii here at all"
    assert (out[2].e, out[2].i, out[2].p) == (0, 0, 0)


def test_mixture_plan_rates_and_quota_composition(spark):
    """Budgets → keep rates: clamp at 1.0 when under-budget is
    impossible, 0.0 for unbudgeted sources; DataFrame targets match
    the dict path; rates compose with quota_sample."""
    from scrapy_rs_spark.operators.curation import mixture_plan, quota_sample

    docs = spark.createDataFrame(
        [
            ("a", i, 100) for i in range(10)      # a: 10 docs × 100 = 1000
        ] + [
            ("b", 100 + i, 200) for i in range(5) # b: 5 docs × 200 = 1000
        ] + [
            ("c", 200, 300)                       # c: unbudgeted
        ],
        "source string, doc_id long, n_tokens long",
    )
    plan = {
        r["source"]: r
        for r in mixture_plan(
            docs, {"a": 250, "b": 5000}, weight_col="n_tokens"
        ).collect()
    }
    a, b, c = plan["a"], plan["b"], plan["c"]
    assert (a["n_docs"], a["total_weight"], a["target_weight"]) == (10, 1000, 250)
    assert a["keep_rate"] == 0.25
    assert b["keep_rate"] == 1.0  # target 5000 > total 1000 → clamp
    assert (c["target_weight"], c["keep_rate"]) == (0, 0.0)

    tdf = spark.createDataFrame(
        [("a", 250), ("b", 5000)], "source string, target_weight long"
    )
    plan_df = {
        r["source"]: r["keep_rate"]
        for r in mixture_plan(docs, tdf, weight_col="n_tokens").collect()
    }
    assert plan_df == {k: v["keep_rate"] for k, v in plan.items()}

    rates = {k: v["keep_rate"] for k, v in plan.items()}
    kept = quota_sample(docs, rates, group_col="source", key_col="doc_id")
    kept_by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert kept_by_src.get("b") == 5       # rate 1.0 keeps all
    assert "c" not in kept_by_src          # rate 0.0 drops all
    assert 0 < kept_by_src.get("a", 0) < 10
