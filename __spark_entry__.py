"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator slice from SURVEY.md §2
(crawl-engine operators over an events-derived synthetic frontier, plus
the training-data curation ops over documents/embeddings); ``oracle_sql()``
gives the DuckDB-equivalent SQL. Spark sides run through the REAL engine
operators (scrapy_rs_spark.operators/functions); oracles are handwritten
ANSI SQL — structural parity is validated by tools/check_oracle.py, which
replicates the driver's sorted-value comparison locally.

Cross-engine hashing uses md5-hex-derived integers (functions.analysis.h32)
so values (not just row counts) match DuckDB bit-for-bit; per-row float
expressions are rounded in BOTH engines at the same precision.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


# ---------------------------------------------------------------------------
# derived synthetic frontier from the events table — identical construction
# on both engines (SURVEY.md §2: frontier row = url/host/priority/depth/seq)
# ---------------------------------------------------------------------------

def _frontier_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")["events"]
    host_num = F.col("user_id") % 50
    return ev.select(
        F.concat(
            F.lit("http://host"), host_num.cast("string"),
            F.lit(".test/page/"), F.col("event_id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("host"), host_num.cast("string"), F.lit(".test")).alias("host"),
        host_num.cast("int").alias("host_num"),
        (F.col("event_id") % 100).cast("int").alias("priority"),
        (F.col("event_id") % 7).cast("int").alias("depth"),
        (F.col("event_id") % 4).cast("int").alias("retry_count"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 10 == 0, 500)
        .when(F.col("event_id") % 10 == 1, 503)
        .when(F.col("event_id") % 10 == 2, 429)
        .when(F.col("event_id") % 10 == 3, 404)
        .when(F.col("event_id") % 10 == 4, 301)
        .otherwise(200)
        .cast("int")
        .alias("status"),
        F.col("ts"),
    ).withColumn("discovery_round", F.lit(0)).withColumn(
        "discovery_seq", F.col("seq")
    )


_FRONTIER_CTE = """
frontier AS (
  SELECT
    'http://host' || CAST(user_id % 50 AS STRING) || '.test/page/'
      || CAST(event_id AS STRING) AS url,
    'host' || CAST(user_id % 50 AS STRING) || '.test' AS host,
    CAST(user_id % 50 AS INT) AS host_num,
    CAST(event_id % 100 AS INT) AS priority,
    CAST(event_id % 7 AS INT) AS depth,
    CAST(event_id % 4 AS INT) AS retry_count,
    event_id AS seq,
    CAST(CASE CAST(event_id % 10 AS INT)
      WHEN 0 THEN 500 WHEN 1 THEN 503 WHEN 2 THEN 429
      WHEN 3 THEN 404 WHEN 4 THEN 301 ELSE 200 END AS INT) AS status,
    ts
  FROM events
)"""

_W1_ORDER = "priority DESC, depth ASC, seq ASC, url ASC"


# ---------------------------------------------------------------------------
# dialect helpers for oracle/spark SQL parity where DataFrame API isn't used
# ---------------------------------------------------------------------------

def _h32_duck(e: str) -> str:
    return f"CAST('0x' || substr(md5({e}), 1, 8) AS BIGINT)"


def _words_cte_duck(src: str = "documents") -> str:
    return (
        f"words AS (SELECT doc_id,"
        f" generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,"
        f" unnest(string_split(text, ' ')) AS w FROM {src})"
    )


# exact cosine top-k oracle — shared by cosine_topk and the two exact
# anchors of the approximate-ANN family (full-probe IVF, 0-plane LSH),
# which are provably brute-force-equivalent at those parameters.
_COSINE_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 10),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  round(round(list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]),
                      CAST(q.qv AS DOUBLE[])), 6), 4) AS score,
                  round(list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]),
                      CAST(q.qv AS DOUBLE[])), 6) AS score6
           FROM embeddings e, q)
SELECT query_id, neighbor_id, score, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY score6 DESC, neighbor_id ASC) AS rn FROM scored)
WHERE rn <= 5"""


_SHINGLES_DUCK = """
shingled AS (
  SELECT doc_id, pos,
         w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle,
         lead(w, 2) OVER win AS w2
  FROM words
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
shingles AS (SELECT doc_id, pos, shingle FROM shingled WHERE w2 IS NOT NULL)"""


# ---------------------------------------------------------------------------
# queries (Spark side — real engine operators)
# ---------------------------------------------------------------------------

def _q_frontier_rank_priority(spark, sf_dir):
    """W1: global priority-order top-k (TakeOrderedAndProject)."""
    from scrapy_rs_spark.operators.scheduler import frontier_order, take_batch

    fr = _frontier_df(spark, sf_dir)
    order = frontier_order("memory", "priority")
    return take_batch(fr, order, 100).select(
        "url", "host", "priority", "depth", "batch_rank"
    )


def _q_frontier_rank_bfs(spark, sf_dir):
    """C11+W1: breadth_first strategy (effective priority = -depth)."""
    from scrapy_rs_spark.operators.scheduler import frontier_order, take_batch

    fr = _frontier_df(spark, sf_dir)
    order = frontier_order("memory", "breadth_first")
    return take_batch(fr, order, 100).select("url", "depth", "batch_rank")


def _q_seen_antijoin(spark, sf_dir):
    """F1/J1: seen-set membership via left-anti join on md5-derived key."""
    from scrapy_rs_spark.functions.analysis import h32
    from scrapy_rs_spark.operators.dedup import anti_join_seen

    fr = _frontier_df(spark, sf_dir).withColumn("url_hash", h32(F.col("url")))
    seen = fr.filter(F.col("seq") % 3 == 0).select("url_hash")
    return anti_join_seen(fr, seen).select("url", "host")


def _q_inbatch_dedup(spark, sf_dir):
    """F2: deterministic in-batch winner per identity."""
    from scrapy_rs_spark.operators.dedup import dedup_in_batch

    fr = _frontier_df(spark, sf_dir).withColumn(
        "url_hash", (F.col("seq") % 497).cast("bigint")
    )
    return dedup_in_batch(fr).select(
        F.col("url_hash").alias("identity"), "url", "priority"
    )


def _q_depth_filter(spark, sf_dir):
    """F3 + A2: depth limit then per-domain counts."""
    fr = _frontier_df(spark, sf_dir)
    return (
        fr.filter(F.col("depth") <= 2)
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _q_domain_topk(spark, sf_dir):
    """W2: per-domain priority rank, top-3 per host (salted two-phase)."""
    from scrapy_rs_spark.functions.analysis import h32
    from scrapy_rs_spark.operators.scheduler import frontier_order, per_host_topk

    fr = _frontier_df(spark, sf_dir).withColumn("url_hash", h32(F.col("url")))
    order = frontier_order("domain_group", "priority")
    return per_host_topk(fr, 3, order, salts=2).select(
        "host", "url", "priority", "host_rank"
    )


def _q_domain_counts(spark, sf_dir):
    """A2: requests per domain."""
    fr = _frontier_df(spark, sf_dir)
    return fr.groupBy("host").agg(F.count("*").cast("bigint").alias("n"))


def _q_effective_priority(spark, sf_dir):
    """C11: crawl-strategy effective priority transforms."""
    from scrapy_rs_spark.operators.scheduler import effective_priority_col

    fr = _frontier_df(spark, sf_dir)
    return fr.select(
        "url",
        effective_priority_col("priority").alias("eff_priority").cast("int"),
        effective_priority_col("breadth_first").cast("int").alias("eff_bfs"),
        effective_priority_col("depth_first").cast("int").alias("eff_dfs"),
    )


def _q_retry_backoff(spark, sf_dir):
    """X5/J5: retryable classification + exponential backoff, capped."""
    from scrapy_rs_spark.operators.fetch import RETRYABLE_STATUSES

    fr = _frontier_df(spark, sf_dir)
    backoff = F.least(
        F.lit(1000.0) * F.pow(F.lit(2.0), F.col("retry_count").cast("double")),
        F.lit(60000.0),
    ).cast("bigint")
    return fr.filter(F.col("status").isin(RETRYABLE_STATUSES)).select(
        "url", "status", "retry_count", backoff.alias("backoff_ms")
    )


def _q_robots_filter(spark, sf_dir):
    """J3: RFC 9309 prefix Disallow via broadcast policy join."""
    from scrapy_rs_spark.operators.scheduler import robots_filter

    fr = _frontier_df(spark, sf_dir).withColumn("url_canon", F.col("url"))
    robots = (
        fr.select("host", "host_num")
        .distinct()
        .filter(F.col("host_num") % 5 == 0)
        .select(
            "host",
            F.array(F.lit("/page/1")).alias("disallow_prefixes"),
        )
    )
    return robots_filter(fr, robots).select("url", "host")


def _q_politeness_budget(spark, sf_dir):
    """T1: per-host round budget = floor(round/delay), rank ≤ budget."""
    from scrapy_rs_spark.functions.analysis import h32
    from scrapy_rs_spark.operators.scheduler import frontier_order, per_host_topk

    fr = (
        _frontier_df(spark, sf_dir)
        .withColumn("url_hash", h32(F.col("url")))
        .withColumn("budget", (F.lit(1) + F.col("host_num") % 4).cast("int"))
    )
    order = frontier_order("domain_group", "priority")
    return per_host_topk(fr, F.col("budget"), order, salts=2).select(
        "host", "url", "host_rank", "budget"
    )


def _q_redirect_resolve(spark, sf_dir):
    """C6: redirect detection + Location resolution (via the real
    urljoin pandas UDF — oracle recomputes with pure SQL concat)."""
    from scrapy_rs_spark.functions.url import urljoin_udf

    fr = _frontier_df(spark, sf_dir)
    red = fr.filter(F.col("status") == 301).withColumn(
        "location",
        F.concat(F.lit("/page/"), (F.col("seq") + 1).cast("string")),
    )
    return red.select(
        "url", urljoin_udf(F.col("url"), F.col("location")).alias("resolved")
    )


def _q_error_rollup(spark, sf_dir):
    """A3: error stats by class × host."""
    fr = _frontier_df(spark, sf_dir)
    cls = (
        F.when(F.col("status") < 300, "2xx")
        .when(F.col("status") < 400, "3xx")
        .when(F.col("status") < 500, "4xx")
        .otherwise("5xx")
    )
    return (
        fr.withColumn("status_class", cls)
        .groupBy("host", "status_class")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _q_rate_metrics(spark, sf_dir):
    """A4: per-round request counts + lag delta."""
    from pyspark.sql.window import Window

    fr = _frontier_df(spark, sf_dir).withColumn(
        "round", (F.col("seq") % 20).cast("int")
    )
    per = fr.groupBy("round").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.orderBy("round")
    return per.withColumn("delta", F.col("n") - F.lag("n").over(w))


def _q_fifo_order(spark, sf_dir):
    """W5: FIFO arrival order (ts, url), top-50."""
    fr = _frontier_df(spark, sf_dir)
    return (
        fr.orderBy(F.col("ts").asc(), F.col("url").asc())
        .limit(50)
        .select("url", F.unix_timestamp("ts").alias("epoch_s"))
    )


def _q_url_canonicalize(spark, sf_dir):
    """C1: the real canonicalization UDF vs a closed-form expected URL
    (uppercase scheme/host lowered, default port stripped, fragment
    dropped — rust-url parity corpus)."""
    from scrapy_rs_spark.functions.url import canonicalize_url_udf

    fr = _frontier_df(spark, sf_dir).filter(F.col("seq") % 11 == 0)
    raw = F.concat(
        F.lit("HTTP://Host"), F.col("host_num").cast("string"),
        F.lit(".TEST:80/Page/"), F.col("seq").cast("string"), F.lit("#frag"),
    )
    return fr.select(
        raw.alias("raw"), canonicalize_url_udf(raw).alias("canon")
    )


def _q_json_extract(spark, sf_dir):
    """C5: body→json parsing (get_json_object over the events.props
    JSON column; reference serde_json::from_str, response.rs:81-84)."""
    ev = _load(spark, sf_dir, "events")["events"]
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
    ).filter(F.col("k") > 50)


def _q_dedup_exact(spark, sf_dir):
    from scrapy_rs_spark.operators.textdedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")["documents"]
    return exact_dedup(docs)


def _q_minhash_signatures(spark, sf_dir):
    from scrapy_rs_spark.operators.textdedup import minhash_signatures

    docs = _load(spark, sf_dir, "documents")["documents"]
    return minhash_signatures(docs, bands=8)


def _q_lsh_pairs(spark, sf_dir):
    from scrapy_rs_spark.operators.textdedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    both = docs.select("doc_id", "text").unionByName(dup)
    return lsh_candidate_pairs(minhash_signatures(both, bands=8))


def _q_dedup_clusters(spark, sf_dir):
    """Connected-component dedup clustering over the LSH candidate
    graph — the keep-one-per-cluster step after pair generation.
    Iterative min-label propagation vs a DuckDB recursive CTE.
    Uses lsh_star_edges (bucket→hub contraction): identical components
    to the all-pairs list at O(Σk) instead of O(Σk²) edges."""
    from scrapy_rs_spark.operators.textdedup import (
        dedup_clusters,
        lsh_star_edges,
        minhash_signatures,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    both = docs.select("doc_id", "text").unionByName(dup)
    edges = lsh_star_edges(minhash_signatures(both, bands=8))
    return dedup_clusters(edges)


def _q_simhash(spark, sf_dir):
    from scrapy_rs_spark.operators.textdedup import simhash

    docs = _load(spark, sf_dir, "documents")["documents"]
    return simhash(docs, bits=32)


def _q_ngram_jaccard(spark, sf_dir):
    from scrapy_rs_spark.operators.textdedup import ngram_jaccard

    docs = _load(spark, sf_dir, "documents")["documents"]
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    pairs = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") + 1 <= mx)
    ).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    return ngram_jaccard(docs, pairs)


def _q_lang_id(spark, sf_dir):
    from scrapy_rs_spark.functions.analysis import lang_id_heuristic

    docs = _load(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", lang_id_heuristic("text").alias("pred"))


def _q_quality_score(spark, sf_dir):
    from scrapy_rs_spark.functions.analysis import quality_score

    docs = _load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )


def _q_token_count(spark, sf_dir):
    from scrapy_rs_spark.functions.analysis import (
        token_count_regex,
        token_count_ws,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        token_count_ws("text").cast("bigint").alias("n_ws"),
        token_count_regex("text").cast("bigint").alias("n_re"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _q_doc_fingerprint(spark, sf_dir):
    from scrapy_rs_spark.functions.analysis import fingerprint

    docs = _load(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", fingerprint("text").alias("fp"))


def _q_cosine_topk(spark, sf_dir):
    from scrapy_rs_spark.operators.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
    )


def _q_embedding_neardup(spark, sf_dir):
    from scrapy_rs_spark.operators.similarity import cosine_near_dup_pairs

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    out = cosine_near_dup_pairs(emb, threshold=0.30, max_id=300)
    return out.select("id_a", "id_b", F.round("score", 4).alias("score"))


def _ann_recall_flags(queries_df, approx, exact, min_hits: int):
    """Per-query self-verification for an approximate ANN path: count
    how many of the exact top-5 the approximate top-5 found, compare
    against a pinned integer floor (no float-equality hazards). The
    oracle asserts the floor always holds, so a recall regression in
    the approximate operator is a HASH MISMATCH, not a silent decay."""
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    per = hits.groupBy("query_id").agg(F.count("*").alias("n_hit"))
    return (
        queries_df.select("query_id")
        .join(per, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) >= min_hits)
            .cast("int")
            .alias("recall_ok"),
        )
    )


def _q_ann_lsh(spark, sf_dir):
    """Approximate NN via SRP-LSH buckets (n_planes=4) — self-verifying:
    emits per-query recall@5-vs-brute-force floor flags (≥1 of the
    exact top-5 found; planes are seed-42 deterministic, so the driver
    hash-checks the floor). The raw top-k path itself is exactness-
    anchored by ann_lsh_exact (0 planes ≡ brute force)."""
    from scrapy_rs_spark.operators.similarity import (
        brute_force_topk,
        lsh_ann_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = lsh_ann_topk(emb, queries, k=5, n_planes=4)
    exact = brute_force_topk(emb, queries, k=5)
    return _ann_recall_flags(queries, approx, exact, min_hits=1)


def _q_ann_ivf(spark, sf_dir):
    """IVF approximate NN (8 lists, n_probe=3) — self-verifying like
    ann_lsh: per-query floor of ≥2 of the exact top-5 found (measured
    min recall 0.4 at sf0.01/sf0.1; deterministic seeded k-means). The
    raw path is exactness-anchored by ann_ivf_fullprobe."""
    from scrapy_rs_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivf_ann_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    exact = brute_force_topk(emb, queries, k=5)
    return _ann_recall_flags(queries, approx, exact, min_hits=2)


def _q_ann_ivf_fullprobe(spark, sf_dir):
    """IVF with n_probe = n_centroids scans every inverted list, so the
    result is provably identical to brute force — the hash-checked
    exact anchor for the approximate IVF family (shares the
    cosine_topk oracle)."""
    from scrapy_rs_spark.operators.similarity import ivf_ann_topk

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_ann_topk(emb, queries, k=5, n_centroids=8, n_probe=8,
                       kmeans_iters=0)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
    )


def _q_ann_lsh_exact(spark, sf_dir):
    """SRP-LSH with n_planes = 0 puts every vector in one bucket, so
    the bucket join degenerates to brute force — the hash-checked
    exact anchor for the LSH family (shares the cosine_topk oracle)."""
    from scrapy_rs_spark.operators.similarity import lsh_ann_topk

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_ann_topk(emb, queries, k=5, n_planes=0)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
    )


def _q_neardup_lsh(spark, sf_dir):
    """Banded multi-table SRP near-dup pairs (8 bands × 8 planes) —
    self-verifying single-row summary the driver hash-checks:

      * subset_violations: LSH pairs in the id<300 region that the
        exact all-pairs baseline does NOT contain — must be 0 (LSH
        scores pairs exactly, so any pair ≥ threshold is exact-true).
      * recall_ok: LSH finds ≥5% of the exact pairs in that region
        (measured ~10.2-10.8%, matching banded-LSH theory
        1-(1-p^r)^b ≈ 10% at cos 0.25 on this corpus).
      * candidate_bound_ok: scored candidates ≤ 2·b·n²/2^r — 4× the
        uniform-bucket expectation n²/64 (measured ~1.17×), i.e. the
        join NEVER degenerates toward all-pairs.

    All three are integer/flag comparisons, deterministic (seed-42
    planes), so a recall or blowup regression is a hash mismatch."""
    from scrapy_rs_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_with_norms,
        lsh_band_candidates,
    )

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    # ONE candidate generation feeds both the scored-pairs check and
    # the candidate bound (it was previously computed twice — once
    # inside lsh_near_dup_pairs and once for the bound), and the exact
    # baseline is materialized once for its three consumers. Scoring
    # below is lsh_near_dup_pairs' own expression, verbatim.
    cands = lsh_band_candidates(emb, 8, 8).localCheckpoint(eager=False)
    pairs = cands.select(
        "id_a",
        "id_b",
        F.round(
            cosine_with_norms(
                F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")
            ),
            6,
        ).alias("score"),
    ).filter(F.col("score") >= 0.25)
    capped = pairs.filter(
        (F.col("id_a") < 300) & (F.col("id_b") < 300)
    ).select("id_a", "id_b")
    exact = (
        cosine_near_dup_pairs(emb, threshold=0.25, max_id=300)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    viol = capped.join(exact, ["id_a", "id_b"], "left_anti").agg(
        F.count("*").alias("subset_violations")
    )
    hit = exact.join(capped, ["id_a", "id_b"], "left_semi").agg(
        F.count("*").alias("__n_hit")
    )
    ex_n = exact.agg(F.count("*").alias("__n_exact"))
    cand_n = cands.agg(F.count("*").alias("__n_cand"))
    corp_n = emb.agg(F.count("*").alias("__n"))
    row = (
        viol.crossJoin(hit).crossJoin(ex_n).crossJoin(cand_n).crossJoin(corp_n)
    )
    return row.select(
        F.col("subset_violations").cast("bigint").alias("subset_violations"),
        (F.col("__n_hit") * 20 >= F.col("__n_exact"))
        .cast("int")
        .alias("recall_ok"),
        (
            F.col("__n_cand").cast("double")
            <= F.lit(2.0 * 8.0 / 256.0)
            * F.col("__n").cast("double")
            * F.col("__n").cast("double")
        )
        .cast("int")
        .alias("candidate_bound_ok"),
    )


def _q_multimodal_decode(spark, sf_dir):
    """Binary-column plumbing (mapInPandas, stubbed decoder). The
    feature vector is posexploded to (id, dim, value) rows so the
    driver can canonicalize them, and the deterministic fake feature
    (chunk sums of payload bytes mod 997) is recomputed byte-exactly
    by the DuckDB oracle."""
    from scrapy_rs_spark.operators.multimodal import decode_and_featurize

    docs = _load(spark, sf_dir, "documents")["documents"]
    payloads = docs.select(
        F.col("doc_id").alias("id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    out = decode_and_featurize(payloads)
    return out.select(
        "id", "n_bytes", "modality", F.posexplode("feature").alias("dim", "value")
    )


def _q_latest_snapshot(spark, sf_dir):
    """Snapshot selection: newest row per key (multi-capture pages
    table semantics, SURVEY §2.3) — events stand in as captures."""
    from scrapy_rs_spark.operators.curation import latest_snapshot

    ev = _load(spark, sf_dir, "events")["events"]
    out = latest_snapshot(
        ev, url_col="user_id", ts_col="ts",
        tiebreak=[F.col("event_id").desc()],
    )
    return out.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("epoch_s")
    )


def _q_split_by_hash(spark, sf_dir):
    """Deterministic train/val/test split: membership is a pure hash of
    the key, reproducible across engines and runs."""
    from scrapy_rs_spark.operators.curation import split_by_hash

    docs = _load(spark, sf_dir, "documents")["documents"]
    out = split_by_hash(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id"
    )
    return out.select("doc_id", "split")


def _q_pack_sequences(spark, sf_dir):
    """Streaming sequence packing: fixed-token-budget bins per
    hash-group via partitioned cumulative sums (never a global
    window)."""
    from scrapy_rs_spark.operators.curation import pack_sequences

    docs = _load(spark, sf_dir, "documents")["documents"]
    return pack_sequences(docs, max_tokens=500, n_groups=8)


def _q_dynamic_item_fields(spark, sf_dir):
    """DynamicItem columnar surface (reference core/src/item.rs:28-36):
    arbitrary extracted fields ride as MAP<STRING,STRING> on items;
    exploded to (doc_id, key, value) for the value-hash check."""
    docs = _load(spark, sf_dir, "documents")["documents"]
    fields = F.create_map(
        F.lit("n_chars"), F.length("text").cast("string"),
        F.lit("head"), F.substring("text", 1, 16),
    )
    return docs.select("doc_id", F.explode(fields).alias("key", "value"))


def _q_repetition_score(spark, sf_dir):
    """Gopher-style within-doc repetition feature: fraction of word
    bigrams that repeat an earlier bigram in the same document."""
    from scrapy_rs_spark.operators.textdedup import repetition_score

    docs = _load(spark, sf_dir, "documents")["documents"]
    return repetition_score(docs, n=2)


def _q_contamination(spark, sf_dir):
    """Benchmark contamination via 13-gram hash join (GPT-3/PaLM
    convention): benchmark = docs with doc_id%97==0; the corpus is the
    remaining docs plus PLANTED copies of the benchmark (id+100000) —
    the check must find exactly the planted copies."""
    from scrapy_rs_spark.operators.textdedup import contamination_check

    docs = _load(spark, sf_dir, "documents")["documents"]
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    corpus = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "text")
        .unionByName(
            bench.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        )
    )
    return contamination_check(corpus, bench, n=13)


def _q_quota_sample(spark, sf_dir):
    """Deterministic mixture sampling by language (training-mix
    balancing): keep-rate per lang, membership a pure hash of doc_id."""
    from scrapy_rs_spark.operators.curation import quota_sample

    docs = _load(spark, sf_dir, "documents")["documents"]
    out = quota_sample(
        docs, {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.5, "zh": 0.1}
    )
    return out.select("doc_id", "lang")


def _q_chunk_dedup(spark, sf_dir):
    """CCNet-style corpus-wide duplicated-passage removal over 10-word
    chunks; docs with doc_id%5==0 are planted twice (id+100000) so
    every chunk of theirs is corpus-duplicated and must be dropped
    from BOTH copies; unique docs keep all chunks."""
    from scrapy_rs_spark.operators.curation import chunk_dedup

    docs = _load(spark, sf_dir, "documents")["documents"]
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return chunk_dedup(corpus, chunk_words=10)


def _q_pii_scrub(spark, sf_dir):
    """PII redaction (email/ipv4/phone) as a codegen'd regexp_replace
    chain; the corpus carries no PII, so deterministic PII is appended
    per doc (identically in the oracle) and must be found+redacted."""
    from scrapy_rs_spark.functions.analysis import pii_count, pii_scrub

    docs = _load(spark, sf_dir, "documents")["documents"]
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        F.pmod(F.col("doc_id"), 256).cast("string"),
        F.lit(".0.1 call +1 555-010-0199"),
    )
    return docs.select(
        "doc_id",
        pii_scrub(t).alias("scrubbed"),
        pii_count(t, "email").cast("bigint").alias("n_email"),
        pii_count(t, "ipv4").cast("bigint").alias("n_ip"),
        pii_count(t, "phone").cast("bigint").alias("n_phone"),
    )


def _q_crawl_bfs(spark, sf_dir):
    """The crawl spine as an oracle-checked query: 3 BFS rounds over the
    closed-form (i+k+1)%N mock-site link graph — iterative DataFrame
    rounds (U1/F1/J1/W3) vs a DuckDB recursive CTE."""
    n_pages, links, max_depth = 50, 5, 3
    edges = (
        spark.range(0, n_pages)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(links)),
                    lambda k: F.pmod(F.col("id") + k, F.lit(n_pages)),
                )
            ).alias("dst"),
        )
        .distinct()
    )
    frontier = spark.createDataFrame([(0, 0)], "page_id BIGINT, min_depth INT")
    seen = frontier
    # bounded depth (3 rounds) → one lazily-composed plan: the frontier
    # and seen sides are tiny at every level, so they ride as broadcast
    # build sides and the whole BFS runs as a single Spark job with no
    # per-round materialization. (The production engine keeps per-round
    # checkpoints because its rounds are unbounded and committed; this
    # query's 3 fixed rounds need neither — guide §2.4/§3.1.)
    for d in range(1, max_depth + 1):
        nxt = (
            F.broadcast(frontier)
            .join(edges, frontier["page_id"] == edges["src"])
            .select(F.col("dst").alias("page_id"))
            .distinct()
            .join(F.broadcast(seen.select("page_id")), "page_id", "left_anti")
            .withColumn("min_depth", F.lit(d))
        )
        seen = seen.unionByName(nxt)
        frontier = nxt
    return seen


def _q_warc_roundtrip(spark, sf_dir):
    """WARC/WET ingestion correctness as a driver-gated round trip:
    every document becomes a WET ``conversion`` record
    (url http://warc.test/<doc_id>, WARC-Date epoch+doc_id, language
    header), records pack into 64 multi-member-gzip segment blobs, and
    the blobs are parsed back by the PRODUCTION streaming parser
    (sources/warc.py::parse_warc_file — the same kernel under
    read_warc). The reconstruction must equal the source table, so the
    oracle is a plain SELECT over documents: any framing, charset,
    gzip-member, or header regression becomes a driver hash mismatch.
    The per-segment packing is the fixture generator (a correctness
    harness, sized per-group ~N/64 docs); the 100-TB path is read_warc
    over real archive files, one task per segment file."""
    from scrapy_rs_spark.sources.warc import (
        build_conversion_record,
        gzip_member,
        parse_warc_file,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob = b"".join(
            gzip_member(
                build_conversion_record(
                    f"http://warc.test/{int(i)}",
                    1735689600 + int(i),
                    t,
                    lang=l if isinstance(l, str) else None,
                )
            )
            for i, t, l in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
        )
        return pd.DataFrame({"content": [blob]})

    segments = (
        docs.select(
            "doc_id",
            "text",
            "lang",
            F.pmod(F.col("doc_id"), F.lit(64)).alias("seg"),
        )
        .groupBy("seg")
        .applyInPandas(_pack, schema="content binary")
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for r in parse_warc_file(
                    "seg", bytes(content), frozenset({"conversion"})
                ):
                    rows.append(
                        (r[0], int(r[1].timestamp()), r[7], r[6])
                    )
            yield pd.DataFrame(
                rows, columns=["url", "ts_epoch", "lang", "text"]
            )

    return segments.mapInPandas(
        _parse,
        schema="url string, ts_epoch bigint, lang string, text string",
    )


def _q_sitemap_extract(spark, sf_dir):
    """Sitemap ingestion correctness, driver-gated: one urlset XML per
    documents.source group is synthesized JVM-side (loc/lastmod/
    priority all closed-form in doc_id), then parsed back by the
    production extractor (sources/sitemap.py::sitemap_entries —
    </url>-framed blocks + anchored regexp_extract, whole-stage
    codegen). Reconstruction must equal the closed form the oracle
    computes directly from documents."""
    from scrapy_rs_spark.sources.sitemap import sitemap_entries

    docs = _load(spark, sf_dir, "documents")["documents"]
    frag = F.concat(
        F.lit("<url><loc>http://warc.test/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>"),
        F.date_format(
            F.date_add(
                F.lit("2025-01-01").cast("date"),
                F.pmod(F.col("doc_id"), F.lit(365)).cast("int"),
            ),
            "yyyy-MM-dd",
        ),
        F.lit("</lastmod><priority>0."),
        F.pmod(F.col("doc_id"), F.lit(10)).cast("string"),
        F.lit("</priority></url>"),
    )
    sitemaps = (
        docs.groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("doc_id"), frag.alias("f"))
                        )
                    ),
                    lambda s: s["f"],
                ),
                "",
            ).alias("body")
        )
        .select(
            F.col("source").alias("url"),
            F.concat(
                F.lit("<urlset>"), F.col("body"), F.lit("</urlset>")
            ).cast("binary").alias("html"),
        )
    )
    return sitemap_entries(sitemaps).select(
        F.col("sitemap_url").alias("source"),
        "loc",
        "lastmod",
        "priority",
    )


def _q_recrawl_schedule(spark, sf_dir):
    """Freshness scheduling, driver-gated: a synthetic observation
    history closed-form in doc_id (doc d observed at rounds 0..d%5,
    hash stable within epochs of length 1+d%3) runs through the
    production operator (operators/recrawl.py::recrawl_schedule: lag
    window + partial agg, all-integer contract); the oracle recomputes
    the same schedule with DuckDB window functions."""
    from scrapy_rs_spark.operators.recrawl import recrawl_schedule

    docs = _load(spark, sf_dir, "documents")["documents"]
    hist = (
        docs.select(
            F.concat(
                F.lit("http://warc.test/"), F.col("doc_id").cast("string")
            ).alias("url"),
            F.explode(
                F.sequence(F.lit(0), F.pmod(F.col("doc_id"), F.lit(5)))
            ).alias("round"),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).alias("__e"),
        )
        .select(
            "url",
            F.col("round").cast("long").alias("round"),
            F.floor(F.col("round") / F.col("__e"))
            .cast("string")
            .alias("content_hash"),
        )
    )
    return recrawl_schedule(hist, current_round=10, max_interval=16)


def _q_backlink_priority(spark, sf_dir):
    """Link-analysis frontier priority, driver-gated: a skewed
    closed-form link graph (doc d links to d%97 and d%13 — hub nodes
    collect hundreds of in-links, most nodes none) runs through the
    production in-degree operator (operators/linkrank.py::
    backlink_priority, one partial agg); oracle recomputes the counts
    directly. PageRank's float scores are pytest-pinned instead
    (double aggregation is reduction-order-dependent — a cross-engine
    hash would be a flaky gate; see linkrank.py docstring)."""
    from scrapy_rs_spark.operators.linkrank import backlink_priority

    docs = _load(spark, sf_dir, "documents")["documents"]
    edges = (
        docs.select(
            F.col("doc_id"),
            F.explode(
                F.array(
                    F.pmod(F.col("doc_id"), F.lit(97)),
                    F.pmod(F.col("doc_id"), F.lit(13)),
                )
            ).alias("__t"),
        )
        .select(
            F.concat(
                F.lit("http://warc.test/"), F.col("doc_id").cast("string")
            ).alias("src"),
            F.concat(
                F.lit("http://warc.test/"), F.col("__t").cast("string")
            ).alias("dst"),
        )
        .distinct()
    )
    return backlink_priority(edges)


def _q_mixture_plan(spark, sf_dir):
    """Mixture planning, driver-gated: per-source char budgets
    closed-form in the source index (2500·(idx+1)) → the production
    operator (operators/curation.py::mixture_plan: one partial agg +
    broadcast budget join); counts/weights are exact integers and
    keep_rate a single IEEE division, so the oracle's recomputation
    hashes exactly."""
    from scrapy_rs_spark.operators.curation import mixture_plan

    docs = _load(spark, sf_dir, "documents")["documents"]
    targets = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                (F.substring(F.col("source"), 4, 10).cast("int") + 1)
                * 2500
            ).cast("long").alias("target_weight"),
        )
    )
    return mixture_plan(docs, targets, weight_col="n_chars")


def _q_host_backoff(spark, sf_dir):
    """Per-host circuit breaker, driver-gated: a closed-form attempt
    history (doc d attempts rounds 0..d%4 against host h<d%37>, ok
    when (d+round)%3==0) through the production operator
    (operators/recrawl.py::host_backoff); oracle recomputes last-
    success, trailing failures, trip, and exponential cooldown with
    the same integer arithmetic."""
    from scrapy_rs_spark.operators.recrawl import host_backoff

    docs = _load(spark, sf_dir, "documents")["documents"]
    att = (
        docs.select(
            F.col("doc_id"),
            F.concat(
                F.lit("h"), F.pmod(F.col("doc_id"), F.lit(37)).cast("string")
            ).alias("host"),
            F.explode(
                F.sequence(F.lit(0), F.pmod(F.col("doc_id"), F.lit(4)))
            ).alias("round"),
        )
        .select(
            "host",
            F.col("round").cast("long").alias("round"),
            F.when(
                F.pmod(F.col("doc_id") + F.col("round"), F.lit(3)) == 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("ok"),
        )
    )
    return host_backoff(att, current_round=10, threshold=2)


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: W1 frontier ranking on sf0.001."""
    return _q_frontier_rank_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_rank_priority": _q_frontier_rank_priority,
        "frontier_rank_bfs": _q_frontier_rank_bfs,
        "seen_antijoin": _q_seen_antijoin,
        "inbatch_dedup": _q_inbatch_dedup,
        "depth_filter": _q_depth_filter,
        "domain_topk": _q_domain_topk,
        "domain_counts": _q_domain_counts,
        "effective_priority": _q_effective_priority,
        "retry_backoff": _q_retry_backoff,
        "robots_filter": _q_robots_filter,
        "politeness_budget": _q_politeness_budget,
        "redirect_resolve": _q_redirect_resolve,
        "error_rollup": _q_error_rollup,
        "rate_metrics": _q_rate_metrics,
        "fifo_order": _q_fifo_order,
        "url_canonicalize": _q_url_canonicalize,
        "json_extract": _q_json_extract,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash_signatures,
        "lsh_pairs": _q_lsh_pairs,
        "simhash": _q_simhash,
        "dedup_clusters": _q_dedup_clusters,
        "ngram_jaccard": _q_ngram_jaccard,
        "lang_id": _q_lang_id,
        "quality_score": _q_quality_score,
        "token_count": _q_token_count,
        "doc_fingerprint": _q_doc_fingerprint,
        "cosine_topk": _q_cosine_topk,
        "embedding_neardup": _q_embedding_neardup,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "ann_ivf_fullprobe": _q_ann_ivf_fullprobe,
        "ann_lsh_exact": _q_ann_lsh_exact,
        "neardup_lsh": _q_neardup_lsh,
        "multimodal_decode": _q_multimodal_decode,
        "dynamic_item_fields": _q_dynamic_item_fields,
        "latest_snapshot": _q_latest_snapshot,
        "split_by_hash": _q_split_by_hash,
        "pack_sequences": _q_pack_sequences,
        "repetition_score": _q_repetition_score,
        "contamination": _q_contamination,
        "quota_sample": _q_quota_sample,
        "chunk_dedup": _q_chunk_dedup,
        "pii_scrub": _q_pii_scrub,
        "crawl_bfs": _q_crawl_bfs,
        "warc_roundtrip": _q_warc_roundtrip,
        "sitemap_extract": _q_sitemap_extract,
        "recrawl_schedule": _q_recrawl_schedule,
        "backlink_priority": _q_backlink_priority,
        "mixture_plan": _q_mixture_plan,
        "host_backoff": _q_host_backoff,
    }


# 13-gram concat chain for the contamination oracle (lead(w,1..12))
_LEAD13 = " || ' ' || ".join(
    ["w"] + [f"lead(w, {i}) OVER win" for i in range(1, 13)]
)


def oracle_sql() -> dict[str, str]:
    from scrapy_rs_spark.functions.analysis import PII_PATTERNS as _PII

    h = _h32_duck
    stop = "['the','a','an','and','of','to','in','is','it','that','for','on','with','as','are','was','this','by','be','or']"
    return {
        "frontier_rank_priority": f"""
WITH {_FRONTIER_CTE}
SELECT url, host, priority, depth, CAST(rn AS INT) AS batch_rank
FROM (SELECT *, row_number() OVER (ORDER BY {_W1_ORDER}) AS rn FROM frontier)
WHERE rn <= 100""",
        "frontier_rank_bfs": f"""
WITH {_FRONTIER_CTE}
SELECT url, depth, CAST(rn AS INT) AS batch_rank
FROM (SELECT *, row_number() OVER
      (ORDER BY -depth DESC, depth ASC, seq ASC, url ASC) AS rn FROM frontier)
WHERE rn <= 100""",
        "seen_antijoin": f"""
WITH {_FRONTIER_CTE},
hashed AS (SELECT *, {h('url')} AS url_hash FROM frontier),
seen AS (SELECT url_hash FROM hashed WHERE seq % 3 = 0)
SELECT url, host FROM hashed
WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url_hash = hashed.url_hash)""",
        "inbatch_dedup": f"""
WITH {_FRONTIER_CTE},
keyed AS (SELECT *, CAST(seq % 497 AS BIGINT) AS identity FROM frontier)
SELECT identity, url, priority
FROM (SELECT *, row_number() OVER (PARTITION BY identity
      ORDER BY priority DESC, depth ASC, discovery_round ASC,
               seq ASC, url ASC) AS rn
      FROM (SELECT *, 0 AS discovery_round FROM keyed))
WHERE rn = 1""",
        "depth_filter": f"""
WITH {_FRONTIER_CTE}
SELECT host, COUNT(*) AS n FROM frontier WHERE depth <= 2 GROUP BY host""",
        "domain_topk": f"""
WITH {_FRONTIER_CTE}
SELECT host, url, priority, CAST(rn AS INT) AS host_rank
FROM (SELECT *, row_number() OVER (PARTITION BY host ORDER BY {_W1_ORDER}) AS rn
      FROM frontier)
WHERE rn <= 3""",
        "domain_counts": f"""
WITH {_FRONTIER_CTE}
SELECT host, COUNT(*) AS n FROM frontier GROUP BY host""",
        "effective_priority": f"""
WITH {_FRONTIER_CTE}
SELECT url, priority AS eff_priority, CAST(-depth AS INT) AS eff_bfs,
       depth AS eff_dfs
FROM frontier""",
        "retry_backoff": f"""
WITH {_FRONTIER_CTE}
SELECT url, status, retry_count,
       CAST(least(1000.0 * pow(2.0, CAST(retry_count AS DOUBLE)), 60000.0)
            AS BIGINT) AS backoff_ms
FROM frontier WHERE status IN (408, 429, 500, 502, 503, 504)""",
        "robots_filter": f"""
WITH {_FRONTIER_CTE}
SELECT url, host FROM frontier
WHERE NOT (host_num % 5 = 0
           AND ('/page/' || CAST(seq AS STRING)) LIKE '/page/1%')""",
        "politeness_budget": f"""
WITH {_FRONTIER_CTE},
budgeted AS (SELECT *, CAST(1 + host_num % 4 AS INT) AS budget FROM frontier)
SELECT host, url, CAST(rn AS INT) AS host_rank, budget
FROM (SELECT *, row_number() OVER (PARTITION BY host ORDER BY {_W1_ORDER}) AS rn
      FROM budgeted)
WHERE rn <= budget""",
        "redirect_resolve": f"""
WITH {_FRONTIER_CTE}
SELECT url,
       'http://host' || CAST(host_num AS STRING) || '.test/page/'
         || CAST(seq + 1 AS STRING) AS resolved
FROM frontier WHERE status = 301""",
        "error_rollup": f"""
WITH {_FRONTIER_CTE}
SELECT host,
       CASE WHEN status < 300 THEN '2xx' WHEN status < 400 THEN '3xx'
            WHEN status < 500 THEN '4xx' ELSE '5xx' END AS status_class,
       COUNT(*) AS n
FROM frontier GROUP BY 1, 2""",
        "rate_metrics": f"""
WITH {_FRONTIER_CTE},
per AS (SELECT CAST(seq % 20 AS INT) AS round, COUNT(*) AS n
        FROM frontier GROUP BY 1)
SELECT round, n, n - lag(n) OVER (ORDER BY round) AS delta FROM per""",
        "fifo_order": f"""
WITH {_FRONTIER_CTE}
SELECT url, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM frontier ORDER BY ts ASC, url ASC LIMIT 50""",
        "url_canonicalize": f"""
WITH {_FRONTIER_CTE}
SELECT 'HTTP://Host' || CAST(host_num AS STRING) || '.TEST:80/Page/'
         || CAST(seq AS STRING) || '#frag' AS raw,
       'http://host' || CAST(host_num AS STRING) || '.test/Page/'
         || CAST(seq AS STRING) AS canon
FROM frontier WHERE seq % 11 = 0""",
        "json_extract": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1""",
        "minhash_signatures": f"""
WITH {_words_cte_duck()},{_SHINGLES_DUCK}
SELECT doc_id, CAST({h('shingle')} % 8 AS INT) AS band,
       MIN(md5(shingle)) AS sig
FROM shingles GROUP BY doc_id, band""",
        "lsh_pairs": f"""
WITH docs2 AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 100000, text FROM documents),
{_words_cte_duck('docs2')},{_SHINGLES_DUCK},
sigs AS (SELECT doc_id, CAST({h('shingle')} % 8 AS INT) AS band,
                MIN(md5(shingle)) AS sig
         FROM shingles GROUP BY doc_id, band)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id""",
        "simhash": f"""
WITH {_words_cte_duck()},
hashed AS (SELECT doc_id, {h('w')} AS wh FROM words),
bits AS (SELECT doc_id, j, ((wh >> j) & 1) * 2 - 1 AS vote
         FROM hashed, (SELECT unnest(range(0, 32)) AS j)),
votes AS (SELECT doc_id, j, SUM(vote) AS v FROM bits GROUP BY doc_id, j)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id""",
        "dedup_clusters": f"""
WITH RECURSIVE docs2 AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 100000, text FROM documents),
{_words_cte_duck('docs2')},{_SHINGLES_DUCK},
sigs AS (SELECT doc_id, CAST({h('shingle')} % 8 AS INT) AS band,
                MIN(md5(shingle)) AS sig
         FROM shingles GROUP BY doc_id, band),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
          WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(node, lab) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node""",
        "ngram_jaccard": f"""
WITH {_words_cte_duck()},{_SHINGLES_DUCK},
sh AS (SELECT DISTINCT doc_id AS id, shingle FROM shingles),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
mx AS (SELECT MAX(doc_id) AS m FROM documents),
pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents, mx
          WHERE doc_id % 10 = 0 AND doc_id + 1 <= m),
inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
          FROM pairs p
          JOIN sh a ON a.id = p.id_a
          JOIN sh b ON b.id = p.id_b AND b.shingle = a.shingle
          GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b,
       round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.id = p.id_a
JOIN sizes sb ON sb.id = p.id_b
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b""",
        "lang_id": f"""
SELECT doc_id,
       CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                 w -> list_contains({stop}, lower(w)))) AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1) >= 0.08
            THEN 'en' ELSE 'unknown' END AS pred
FROM documents""",
        "quality_score": f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
              w -> list_contains({stop}, lower(w)))) AS DOUBLE) AS n_stop,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
              AS DOUBLE) AS n_punct
  FROM documents)
SELECT doc_id,
       round(0.4 * least(n_words / 100.0, 1.0)
           + 0.3 * least(n_stop / greatest(n_words, 1.0) * 5.0, 1.0)
           + 0.2 * (CASE WHEN n_chars / greatest(n_words, 1.0) >= 3
                          AND n_chars / greatest(n_words, 1.0) <= 10
                         THEN 1.0 ELSE 0.5 END)
           + 0.1 * (1.0 - least(n_punct / greatest(n_chars, 1.0) * 10.0, 1.0)),
           6) AS quality
FROM base""",
        "token_count": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_re,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents""",
        "doc_fingerprint": """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents""",
        "cosine_topk": _COSINE_TOPK_SQL,
        "ann_ivf_fullprobe": _COSINE_TOPK_SQL,
        "ann_lsh_exact": _COSINE_TOPK_SQL,
        # self-verifying approximate paths: the Spark side computes the
        # recall/subset/candidate invariants against its own exact
        # anchors; the oracle asserts the invariants ALWAYS hold, so a
        # regression in the approximate operators is a hash mismatch
        "ann_lsh": """
SELECT vec_id AS query_id, CAST(1 AS INT) AS recall_ok
FROM embeddings WHERE vec_id < 10""",
        "ann_ivf": """
SELECT vec_id AS query_id, CAST(1 AS INT) AS recall_ok
FROM embeddings WHERE vec_id < 10""",
        "neardup_lsh": """
SELECT CAST(0 AS BIGINT) AS subset_violations,
       CAST(1 AS INT) AS recall_ok,
       CAST(1 AS INT) AS candidate_bound_ok""",
        "multimodal_decode": """
WITH base AS (SELECT doc_id AS id, text, CAST(length(text) AS BIGINT) AS n
              FROM documents),
bytes AS (SELECT id, n, text, unnest(range(0, n)) AS pos FROM base),
assigned AS (
  SELECT id, n,
         CASE WHEN pos < (n % 8) * (n // 8 + 1)
              THEN pos // (n // 8 + 1)
              ELSE (n % 8) + (pos - (n % 8) * (n // 8 + 1))
                   // greatest(n // 8, 1)
         END AS dim,
         ord(substr(text, CAST(pos + 1 AS INT), 1)) AS b
  FROM bytes)
SELECT id, n AS n_bytes, 'image' AS modality, CAST(dim AS INT) AS dim,
       CAST(SUM(b) % 997 AS DOUBLE) AS value
FROM assigned GROUP BY id, n, dim""",
        "embedding_neardup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6), 4)
         AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 300 AND b.vec_id < 300
  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.30""",
        "dynamic_item_fields": """
SELECT doc_id, 'n_chars' AS key, CAST(length(text) AS STRING) AS value
FROM documents
UNION ALL
SELECT doc_id, 'head' AS key, substr(text, 1, 16) AS value
FROM documents""",
        "latest_snapshot": """
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM (SELECT *, row_number() OVER
        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1""",
        "split_by_hash": f"""
WITH b AS (SELECT doc_id,
       {h("'split' || chr(0) || CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
       FROM documents)
SELECT doc_id,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b""",
        "pack_sequences": f"""
WITH g AS (SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST({h('CAST(doc_id AS VARCHAR)')} % 8 AS INT) AS group_id
       FROM documents)
SELECT doc_id, n_tokens, group_id,
       CAST(floor(COALESCE(SUM(n_tokens) OVER
           (PARTITION BY group_id ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 500.0) AS BIGINT) AS bin_id
FROM g""",
        "repetition_score": f"""
WITH {_words_cte_duck()},
bi AS (SELECT doc_id, w || ' ' || lead(w, 1) OVER win AS g,
              lead(w, 1) OVER win AS w1
       FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
grams AS (SELECT doc_id, g FROM bi WHERE w1 IS NOT NULL),
per AS (SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct
        FROM grams GROUP BY 1)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_distinct, 0) AS n_distinct,
       round(CASE WHEN COALESCE(p.n_grams, 0) > 0
                  THEN 1.0 - CAST(p.n_distinct AS DOUBLE) / p.n_grams
                  ELSE 0.0 END, 6) AS rep_ratio
FROM documents d LEFT JOIN per p USING (doc_id)""",
        "contamination": f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, text FROM documents
                WHERE doc_id % 97 = 0),
cw AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
              unnest(string_split(text, ' ')) AS w FROM corpus),
cg AS (SELECT doc_id, {_LEAD13} AS g, lead(w, 12) OVER win AS wl
       FROM cw WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
cgrams AS (SELECT doc_id, g FROM cg WHERE wl IS NOT NULL),
bw AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
              unnest(string_split(text, ' ')) AS w
       FROM documents WHERE doc_id % 97 = 0),
bg AS (SELECT doc_id, {_LEAD13} AS g, lead(w, 12) OVER win AS wl
       FROM bw WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
bgrams AS (SELECT DISTINCT g FROM bg WHERE wl IS NOT NULL)
SELECT doc_id, COUNT(DISTINCT g) AS n_contaminated_grams
FROM cgrams WHERE g IN (SELECT g FROM bgrams)
GROUP BY doc_id""",
        "quota_sample": f"""
SELECT doc_id, lang FROM documents
WHERE {h("'quota' || chr(0) || CAST(doc_id AS VARCHAR)")} % 10000 <
      CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 5000
                WHEN 'fr' THEN 2500 WHEN 'es' THEN 5000
                WHEN 'zh' THEN 1000 ELSE 0 END""",
        "chunk_dedup": """
WITH corpus AS (SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, text FROM documents
                WHERE doc_id % 5 = 0),
w AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS w FROM corpus),
chunks AS (SELECT doc_id, CAST(pos // 10 AS INT) AS chunk_id,
                  string_agg(w, ' ' ORDER BY pos) AS chunk
           FROM w GROUP BY 1, 2),
freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY 1)
SELECT c.doc_id,
       COALESCE(string_agg(c.chunk, ' ' ORDER BY c.chunk_id)
                FILTER (WHERE f.n_docs <= 1), '') AS text_clean,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_chunks
FROM chunks c JOIN freq f ON f.chunk = c.chunk
GROUP BY c.doc_id""",
        "pii_scrub": f"""
WITH t AS (SELECT doc_id,
       text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.0.1 call +1 555-010-0199' AS t
       FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII["email"]}', '<EMAIL>', 'g'),
           '{_PII["ipv4"]}', '<IPV4>', 'g'),
           '{_PII["phone"]}', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(t, '{_PII["email"]}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PII["ipv4"]}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(t, '{_PII["phone"]}')) AS BIGINT) AS n_phone
FROM t""",
        "crawl_bfs": """
WITH RECURSIVE edges AS (
  SELECT src, (src + k) % 50 AS dst
  FROM (SELECT unnest(range(0, 50)) AS src),
       (SELECT unnest(range(1, 6)) AS k)
),
bfs(page_id, min_depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT CAST(e.dst AS BIGINT), b.min_depth + 1
  FROM bfs b JOIN edges e ON e.src = b.page_id
  WHERE b.min_depth < 3
)
SELECT page_id, CAST(MIN(min_depth) AS INT) AS min_depth
FROM bfs GROUP BY page_id""",
        "warc_roundtrip": """
SELECT 'http://warc.test/' || CAST(doc_id AS VARCHAR) AS url,
       1735689600 + doc_id AS ts_epoch,
       lang,
       text
FROM documents""",
        "sitemap_extract": """
SELECT source,
       'http://warc.test/' || CAST(doc_id AS VARCHAR) AS loc,
       CAST(DATE '2025-01-01' + CAST(doc_id % 365 AS INTEGER) AS VARCHAR)
         AS lastmod,
       '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority
FROM documents""",
        "recrawl_schedule": """
WITH hist AS (
  SELECT 'http://warc.test/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(g.r AS BIGINT) AS round,
         CAST(CAST(FLOOR(g.r / (doc_id % 3 + 1)) AS BIGINT) AS VARCHAR)
           AS content_hash
  FROM documents, (SELECT unnest(range(0, 5)) AS r) g
  WHERE g.r <= doc_id % 5
),
lagged AS (
  SELECT url, round, content_hash,
         LAG(content_hash) OVER (PARTITION BY url ORDER BY round) AS prev
  FROM hist
),
per AS (
  SELECT url,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND content_hash <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         CAST(MAX(round) AS BIGINT) AS last_seen
  FROM lagged GROUP BY url
),
sched AS (
  SELECT url, n_obs, n_changes, last_seen,
         CAST(10 - last_seen AS BIGINT) AS age,
         CAST(CASE WHEN n_changes > 0
                   THEN CEIL((n_obs - 1) / n_changes)
                   ELSE 16 END AS BIGINT) AS revisit_interval
  FROM per
)
SELECT url, n_obs, n_changes, last_seen, age, revisit_interval,
       last_seen + revisit_interval AS next_due,
       CAST(CASE WHEN last_seen + revisit_interval <= 10
                 THEN 1 ELSE 0 END AS INTEGER) AS due
FROM sched""",
        "backlink_priority": """
WITH e AS (
  SELECT DISTINCT
         'http://warc.test/' || CAST(doc_id AS VARCHAR) AS src,
         'http://warc.test/' || CAST(doc_id % m.k AS VARCHAR) AS dst
  FROM documents, (VALUES (97), (13)) m(k)
)
SELECT dst AS url, CAST(COUNT(*) AS BIGINT) AS backlinks
FROM e GROUP BY dst""",
        "mixture_plan": """
WITH agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_weight,
         CAST(2500 * (CAST(SUBSTR(source, 4) AS INTEGER) + 1) AS BIGINT)
           AS target_weight
  FROM documents GROUP BY source
)
SELECT source, n_docs, total_weight, target_weight,
       LEAST(1.0, target_weight / total_weight) AS keep_rate
FROM agg""",
        "host_backoff": """
WITH att AS (
  SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
         CAST(g.r AS BIGINT) AS round,
         CASE WHEN (doc_id + g.r) % 3 = 0 THEN 1 ELSE 0 END AS ok
  FROM documents, (SELECT unnest(range(0, 4)) AS r) g
  WHERE g.r <= doc_id % 4
),
per AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_attempts,
         CAST(MAX(CASE WHEN ok = 1 THEN round END) AS BIGINT)
           AS last_ok_round,
         CAST(MAX(round) AS BIGINT) AS last_round
  FROM att GROUP BY host
),
fails AS (
  SELECT a.host, CAST(COUNT(*) AS BIGINT) AS trailing_failures
  FROM att a JOIN per p ON a.host = p.host
  WHERE a.ok = 0
    AND (p.last_ok_round IS NULL OR a.round > p.last_ok_round)
  GROUP BY a.host
),
j AS (
  SELECT p.host, p.n_attempts, p.last_ok_round, p.last_round,
         CAST(COALESCE(f.trailing_failures, 0) AS BIGINT)
           AS trailing_failures
  FROM per p LEFT JOIN fails f ON p.host = f.host
),
s AS (
  SELECT host, n_attempts, last_ok_round, trailing_failures,
         CAST(CASE WHEN trailing_failures >= 2 THEN 1 ELSE 0 END
              AS INTEGER) AS tripped,
         CASE WHEN trailing_failures >= 2
              THEN last_round
                   + LEAST(16, 1 << LEAST(trailing_failures, 30))
              END AS cooldown_until
  FROM j
)
SELECT host, n_attempts, last_ok_round, trailing_failures, tripped,
       CAST(cooldown_until AS BIGINT) AS cooldown_until,
       CAST(CASE WHEN cooldown_until > 10 THEN 1 ELSE 0 END AS INTEGER)
         AS blocked
FROM s""",
    }
