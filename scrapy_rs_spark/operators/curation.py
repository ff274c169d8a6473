"""Corpus-curation operators a training-data pipeline runs between the
crawl and the tokenizer: snapshot selection, deterministic dataset
splits, and sequence packing.

All three are pure DataFrame compositions with exact SQL oracles —
no UDFs, no nondeterminism (splits and packing key off md5-derived
h32, never rand()), so results are reproducible run-to-run and across
engines.

Scale notes:
  * latest_snapshot: Window partitioned by url — at 10^10 rows the
    partition key is the url itself, so no hot partitions (each url has
    a handful of captures).
  * split_by_hash: one codegen'd projection, no shuffle; split
    membership is a pure function of the key, so re-runs (and late
    additions) never reshuffle existing assignments.
  * pack_sequences: cumulative sums run per hash-group (n_groups
    partitions of bounded size), never a global window — a global
    cumsum would serialize 10^10 rows onto one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scrapy_rs_spark.functions.analysis import h32, token_count_ws


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """Keep the newest capture per url (Common-Crawl dumps carry
    multiple captures; SURVEY §2.3: snapshot selection is a
    row_number, not an as-of join). Pass tiebreak columns when
    (url, ts) is not unique, to keep the winner deterministic."""
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), *(tiebreak or [])
    )
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def split_by_hash(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: bucket = h32(salt||key) %
    10000, split = the range the bucket falls in (cumulative
    fractions, insertion order). Membership is a pure function of the
    key — adding rows later never moves existing ones, and the same
    doc always lands in the same split on every engine."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.pmod(
        h32(F.concat(F.lit(salt), F.lit("\x00"), F.col(key_col).cast("string"))),
        F.lit(10_000),
    )
    expr: Column | None = None
    upper = 0.0
    names = list(fractions)
    for name in names[:-1]:
        upper += fractions[name]
        cond = bucket < F.lit(int(round(upper * 10_000)))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    n_groups: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming sequence packing: assign docs to fixed-token-budget
    bins for training-batch assembly.

    Semantics (deterministic, SQL-expressible): docs are processed in
    id order within hash-groups; a doc's bin is
    floor(exclusive_prefix_tokens / max_tokens) — i.e. bins are cut
    wherever the running token total crosses a budget boundary. A bin
    may overflow by at most one doc (the standard streaming-pack
    tradeoff; exact bin-packing is NP-hard and order-dependent greedy
    packers can't be reproduced across partitionings).

    Output: (doc_id, n_tokens, group_id, bin_id). bin identity =
    (group_id, bin_id)."""
    grouped = docs.select(
        F.col(id_col),
        token_count_ws(text_col).cast("bigint").alias("n_tokens"),
        F.pmod(h32(F.col(id_col).cast("string")), F.lit(n_groups))
        .cast("int")
        .alias("group_id"),
    )
    w = (
        Window.partitionBy("group_id")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return grouped.withColumn(
        "bin_id", F.floor(prefix / F.lit(max_tokens)).cast("bigint")
    )


def quota_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "quota",
) -> DataFrame:
    """Deterministic mixture sampling: keep each row with its group's
    rate (e.g. upsample-free language/domain balancing for a training
    mix — lang en:1.0, fr:0.25, …). Membership is a pure hash of the
    key (h32(salt||key) % 10000 < rate·10000): no rand(), stable under
    re-runs and engine changes, and adding rows never flips existing
    decisions — the property a reproducible data recipe needs.

    One codegen'd projection + filter, no shuffle; group rates ride as
    a literal CASE, so 10^10 rows never touch a join for the config."""
    bucket = F.pmod(
        h32(
            F.concat(F.lit(salt), F.lit("\x00"), F.col(key_col).cast("string"))
        ),
        F.lit(10_000),
    )
    rate: Column | None = None
    for name, r in rates.items():
        cond = F.col(group_col) == F.lit(name)
        thresh = F.lit(int(round(r * 10_000)))
        rate = F.when(cond, thresh) if rate is None else rate.when(cond, thresh)
    rate = (
        F.lit(int(round(default_rate * 10_000)))
        if rate is None
        else rate.otherwise(F.lit(int(round(default_rate * 10_000))))
    )
    return df.filter(bucket < rate)


def chunk_dedup(
    docs: DataFrame,
    chunk_words: int = 10,
    max_dups: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chunks_per_doc: int | None = None,
) -> DataFrame:
    """Corpus-wide duplicated-passage removal (CCNet-style paragraph
    dedup, restated over fixed word-window chunks since the corpus
    carries no newlines): any chunk whose exact text occurs in MORE
    than max_dups documents is dropped from every document; survivors
    are reassembled in order.

    Shape at scale: words → chunks is a per-doc aggregation; the
    corpus-wide chunk frequency is one partial-agg shuffle keyed by
    md5(chunk) (boilerplate chunks are hot keys, but the count agg
    combines map-side so no single reducer sees raw rows); the final
    reassembly is again per-doc. Output: (doc_id, text_clean,
    n_chunks, n_dropped_chunks).

    The reassembly collect_list is bounded by document size; set
    max_chunks_per_doc to make a pathological document (e.g. 10^6
    chunks) fail LOUDLY executor-side (assert_true row predicate —
    no extra job, evaluated before the aggregation buffers anything)
    instead of OOMing an executor mid-agg."""
    # chunks straight from the intact word array (transform + slice),
    # then one explode — a pure projection. The previous formulation
    # exploded every word and re-assembled chunks with a corpus-wide
    # groupBy(doc, chunk_id) collect_list: a full shuffle of every
    # word in the corpus that existed only to undo the explode
    # (guide §2.4). Chunk ids and contents are identical. The word
    # array is bound as its own projected column first — an HOF
    # lambda re-evaluates captured non-attribute expressions per
    # element (same hazard as textdedup.shingles).
    words = F.col("__cd_words")
    base = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__cd_words")
    )
    n_chunks_m1 = F.floor((F.size(words) - 1) / F.lit(chunk_words)).cast(
        "int"
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks_m1),
        lambda c: F.array_join(
            F.slice(words, c * chunk_words + 1, chunk_words), " "
        ),
    )
    chunks = base.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("chunk_id", "chunk")
    )
    freq = (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(F.countDistinct(id_col).alias("n_docs"))
    )
    tagged = chunks.join(
        freq, F.md5(chunks["chunk"]) == freq["chunk_hash"], "left"
    ).select(
        id_col,
        "chunk_id",
        "chunk",
        (F.col("n_docs") > F.lit(max_dups)).alias("dropped"),
    )
    if max_chunks_per_doc is not None:
        guard = F.assert_true(
            F.col("chunk_id") < F.lit(max_chunks_per_doc),
            F.concat(
                F.lit("chunk_dedup: doc "),
                F.col(id_col).cast("string"),
                F.lit(
                    f" exceeds max_chunks_per_doc={max_chunks_per_doc}"
                    " chunks; raise the limit or pre-split the document"
                ),
            ),
        )
        # assert_true yields NULL when the predicate holds, raises
        # otherwise — the filter keeps every surviving row
        tagged = tagged.filter(guard.isNull())
    return tagged.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("dropped"),
                            F.struct("chunk_id", "chunk"),
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
        ).alias("text_clean"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.col("dropped").cast("bigint")).alias("n_dropped_chunks"),
    )


def mixture_plan(
    docs: DataFrame,
    targets: DataFrame | dict[str, int],
    group_col: str = "source",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """The step BEFORE quota_sample: turn per-source token budgets
    into keep rates. (source, n_docs, total_weight, target_weight,
    keep_rate) per group — keep_rate = min(1, target/total), 0.0 for
    groups without a budget (excluded from the mix), so
    ``{r[group]: r['keep_rate'] for ...}`` feeds quota_sample's rates
    directly and the sampled corpus lands ≈on budget.

    One partial aggregation over the corpus plus a broadcast join
    against the (tiny) budget table; counts and weights stay exact
    integers, keep_rate is a single IEEE division — nothing here
    limits scale. ``targets`` may be a dict (convenience) or a
    DataFrame(group, target_weight) when budgets are themselves
    computed."""
    spark = docs.sparkSession
    if isinstance(targets, dict):
        tdf = spark.createDataFrame(
            [(k, int(v)) for k, v in targets.items()],
            f"{group_col} string, target_weight long",
        )
    else:
        tdf = targets
    agg = docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(weight_col).cast("long").alias("total_weight"),
    )
    joined = agg.join(F.broadcast(tdf), group_col, "left")
    return joined.select(
        group_col,
        "n_docs",
        "total_weight",
        F.coalesce(F.col("target_weight"), F.lit(0)).cast("long").alias(
            "target_weight"
        ),
        F.least(
            F.lit(1.0),
            F.coalesce(F.col("target_weight"), F.lit(0))
            / F.col("total_weight"),
        ).alias("keep_rate"),
    )
