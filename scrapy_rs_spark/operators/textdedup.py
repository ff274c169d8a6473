"""Document deduplication family for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a documents
table — the curation ops a Common-Crawl-scale corpus needs after the
crawl. All shapes are shuffle-conscious:

  * exact: one hash-aggregate on md5(text) (partial agg map-side)
  * minhash/LSH: shingle explode → per-(doc,band) min-agg →
    band-bucket self-join (the join key (band, sig) is the LSH bucket,
    so only colliding docs ever meet — no all-pairs blowup)
  * simhash: explode words × 32 bit positions → two hash-aggregates
  * jaccard: distinct-shingle join on bounded candidate pairs only

Hashes derive from md5 hex (functions.analysis.h32) so every operator
has an exact DuckDB oracle — cross-engine value parity, not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scrapy_rs_spark.functions.analysis import h32


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct text: (text_hash, keeper_id, n_dups).
    Keeper = lowest id (deterministic winner)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").cast("bigint").alias("n_dups"),
        )
    )


def shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Word n-gram shingles: (id, pos, shingle). Single-space word
    split; shingle = n consecutive words joined by ' '.

    Built entirely from array expressions on the intact word array
    (transform over an index sequence + one slice per shingle), then
    exploded — a pure per-row projection with ZERO shuffle. The
    previous formulation exploded words first and re-assembled
    shingles with lead() windows, which hash-partitioned and sorted
    every word of the corpus before a single shingle existed (one
    Exchange + Sort that at 10^10 docs is the dominant cost of every
    shingle consumer — guide §2.4: remove shuffles outright).
    Output rows are identical: pos = shingle start index.

    The word array is bound as its OWN projected column first: a
    higher-order-function lambda re-evaluates captured non-attribute
    expressions per element (HOFs are interpreted, no codegen CSE),
    so an inlined split() would re-split the text once per shingle —
    O(words²) per document (measured 6× slower at 13-grams)."""
    w = F.col("__sh_words")
    base = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__sh_words")
    )
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(w, i + 1, n), " ")
    )
    return base.select(
        F.col(id_col), F.posexplode(sh).alias("pos", "shingle")
    )


def minhash_signatures(
    docs: DataFrame,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Banded min-hash: (id, band, sig).

    band = h32(shingle) % bands partitions the shingle space; sig =
    lexicographic min of md5(shingle) within the band — a valid
    min-hash (md5 is a uniform permutation of shingle space), and
    exactly reproducible in SQL oracles."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    return (
        sh.select(
            F.col(id_col),
            F.pmod(h32(F.col("shingle")), F.lit(bands)).cast("int").alias("band"),
            F.md5(F.col("shingle")).alias("mh"),
        )
        .groupBy(id_col, "band")
        .agg(F.min("mh").alias("sig"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Docs agreeing on any (band, sig) bucket → candidate near-dup
    pairs (id_a < id_b, distinct). The self-join shuffles on the
    bucket key only; bucket skew is bounded because sig is a 128-bit
    min-hash (hot buckets = true near-dup clusters)."""
    a = signatures.select(
        F.col("band"), F.col("sig"), F.col(id_col).alias("id_a")
    )
    b = signatures.select(
        F.col("band"), F.col("sig"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_star_edges(
    signatures: DataFrame, id_col: str = "doc_id", skew_safe: bool = False
) -> DataFrame:
    """Component-equivalent contraction of the LSH candidate graph:
    within each (band, sig) bucket connect every member to the bucket
    MINIMUM id (a star) instead of emitting all k(k-1)/2 pairs.

    Two docs share a bucket iff both connect to that bucket's hub, so
    connected components — and therefore dedup_clusters output — are
    IDENTICAL to lsh_candidate_pairs', but the edge list is O(Σk)
    instead of O(Σk²). At corpus scale this is the difference between
    feasible and not: a boilerplate bucket with 10^4 members yields
    10^4 star edges, not 5·10^7 pairs.

    Two component-identical physical forms (pinned equivalent in
    test_dedup), chosen by ``skew_safe``:

    * skew_safe=False (default): one window-min per (band, sig)
      partition — no self-join, no distinct, SINGLE shuffle. Bucket
      skew is bounded by construction (sig is a 128-bit minhash, so a
      hot bucket is a true near-dup cluster, same argument as
      lsh_candidate_pairs). The right default: fewest shuffles.
    * skew_safe=True: groupBy(band, sig).min → broadcast-or-shuffle
      join-back. One extra shuffle, but the hub computation is a
      partial-aggregating hash agg (map-side combine shrinks a 10^7-row
      bucket to one row per map task BEFORE the exchange) and the
      join-back is a plain equi-join that AQE's skew-join CAN split —
      a window partition it cannot. Use for adversarial corpora where
      a single bucket may exceed one executor's partition budget
      (~10^7+ members: a boilerplate page replicated corpus-wide).

    Crossover guidance: default to the window form; switch to
    skew_safe when max bucket size × row width approaches the
    per-partition memory budget (AQE skew stats or a one-off
    groupBy(band,sig).count() percentile tells you). Feed the result
    straight to dedup_clusters; use lsh_candidate_pairs only when the
    explicit pair list itself is the product (e.g. to score Jaccard
    per pair).
    Output: (id_a, id_b) with id_b = bucket hub < id_a."""
    if skew_safe:
        hubs = (
            signatures.groupBy("band", "sig")
            .agg(F.min(id_col).alias("__hub"))
        )
        return (
            signatures.join(hubs, ["band", "sig"])
            .filter(F.col(id_col) != F.col("__hub"))
            .select(
                F.col(id_col).alias("id_a"), F.col("__hub").alias("id_b")
            )
        )
    w = Window.partitionBy("band", "sig")
    return (
        signatures.withColumn("hub", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("hub"))
        .select(F.col(id_col).alias("id_a"), F.col("hub").alias("id_b"))
    )


def simhash(
    docs: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """32-bit SimHash over words: (id, simhash).

    Each word's h32 votes ±1 per bit position; the fingerprint sets
    bit j when the vote sum is positive. Two hash-aggregates, no
    windows, fully codegen'd."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).select(F.col(id_col), h32(F.col("w")).alias("wh"))
    bitted = words.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        F.col("wh"),
    ).withColumn(
        # shiftright/shiftleft with a COLUMN bit count only resolve via
        # SQL expr (the pyspark wrappers require int literals)
        "vote",
        (F.expr("shiftright(wh, j)") % 2) * 2 - 1,
    )
    votes = bitted.groupBy(id_col, "j").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), j)")
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def dedup_clusters(
    pairs: DataFrame,
    max_iters: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id),
    cluster_id = the minimum doc id in the component (the keeper a
    dedup pass retains; everything else in the cluster is dropped).

    The step a real pipeline runs AFTER pair generation (exact/minhash/
    simhash/embedding pairs all feed it). Iterative min-label
    propagation PLUS pointer jumping, FUSED into one join per round:
    the graph edges and the label pointers (u → label(u)) are unioned
    into a single message list, so one equi-join against the label
    table + one grouped min computes
        label(u) ← min(min_{v∈N(u)} label(v), label(label(u)))
    — the pointer message label(label(u)) ≤ label(u) (labels never
    exceed their node id), so u's own label is dominated and needs no
    separate term, and every node emits a pointer so the inner join
    covers all nodes. Path halving makes a component of diameter d
    converge in O(log d) rounds; each round is ONE shuffle join + one
    partial-agg, half the joins of the unfused form. Labels are locally
    checkpointed per round so lineage stays flat; convergence rides the
    SAME materializing action (labels only ever decrease, so the label
    sum strictly decreases until fixpoint — an exact decimal sum on the
    lazily-checkpointed result, one Spark job per round).

    Labels only ever decrease and are always ids of nodes inside the
    same component (neighbor labels and label-of-label both stay in
    component), so the fixpoint is the component minimum. If max_iters
    exhausts before the fixpoint the labels are NOT cluster ids —
    on_nonconverged='raise' (default) raises RuntimeError;
    'warn' prints loudly and returns the unconverged labels.
    (The fused round jumps via PRE-round labels, slightly weaker per
    iteration than a step-then-jump formulation — the default
    max_iters carries headroom for that, still covering components of
    diameter far beyond anything a near-dup graph produces.)"""
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    # no distinct: every consumer is a min-aggregation, which is
    # duplicate-insensitive — deduping the symmetrized edge set would
    # cost a full extra shuffle for nothing
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    # initial label = min(id, min neighbor id) — the first neighbor-min
    # step folded into initialization (one agg instead of a distinct
    # plus a full loop iteration; edges are symmetric so every node
    # appears as src)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__m"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__m")).alias("label"),
        )
        # lazy: iteration 1's label-sum job materializes it — one
        # fewer driver action than an eager checkpoint, same lineage
        .localCheckpoint(eager=False)
    )
    converged = False
    prev_sum = None
    for _ in range(max_iters):
        # message list: graph edges (u hears each neighbor's label) ∪
        # pointer edges (u hears its label's label — the jump)
        msgs = edges.unionByName(
            labels.select(F.col("id").alias("src"), F.col("label").alias("dst"))
        )
        lab = labels.select(
            F.col("id").alias("__lid"), F.col("label").alias("__llabel")
        )
        new_labels = (
            msgs.join(lab, msgs["dst"] == lab["__lid"])
            .groupBy("src")
            .agg(F.min("__llabel").alias("label"))
            .select(F.col("src").alias("id"), "label")
            .localCheckpoint(eager=False)  # materialized by the agg below
        )
        # exact decimal sum (ids may be 64-bit hashes; long would wrap)
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        # cur_sum is None iff labels is EMPTY (SUM over zero rows) — an
        # empty pair set (no near-dups / all-singleton LSH buckets) is
        # trivially converged; without this the None != None-able guard
        # below never fires and the loop burns max_iters then raises
        if cur_sum is None or cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        msg = (
            f"dedup_clusters did not converge in max_iters={max_iters}"
            f" rounds — returned labels are NOT cluster ids (a component"
            f" of diameter > ~2^{max_iters} remains); raise max_iters"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def repetition_score(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition (Gopher-style repetition filter
    feature): the fraction of word n-grams that are duplicates of an
    earlier n-gram in the same document — high values flag boilerplate
    and degenerate generations. rep_ratio = 1 - distinct/total
    (0 for docs shorter than n words).

    One per-doc aggregation over the shingle explode — partial aggs
    map-side, no cross-doc shuffle keys, so a 10^10-doc corpus scales
    linearly. Output: (doc_id, n_grams, n_distinct, rep_ratio)."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    per = sh.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.countDistinct("shingle").cast("bigint").alias("n_distinct"),
    )
    return docs.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        F.round(
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                1.0 - F.col("n_distinct") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rep_ratio"),
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark contamination: which training documents contain any
    word n-gram (n=13, the GPT-3/PaLM convention) that also appears in
    a held-out benchmark set. The join runs on md5(shingle) — an
    equi-join shuffle keyed by gram hash, never a doc×doc comparison —
    and the benchmark side (tiny next to a training corpus) is
    broadcast. Output: (doc_id, n_contaminated_grams) for contaminated
    docs only."""
    corpus_sh = shingles(docs, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.md5("shingle").alias("gram")
    )
    bench_sh = (
        shingles(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select(F.md5("shingle").alias("gram"))
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").cast("bigint").alias("n_contaminated_grams"))
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Jaccard similarity of distinct word-n-gram sets for given
    (id_a, id_b) pairs. Intersection via shingle equi-join; |A∪B| =
    |A|+|B|-|A∩B| (no union materialization)."""
    sh = (
        shingles(docs, n=n, id_col=id_col, text_col=text_col)
        .select(F.col(id_col).alias("id"), "shingle")
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("shingle"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingle"))
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )
