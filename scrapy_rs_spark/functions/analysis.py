"""Text-analysis functions for large-scale training-data pipelines.

Beyond the reference's operator surface (it extracts text but never
scores it), these are the standard webtext curation ops — language ID,
quality scoring, token counting, fingerprinting — implemented as pure
JVM column expressions (whole-stage codegen, no Python on the hot
path), so they run at Common-Crawl scale.

Cross-engine determinism: anything that must match a DuckDB oracle
derives hashes from md5 hex (identical in both engines), not from
engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# compact English stopword list for the n-gram/stopword heuristics
EN_STOPWORDS = [
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "are", "was", "this", "by", "be", "or",
]


def h32(col: Column | str) -> Column:
    """Deterministic 32-bit-ish hash from md5 hex — identical to
    DuckDB's ('0x' || substr(md5(x),1,8))::BIGINT, so oracle queries
    reproduce it exactly. Use ONLY where cross-engine parity matters;
    the crawl identity hash stays xxhash64 (faster, JVM codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def tokens_ws(text: Column | str) -> Column:
    """Whitespace tokenization (single-space split; the synthetic docs
    are single-space separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count_ws(text: Column | str) -> Column:
    return F.size(tokens_ws(text))


def token_count_regex(text: Column | str) -> Column:
    """BPE-ish alnum-run token count (regex, JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.expr(f"regexp_extract_all({_n(text)}, '[A-Za-z0-9]+', 0)"))


def _n(col) -> str:
    if isinstance(col, str):
        return col
    raise TypeError("regex token count needs a column name")


def stopword_count(text: Column | str, stopwords: list[str] | None = None) -> Column:
    words = tokens_ws(text)
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, F.lower(w))))


def stopword_ratio(text: Column | str) -> Column:
    return stopword_count(text) / F.greatest(
        token_count_ws(text), F.lit(1)
    ).cast("double")


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[.,;:!?]", "")
    return F.length(c) - F.length(stripped)


def lang_id_heuristic(text: Column | str, threshold: float = 0.08) -> Column:
    """Stopword-density language ID: 'en' if the English stopword
    ratio clears the threshold, else 'unknown'.

    Upgrade path (documented stand-in): a production curation run
    replaces this column expression with a model-based LID of the
    fastText lid.176 / CLD3 class behind an Arrow-batched pandas UDF —
    same column contract (text → STRING label), so the swap is

        @pandas_udf("string")
        def lang_id_model(texts: pd.Series) -> pd.Series:
            model = _load_model_once()          # per-executor singleton
            return pd.Series(model.predict(texts.tolist()))

    and every caller (queries(), curation filters) is unchanged. The
    model file ships via spark.sparkContext.addFile so executors load
    it locally; this container has no model assets, hence the
    deterministic heuristic here."""
    return F.when(stopword_ratio(text) >= F.lit(threshold), F.lit("en")).otherwise(
        F.lit("unknown")
    )


def quality_score(text: Column | str) -> Column:
    """Webtext quality heuristic in [0,1]: rewards mid-length docs and
    stopword presence, penalizes punctuation soup. Deterministic,
    cross-engine-expressible arithmetic (rounded by callers).

    Upgrade path (documented stand-in): production pipelines score with
    a KenLM/ngram perplexity filter or a small quality classifier
    (C4/Gopher/FineWeb-style rules plus a learned model) behind the
    same column contract (text → DOUBLE in [0,1]) as an Arrow-batched
    pandas UDF — swap the expression, keep every caller. The rule
    features this heuristic computes (length, stopword ratio, word
    shape, punctuation density) are the same ones those published
    filters threshold on."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("double")
    n_words = token_count_ws(text).cast("double")
    avg_word = n_chars / F.greatest(n_words, F.lit(1.0))
    len_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    punct_pen = F.least(
        punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0)) * F.lit(10.0),
        F.lit(1.0),
    )
    word_shape = F.when((avg_word >= 3) & (avg_word <= 10), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * sw_score
        + F.lit(0.2) * word_shape
        + F.lit(0.1) * (F.lit(1.0) - punct_pen)
    )


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB): character classes + bounded quantifiers only, no
# backreferences/lookaround. Conservative by design — a production
# pipeline layers model-based NER behind the same column contract.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+[0-9]{1,3}[ \-][0-9]{2,4}[ \-][0-9]{3,4}[ \-][0-9]{3,4}",
}


def pii_scrub(text: Column | str) -> Column:
    """Redact PII spans with <KIND> tags, applied in a fixed order
    (email → ipv4 → phone) so the output is deterministic. Pure JVM
    regexp_replace chain — codegen'd, no Python, linear scans."""
    c = F.col(text) if isinstance(text, str) else text
    out = c
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_count(text: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern kind."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def normalize_text(text: Column | str) -> Column:
    """Pinned normalization for fingerprinting: lowercase + collapse
    whitespace runs + trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of normalized text (stable across
    engines; the rolling-hash variant lives in textdedup.shingles)."""
    return F.md5(normalize_text(text))
