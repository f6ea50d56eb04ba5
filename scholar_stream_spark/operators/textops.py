"""Text-analysis operators for training-data pipelines (SURVEY.md §2.8).

Token counting, quality scoring, language-ID heuristics and document
fingerprinting — all as pure Column expressions (no explode in the hot
path: per-document token work uses array lambdas, so each operator is a
single narrow projection over the documents scan, embarrassingly
parallel at any scale).

Constants are shared with the DuckDB oracle generators in
``__spark_entry__.py`` — do not fork them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholar_stream_spark.plans.partitioning import scale_out
from scholar_stream_spark.functions.text import normalize_text

#: Stopword list used for quality scoring (drawn from the corpus vocab).
STOPWORDS = ("the", "a")

#: Marker words per language for the n-gram/stopword language-ID
#: heuristic, checked in deterministic priority order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}
LANG_ORDER = ("en", "de", "fr", "es")


def n_tokens(text: Column) -> Column:
    """Whitespace token count without materializing the token array:
    ``len - len(without spaces) + 1`` — identical across engines and
    cheap enough to inline everywhere."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + F.lit(1)
    ).cast("long")


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def token_counts(documents: DataFrame) -> DataFrame:
    """Per-document token statistics (BPE-ish regex word count included:
    runs of word characters, the cheap tokenizer-budget estimator)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    documents = scale_out(documents)
    return documents.select(
        "doc_id",
        n_tokens(F.col("text")).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def text_quality(documents: DataFrame) -> DataFrame:
    """Quality-score features: token count, mean token length, stopword
    ratio, and a composite score — the standard cheap pre-filter before
    expensive dedup/training steps."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nt = n_tokens(F.col("text"))
    mean_len = (F.length(F.regexp_replace(F.col("text"), " ", "")) / nt)
    stop_ratio = _hits(toks, STOPWORDS) / nt
    score = (
        F.when(nt < 5, F.lit(0.0))
        .otherwise(
            F.lit(1.0)
            - F.abs(mean_len - F.lit(4.0)) / F.lit(10.0)
            - stop_ratio * F.lit(0.5)
        )
    )
    documents = scale_out(documents)
    return documents.select(
        "doc_id",
        nt.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def lang_profile(documents: DataFrame) -> DataFrame:
    """Language-ID heuristic: marker-word hit counts per language,
    argmax with deterministic priority (LANG_ORDER), 'und' when nothing
    matches. A real deployment swaps the marker lists for char-n-gram
    models; the operator shape (single narrow projection) is the point.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    hit_cols = {lang: _hits(toks, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        cond = F.lit(True)
        for other in LANG_ORDER:
            if other == lang:
                continue
            # strictly greater than later-priority langs, >= earlier ones
            # is impossible because we take the FIRST maximal in order.
            cond = cond & (hit_cols[lang] >= hit_cols[other])
        this = F.when((hit_cols[lang] > 0) & cond, F.lit(lang))
        best = this if best is None else best.when(
            (hit_cols[lang] > 0) & cond, F.lit(lang)
        )
    pred = best.otherwise(F.lit("und"))
    documents = scale_out(documents)
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        hit_cols["en"].alias("en_hits"),
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercase, collapsed whitespace) — the exact-dedup / cache key."""
    documents = scale_out(documents)
    return documents.select(
        "doc_id",
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
    )
