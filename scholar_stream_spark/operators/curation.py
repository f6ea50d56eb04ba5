"""Composed corpus curation — the end-to-end training-data filter
chain as ONE operator (SURVEY §2.8 pipeline surface).

What a pretraining data pipeline actually runs before tokenization:

    quality filter → language filter → exact dedup → split selection

Composition strategy matters more than the individual filters at
100 TB: every per-document signal (quality score, language, content
fingerprint, split bucket) is a *narrow expression over the same
scan* — so the whole chain is ONE projection + ONE filter with zero
joins (the naive formulation joins four operator outputs back on
doc_id: four shuffles of the corpus for values that were all derivable
in the row). The only shuffle is the exact-dedup ranking window on the
content fingerprint — unavoidable (global property) and minimal (keyed
on the fingerprint, AQE-splittable).

All expressions are shared with the standalone operators
(``textops.quality_parts``, ``textops.pred_lang_from_hits``,
``text.normalize_text``, ``sampling.split_bucket``) so the composed
output provably matches running the stages separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scholar_stream_spark.functions.text import normalize_text
from scholar_stream_spark.operators.sampling import SPLIT_BOUNDS, split_bucket
from scholar_stream_spark.operators.textops import (
    LANG_ORDER,
    lang_hit_cols,
    pred_lang_from_hits,
    quality_parts,
)
from scholar_stream_spark.plans.partitioning import scale_out

#: Curation defaults (shared with the DuckDB oracle text).
CURATE_MIN_QUALITY = 0.5
CURATE_LANGS = ("en",)
CURATE_SPLITS = ("train",)


def curate_corpus(
    documents: DataFrame,
    min_quality: float = CURATE_MIN_QUALITY,
    langs: tuple[str, ...] = CURATE_LANGS,
    splits: tuple[str, ...] = CURATE_SPLITS,
) -> DataFrame:
    """Quality+language filter → exact dedup → split selection.

    Dedup keeps the LOWEST doc_id among quality/lang-passing documents
    sharing a normalized-content fingerprint (deterministic survivor —
    never ``dropDuplicates``). Split filtering happens after dedup so
    the survivor choice is split-independent (the same doc survives
    whether you materialize train or val).

    Output: (doc_id, n_doc_tokens, quality_score, pred_lang, split).
    """
    nt, _, _, score = quality_parts(F.col("text"))
    bucket = split_bucket("CAST(doc_id AS STRING)")
    split = None
    for name, lo, hi in SPLIT_BOUNDS:
        cond = (bucket >= lo) & (bucket < hi)
        split = (
            F.when(cond, F.lit(name))
            if split is None
            else split.when(cond, F.lit(name))
        )
    hits = lang_hit_cols(F.col("text"))
    staged = scale_out(documents).select(
        "doc_id",
        nt.alias("n_doc_tokens"),
        F.round(score, 4).alias("quality_score"),
        *[hits[lang].alias(f"_h_{lang}") for lang in LANG_ORDER],
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        split.alias("split"),
    )
    scored = staged.select(
        "doc_id",
        "n_doc_tokens",
        "quality_score",
        pred_lang_from_hits(
            {lang: F.col(f"_h_{lang}") for lang in LANG_ORDER}
        ).alias("pred_lang"),
        "fingerprint",
        "split",
    )
    passed = scored.filter(
        (F.col("quality_score") >= min_quality)
        & F.col("pred_lang").isin(*langs)
    )
    w = Window.partitionBy("fingerprint").orderBy(F.asc("doc_id"))
    deduped = (
        passed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return deduped.filter(F.col("split").isin(*splits)).select(
        "doc_id", "n_doc_tokens", "quality_score", "pred_lang", "split"
    )
