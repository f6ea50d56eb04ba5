"""Sequence packing + composed corpus curation."""

from __future__ import annotations

from pyspark.sql import functions as F

from scholar_stream_spark.operators import curation, sampling, textops
from scholar_stream_spark.operators.dedup import exact_dedup_stats
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_pack_offsets_are_contiguous_per_shard(spark):
    rows = sampling.pack_documents(_docs(spark)).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1  # hash sharding actually spreads
    for _shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["doc_id"])
        stream_pos = 0
        for r in rs:
            assert (
                r["pack_seq"] * sampling.PACK_BUDGET_TOKENS
                + r["offset_in_pack"]
                == stream_pos
            )
            stream_pos += r["n_doc_tokens"]


def test_pack_is_partition_invariant(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: (r["shard"], r["pack_seq"], r["offset_in_pack"])
        for r in sampling.pack_documents(docs).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["pack_seq"], r["offset_in_pack"])
        for r in sampling.pack_documents(docs.repartition(13)).collect()
    }
    assert a == b


def test_hash_sample_is_partition_invariant_and_near_fraction(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.2).collect()}
    b = {
        r["doc_id"]
        for r in sampling.hash_sample(docs.repartition(7), 0.2).collect()
    }
    assert a == b
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # hash-uniformity sanity band


def test_reservoir_consistent_with_prefilter(spark):
    """Pre-filtering with hash_sample at an overshooting fraction must
    not change the reservoir — the scale path's correctness claim."""
    docs = _docs(spark)
    full = {
        (r["doc_id"], r["stratum"], r["sample_rank"])
        for r in sampling.stratified_reservoir(docs, n_per_stratum=5).collect()
    }
    pre = sampling.hash_sample(docs, 0.5)
    filtered = {
        (r["doc_id"], r["stratum"], r["sample_rank"])
        for r in sampling.stratified_reservoir(pre, n_per_stratum=5).collect()
    }
    assert full == filtered
    per_stratum: dict = {}
    for _d, s, _r in full:
        per_stratum[s] = per_stratum.get(s, 0) + 1
    assert all(v <= 5 for v in per_stratum.values())


def test_curate_matches_stagewise_composition(spark):
    """The one-projection composition must equal running the standalone
    operators stage by stage (the anti-drift guarantee)."""
    docs = _docs(spark)
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in textops.text_quality(docs).collect()
    }
    lang = {
        r["doc_id"]: r["pred_lang"]
        for r in textops.lang_profile(docs).collect()
    }
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in textops.doc_fingerprints(docs).collect()
    }
    split = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_splits(docs).collect()
    }
    passed = sorted(
        d
        for d in quality
        if quality[d] >= curation.CURATE_MIN_QUALITY
        and lang[d] in curation.CURATE_LANGS
    )
    seen: dict = {}
    for d in passed:  # lowest doc_id survives per fingerprint
        seen.setdefault(fp[d], d)
    expected = {
        d for d in seen.values() if split[d] in curation.CURATE_SPLITS
    }
    got = {r["doc_id"] for r in curation.curate_corpus(docs).collect()}
    assert got == expected
    assert len(got) > 0


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b-c@ex.co or 12345678 soon"),
            (2, "clean text 123"),  # short digit run untouched
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.scrub_pii(df).collect()}
    assert rows[1]["scrubbed"] == "mail me at <EMAIL> or <NUM> soon"
    assert rows[1]["n_emails"] == 1 and rows[1]["n_digit_runs"] == 1
    assert rows[2]["scrubbed"] == "clean text 123"
    assert rows[2]["n_emails"] == 0 and rows[2]["n_digit_runs"] == 0


def test_repetition_stats_flags_loops(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam ham"), (2, "all words here differ now")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.repetition_stats(df).collect()}
    assert rows[1]["n_tokens"] == 5 and rows[1]["n_distinct"] == 2
    assert rows[1]["top_token_ratio"] == 0.8
    assert rows[2]["dup_token_ratio"] == 0.0


def test_curate_dedups_exact_content(spark):
    docs = _docs(spark)
    stats = exact_dedup_stats(docs).first()
    curated = curation.curate_corpus(
        docs, min_quality=0.0, langs=("en", "de", "fr", "es", "und"),
        splits=("train", "val", "test"),
    )
    # with all filters open, curation output == unique fingerprints
    n_unique_norm = docs.select(
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("f")
    ).distinct().count()
    assert curated.count() == n_unique_norm
    assert curated.count() <= stats["n_docs"]


def test_pretraining_pipeline_composes_stage_contracts(spark):
    from scholar_stream_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = curation.pretraining_pipeline(docs)
    rows = out.collect()
    assert len(rows) > 0
    picked = {r["doc_id"] for r in rows}

    # subset of the curated train split at the pipeline's lang filter
    curated = {
        r["doc_id"]
        for r in curation.curate_corpus(
            docs, langs=tuple(sorted(curation.PIPELINE_WEIGHTS))
        ).collect()
    }
    assert picked <= curated
    # no contaminated doc survives
    flagged = {r["doc_id"] for r in dedup.decontaminate(docs).collect()}
    assert not (picked & flagged)
    # strata limited to the weighted languages — and MORE THAN ONE
    # stratum present, or the mixture stage would be a vacuous no-op
    # (the bug the curate default langs=("en",) used to cause)
    strata = {r["stratum"] for r in rows}
    assert strata <= set(curation.PIPELINE_WEIGHTS)
    assert len(strata) > 1, strata


def test_pretraining_pipeline_flag_join_is_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        curation.pretraining_pipeline(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
