"""Deterministic split assignment + bronze compaction."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from scholar_stream_spark.operators import sampling
from scholar_stream_spark.sources.raw_landing import compact_raw, land_batch


def test_split_assignment_deterministic_and_complete(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in sampling.assign_splits(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.assign_splits(docs).collect()}
    assert a == b  # rerun-stable, by construction
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()  # every doc assigned
    # ~90/5/5 split within loose tolerance at n=500
    n = len(a)
    train_frac = sum(1 for s in a.values() if s == "train") / n
    assert 0.8 < train_frac < 0.97


def test_split_survives_repartitioning(spark):
    # the whole point vs rand(): assignment is partition-invariant
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {r["doc_id"]: r["split"] for r in sampling.assign_splits(docs).collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_splits(docs.repartition(17)).collect()
    }
    assert base == shuffled


def test_compact_raw_reduces_files_keeps_rows(spark, tmp_path):
    raw = str(tmp_path / "raw")
    # land 5 separate batches → ≥5 files in one land_date partition
    for i in range(5):
        lines = spark.createDataFrame(
            [(json.dumps({"id": f"W{i}-{j}"}),) for j in range(10)], ["value"]
        )
        land_batch(lines, raw)
    files_before = glob.glob(os.path.join(raw, "**", "*.parquet"), recursive=True)
    assert len(files_before) >= 5
    n = compact_raw(spark, raw)
    assert n == 50
    files_after = glob.glob(os.path.join(raw, "**", "*.parquet"), recursive=True)
    assert len(files_after) == 1  # single land_date → single file
    assert spark.read.parquet(raw).count() == 50
    # payloads intact
    ids = {
        json.loads(r["payload"])["id"]
        for r in spark.read.parquet(raw).collect()
    }
    assert len(ids) == 50


def test_write_partitioned_layout_and_roundtrip(spark, tmp_path):
    from scholar_stream_spark.operators.sampling import assign_splits
    from scholar_stream_spark.sources.table_sink import write_partitioned
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    tagged = docs.join(assign_splits(docs).select("doc_id", "split"), "doc_id")
    out = str(tmp_path / "curated")
    write_partitioned(tagged, out, ["split"], sort_cols=["doc_id"])

    import os

    parts = sorted(
        d for d in os.listdir(out) if d.startswith("split=")
    )
    assert parts == ["split=test", "split=train", "split=val"]
    # small-file discipline: repartition-by-partition-col bounds files
    for d in parts:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 4
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(tagged.columns)


def test_mixture_sample_binding_stratum_keeps_all(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.groupBy("lang").agg(
        F.sum(
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).alias("t")
    )
    totals = {r["lang"]: r["t"] for r in toks.collect()}
    w = sampling.MIXTURE_WEIGHTS
    binding = min(w, key=lambda l: totals[l] / w[l])

    kept = sampling.mixture_sample(docs).groupBy("stratum").count()
    kept_n = {r["stratum"]: r["count"] for r in kept.collect()}
    in_n = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    # the scarcest-relative-to-share stratum is kept in full…
    assert kept_n[binding] == in_n[binding]
    # …and no stratum exceeds its input
    assert all(kept_n[l] <= in_n[l] for l in kept_n)
    # over-represented strata are actually downsampled
    over = max(w, key=lambda l: totals[l] / w[l])
    assert kept_n[over] < in_n[over]


def test_mixture_sample_drops_unweighted_strata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    no_en = {k: 0.25 for k in ("de", "es", "fr", "zh")}
    kept = sampling.mixture_sample(docs, weights=no_en)
    assert kept.filter(F.col("stratum") == "en").count() == 0
    assert kept.count() > 0


def test_mixture_sample_corpus_join_is_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        sampling.mixture_sample(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_mixture_select_binding_stratum_survives_float_rounding(spark):
    # T=471064178143, w=0.35: floor((T/w)*w/T*1e6) IEEE-rounds to
    # 999999, so without the binding-stratum pin the top hash bucket
    # of the very stratum promised "keep fraction exactly 1" is lost
    base = spark.createDataFrame(
        [(1, "x", 471064178143, sampling.SAMPLE_DENOM - 1)],
        "doc_id long, stratum string, n_tokens long, bucket long",
    )
    got = sampling.mixture_select(base, {"x": 0.35}).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_temperature_mixture_smallest_stratum_kept_whole(spark):
    """w_l ∝ sqrt(T_l) makes the smallest stratum the binding one: it
    keeps fraction 1 while larger strata downsample toward its
    temperature share — and selection is deterministic."""
    from scholar_stream_spark.operators.sampling import temperature_mixture

    rows = []
    did = 0
    for lang, n_docs, words in (("en", 400, 20), ("de", 100, 20), ("fr", 25, 20)):
        for _ in range(n_docs):
            rows.append((did, lang, " ".join(f"w{did}x{j}" for j in range(words))))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = temperature_mixture(docs).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["stratum"], 0)
        by_lang[r["stratum"]] += 1
    # fr (smallest) binds: all 25 kept
    assert by_lang["fr"] == 25
    # larger strata downsample by ~sqrt ratio: f_en = sqrt(T_fr*T_en)/T_en
    # = sqrt(25/400) relative share shift → en keeps ~ sqrt(400*25)/400
    # = 100/400 of docs (hash-uniform, allow slack)
    assert 60 <= by_lang["en"] <= 140, by_lang
    assert 30 <= by_lang["de"] <= 70, by_lang
    # deterministic under re-run/repartition
    again = temperature_mixture(docs.repartition(7)).collect()
    assert sorted((r["doc_id"], r["stratum"]) for r in kept) == sorted(
        (r["doc_id"], r["stratum"]) for r in again
    )


def test_mixture_upsample_epoch_counts(spark):
    """Binding stratum (most abundant vs its share) runs exactly one
    epoch; a stratum with exactly a third of the binding ratio repeats
    every doc exactly 3 times; every doc appears at least once."""
    from pyspark.sql import functions as F

    from scholar_stream_spark.operators.sampling import mixture_upsample

    rows = [(i, "en", " ".join(["w"] * 10)) for i in range(30)]
    rows += [(100 + i, "de", " ".join(["w"] * 10)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = mixture_upsample(docs, weights={"en": 0.5, "de": 0.5}).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # en: T/w = 600 (binding) -> exactly 1 epoch each
    assert all(per_doc[i] == [0] for i in range(30))
    # de: T/w = 200 -> e = 3.0 exactly -> epochs {0,1,2} each
    assert all(sorted(per_doc[100 + i]) == [0, 1, 2] for i in range(10))


def test_quality_weighted_sample_monotone_and_deterministic(spark):
    """Weighted sampling contract: same-seed re-runs and arbitrary
    repartitionings select the SAME rows; raising the scale only ADDS
    rows (the bucket threshold is monotone in p_keep); and acceptance
    tracks quality (a zero-quality doc can never be kept)."""
    docs = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog again " * 3)
            for i in range(200)
        ]
        + [(1000 + i, "tiny") for i in range(50)],  # nt < 5 -> score 0
        "doc_id long, text string",
    )
    kept1 = {
        r["doc_id"] for r in sampling.quality_weighted_sample(docs).collect()
    }
    kept2 = {
        r["doc_id"]
        for r in sampling.quality_weighted_sample(
            docs.repartition(13)
        ).collect()
    }
    assert kept1 == kept2
    assert kept1 and all(d < 1000 for d in kept1)  # score-0 docs never kept
    bigger = {
        r["doc_id"]
        for r in sampling.quality_weighted_sample(docs, scale=2.0).collect()
    }
    assert kept1 <= bigger


def test_quality_weighted_sample_plan_is_narrow(spark):
    """Like hash_sample: a per-row filter — no joins, no exchanges."""
    docs = spark.createDataFrame(
        [(i, f"some words here {i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        sampling.quality_weighted_sample(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_retention_cohorts_hand_computed(spark):
    """Three users, two cohorts: u1/u2 start week 0 (u2 returns in week
    1), u3 starts week 1 — rates follow exactly."""
    rows = [
        (1, "2024-01-01 10:00:00"),  # u1 cohort wk of Jan 1 (Mon)
        (1, "2024-01-03 10:00:00"),  # same week, still offset 0
        (2, "2024-01-02 10:00:00"),  # u2 same cohort
        (2, "2024-01-09 10:00:00"),  # u2 active offset 1
        (3, "2024-01-08 10:00:00"),  # u3 cohort wk of Jan 8
    ]
    from scholar_stream_spark.operators import relational

    events = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.to_timestamp("ts").alias("ts"))
    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): (
            r["n_active"],
            r["n_cohort"],
            r["retention_rate"],
        )
        for r in relational.retention_cohorts(events).collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", 0): (2, 2, 1.0),
        ("2024-01-01T00:00:00", 1): (1, 2, 0.5),
        ("2024-01-08T00:00:00", 0): (1, 1, 1.0),
    }
