"""Round-8 operator tests: the Bloom fingerprint sidecar (zero false
negatives, measured FP rate, probe-identical results, persisted
roundtrip), the DSIR importance sampler (discrimination on a constructed
target/corpus split, determinism), ExactSubstr ``keep="first"`` (one
survivor per duplicated window, subset relation, default unchanged),
the extended PII scrub's word-boundary non-matches, the Gopher stop-word
normalization, the profile_columns empty-cols guard, and plan pins for
the round's two plan changes (large_orders de-hinted broadcast,
funnel_analysis single-scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from scholar_stream_spark.operators import dedup, profiling, relational
from scholar_stream_spark.operators import sampling, textops
from tests.conftest import SF_SMALL

QUERIES = entry_mod.queries()


# ---------------------------------------------------------------- bloom


def _fps(spark, rows):
    return spark.createDataFrame(
        [(r,) for r in rows], "fingerprint string"
    )


def test_bloom_zero_false_negatives(spark):
    """Every fingerprint the filter was built over MUST flag maybe=True
    — a false negative would silently admit a duplicate, which is the
    one failure mode a Bloom gate may never have."""
    fps = [f"fp-{i}" for i in range(500)]
    idx = _fps(spark, fps)
    n_bits, n_hashes = dedup.bloom_params(500)
    bloom = dedup.build_fingerprint_bloom(idx, n_bits, n_hashes)
    flagged = dedup._bloom_flagged(
        idx.withColumn("doc_id", F.lit(0)), bloom, n_bits, n_hashes
    )
    assert flagged.filter(~F.col("maybe")).count() == 0


def test_bloom_fp_rate_within_sizing(spark):
    """Non-members must flag maybe at roughly the sized false-positive
    probability — pinned loosely (≤ 4× the 1% target over 2000 probes)
    so hash-quality regressions fail without flaking."""
    idx = _fps(spark, [f"fp-{i}" for i in range(1000)])
    n_bits, n_hashes = dedup.bloom_params(1000, fpp=0.01)
    bloom = dedup.build_fingerprint_bloom(idx, n_bits, n_hashes)
    probes = _fps(spark, [f"other-{i}" for i in range(2000)]).withColumn(
        "doc_id", F.lit(0)
    )
    fp = (
        dedup._bloom_flagged(probes, bloom, n_bits, n_hashes)
        .filter(F.col("maybe"))
        .count()
    )
    assert fp / 2000 <= 0.04, f"FP rate {fp / 2000} vs 0.01 target"


def test_bloom_probe_identical_to_plain_incremental_dedup(spark):
    """The Bloom-gated probe must return EXACTLY incremental_dedup's
    rows on the same batch/index split — the sidecar is an access-path
    optimization, never a semantics change."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    bucket = sampling.split_bucket("CAST(doc_id AS STRING)")
    idx = docs.filter(bucket < 50).select(
        F.md5(
            F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))")
        ).alias("fingerprint")
    )
    batch = docs.filter(bucket >= 50)
    plain = sorted(map(tuple, dedup.incremental_dedup(batch, idx).collect()))
    n_bits, n_hashes = 1 << 14, 5
    bloom = dedup.build_fingerprint_bloom(idx, n_bits, n_hashes)
    gated = sorted(
        map(
            tuple,
            dedup.incremental_dedup_bloom(
                batch, idx, bloom, n_bits, n_hashes
            ).collect(),
        )
    )
    assert plain == gated and len(plain) > 0


def test_fingerprint_index_roundtrip(spark, tmp_path):
    """write_fingerprint_index → incremental_dedup_indexed must match
    the in-memory probe, and the persisted layout must carry all three
    tables (fingerprints, bloom, params)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    bucket = sampling.split_bucket("CAST(doc_id AS STRING)")
    corpus, batch = docs.filter(bucket < 50), docs.filter(bucket >= 50)
    path = str(tmp_path / "fpidx")
    dedup.write_fingerprint_index(corpus, path)
    idx = spark.read.parquet(f"{path}/fingerprints")
    want = sorted(map(tuple, dedup.incremental_dedup(batch, idx).collect()))
    got = sorted(
        map(tuple, dedup.incremental_dedup_indexed(batch, path).collect())
    )
    assert want == got and len(got) > 0
    params = spark.read.parquet(f"{path}/params").collect()[0]
    assert params["n_bits"] % 64 == 0 and params["n_hashes"] >= 1


def test_compact_fingerprint_index_probe_identical(spark, tmp_path):
    """Streaming-built index (batch dirs + fixed-geometry bloom deltas)
    → compacted serving layout: the probe must return identical rows,
    the fingerprint table must fold to n_files, and the bloom must be
    REBUILT at the size the compacted count warrants."""
    from scholar_stream_spark.streaming.dedup_ingest import ingest_batch

    corpus, index, bloom = tmp_path / "c", tmp_path / "i", tmp_path / "b"
    batches = [
        [(1, "doc one"), (2, "doc two")],
        [(3, "doc three"), (4, "doc one")],
        [(5, "doc five")],
    ]
    for i, rows in enumerate(batches):
        ingest_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            i, str(corpus), str(index), str(bloom),
        )
    out = tmp_path / "compacted"
    dedup.compact_fingerprint_index(spark, str(index), str(out), n_files=2)
    probe = spark.createDataFrame(
        [(10, "doc one"), (11, "doc new")], "doc_id long, text string"
    )
    via_compact = sorted(
        map(tuple, dedup.incremental_dedup_indexed(probe, str(out)).collect())
    )
    merged = (
        spark.read.option("basePath", str(index))
        .parquet(str(index))
        .select("fingerprint")
    )
    plain = sorted(
        map(tuple, dedup.incremental_dedup(probe, merged).collect())
    )
    assert via_compact == plain
    assert [t[0] for t in via_compact] == [11]  # "doc one" is indexed
    data_files = [
        p for p in (out / "fingerprints").iterdir()
        if p.name.endswith(".parquet")
    ]
    assert len(data_files) == 2
    params = spark.read.parquet(f"{out}/params").collect()[0]
    want_bits, want_hashes = dedup.bloom_params(4)  # 4 distinct fps
    assert (params["n_bits"], params["n_hashes"]) == (want_bits, want_hashes)


def test_dedup_survivor_map_redirects_every_removed_doc(spark):
    """Every cluster member except the survivor must appear exactly
    once, mapped to its own cluster's survivor; survivors never appear
    as removed docs."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    m = {r["doc_id"]: r for r in dedup.dedup_survivor_map(docs).collect()}
    best = {
        r["cluster_id"]: r["survivor_id"]
        for r in dedup.keep_best_per_cluster(docs).collect()
    }
    clusters = dedup.neardup_clusters(docs).collect()
    removed = [r for r in clusters if best[r["cluster_id"]] != r["doc_id"]]
    assert sorted(m) == sorted(r["doc_id"] for r in removed)
    for r in removed:
        assert m[r["doc_id"]]["survivor_id"] == best[r["cluster_id"]]
    assert not (set(m) & set(best.values()))


# ----------------------------------------------------------------- dsir


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_prefilter_reduces_without_losing_matches(spark):
    """The semi-join reduction must (a) keep EVERY row whose key is in
    the selective set, (b) shed most non-matching rows, (c) contain no
    join/exchange in the prefilter itself (pure codegen filter)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    keys = {r["o_orderkey"] for r in sel.collect()}
    n_bits, n_hashes = 1 << 16, 5
    word_filter, _, _ = dedup.bloom_key_filter(
        sel, "o_orderkey", n_bits, n_hashes
    )
    assert len(word_filter.split(",")) == n_bits // 32
    # GEOMETRY-bounded driver collect: what bloom_key_filter collects is
    # the executor-side bit_or word aggregate — at most n_bits/32 rows
    # no matter how many keys fold in, never the k x |keys| positions.
    word_rows = dedup.build_fingerprint_bloom(
        sel, n_bits, n_hashes, fp_col="o_orderkey", word_bits=32
    )
    n_words = word_rows.count()
    assert n_words <= n_bits // 32
    # and it is a true fold: one row per DISTINCT touched word, not one
    # per (key, hash) position
    n_set = sum(
        bin(int(w)).count("1") for w in word_filter.split(",")
    )
    assert n_words <= n_set <= len(keys) * n_hashes
    filtered = dedup.bloom_prefilter(
        li.select("l_orderkey"), "l_orderkey", word_filter, n_bits, n_hashes
    )
    kept = [r["l_orderkey"] for r in filtered.collect()]
    truth = [
        r["l_orderkey"]
        for r in li.select("l_orderkey").collect()
        if r["l_orderkey"] in keys
    ]
    # zero false negatives: every true match survives the prefilter
    assert set(truth) <= set(kept)
    # real reduction: the kept set is much closer to the truth than to
    # the full table
    n_full = li.count()
    assert len(kept) < n_full * 0.6
    assert len(kept) >= len(truth)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_bloom_key_filter_sizes_from_key_count(spark):
    """Auto-sized geometry: leaving (n_bits, n_hashes) to the builder
    derives them from the key count via bloom_params, capped at the
    plan-literal limit; the word string matches the returned width."""
    keys = spark.range(500).select(F.col("id").alias("k"))
    word_filter, n_bits, n_hashes = dedup.bloom_key_filter(keys, "k")
    exp_bits, exp_hashes = dedup.bloom_params(500)
    assert (n_bits, n_hashes) == (exp_bits, exp_hashes)
    assert n_bits <= dedup.BLOOM_LITERAL_MAX_BITS
    assert word_filter is not None
    assert len(word_filter.split(",")) == n_bits // 32
    # and the sized filter still has zero false negatives
    probe = dedup.bloom_prefilter(
        spark.range(1000).select(F.col("id").alias("k")),
        "k",
        word_filter,
        n_bits,
        n_hashes,
    )
    kept = {r["k"] for r in probe.collect()}
    assert set(range(500)) <= kept


def test_bloom_key_filter_saturation_returns_none(spark):
    """A key set far beyond the capped geometry saturates the filter;
    the builder must signal 'skip the prefilter' (None) instead of
    handing back a filter that passes everything at k-hash cost."""
    keys = spark.range(200_000).select(F.col("id").alias("k"))
    word_filter, n_bits, n_hashes = dedup.bloom_key_filter(
        keys, "k", max_bits=1 << 12
    )
    assert word_filter is None
    assert n_bits == 1 << 12


def test_dsir_upweights_target_like_docs(spark):
    """On a corpus with two disjoint vocabularies and a target drawn
    from one of them, every target-vocabulary doc must score a higher
    log_ratio than every off-target doc, and the kept set must skew
    toward the target vocabulary."""
    on = [(i, "alpha beta gamma delta " * 10) for i in range(0, 40)]
    off = [(i, "omega psi chi phi " * 10) for i in range(40, 80)]
    corpus = _mk_docs(spark, on + off)
    target = _mk_docs(spark, [(100 + i, "alpha beta gamma delta " * 10) for i in range(10)])
    scored = sampling.dsir_sample(corpus, target, rate=0.5)
    rows = {r["doc_id"]: r for r in scored.collect()}
    on_ratios = [rows[i]["log_ratio"] for i in rows if i < 40]
    off_ratios = [rows[i]["log_ratio"] for i in rows if i >= 40]
    assert on_ratios and min(on_ratios) > (
        max(off_ratios) if off_ratios else float("-inf")
    )
    n_on = sum(1 for i in rows if i < 40)
    n_off = sum(1 for i in rows if i >= 40)
    assert n_on > n_off, (n_on, n_off)


def test_dsir_deterministic_across_runs(spark):
    """Same inputs → byte-identical kept set and scores (portable-hash
    keep rule + fixed-point quantized weights)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    bucket = sampling.split_bucket("CAST(doc_id AS STRING)")
    corpus = docs.filter(bucket < 80)
    target = docs.filter(bucket >= 80)
    a = sorted(map(tuple, sampling.dsir_sample(corpus, target).collect()))
    b = sorted(map(tuple, sampling.dsir_sample(corpus, target).collect()))
    assert a == b and len(a) > 0


def test_winnowing_guarantee_and_density(spark):
    """Winnowing's defining property: two docs sharing a run of ≥
    window+k−1 tokens MUST share a fingerprint; an unrelated doc must
    not. Selection density must be well under the k-gram count."""
    shared = " ".join(f"tok{i}" for i in range(12))
    docs = _mk_docs(
        spark,
        [
            (1, shared + " alpha beta"),
            (2, "gamma delta " + shared),
            (3, "entirely different words " * 4),
        ],
    )
    fps = dedup.winnow_fingerprints(docs, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: distinct selections ≤ windows, and ≥ 1 per doc
    corpus = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sel = dedup.winnow_fingerprints(corpus)
    n_sel = sel.count()
    n_kgrams = corpus.selectExpr(
        f"sum(greatest(size(split(trim(text), '{dedup.SUBSTR_WS_RE}'))"
        f" - {dedup.WINNOW_K} + 1, 0)) AS n"
    ).collect()[0]["n"]
    assert 0 < n_sel < n_kgrams
    # expected density ~2/(w+1); allow generous slack both sides
    assert n_sel / n_kgrams < 2.5 / (dedup.WINNOW_WINDOW + 1) + 0.2


def test_dup_span_coverage_consistent_with_spans(spark):
    """The one-row card must agree with the per-doc span view."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    card = dedup.dup_span_coverage(docs).collect()[0]
    spans = dedup.duplicate_spans(docs).collect()
    assert card["dup_tokens"] == sum(r["span_tokens"] for r in spans)
    assert card["n_docs_with_dups"] == len({r["doc_id"] for r in spans})
    assert 0.0 <= card["coverage"] <= 1.0
    assert card["n_docs"] == docs.count()


# ----------------------------------------------------- keep="first" spans


def test_keep_first_leaves_one_survivor_per_window(spark):
    """With keep='first', the marked hit set per duplicated window hash
    must be exactly (occurrences - 1): the corpus-lowest (doc_id,
    start) survives. Checked via the span subset relation plus token
    accounting on a constructed two-doc duplicate."""
    dup_run = " ".join(f"w{i}" for i in range(dedup.SUBSTR_WINDOW))
    docs = _mk_docs(
        spark,
        [
            (1, dup_run + " unique one tail"),
            (2, dup_run + " other two tail"),
            (3, "completely different text " * 5),
        ],
    )
    spans_all = dedup.duplicate_spans(docs).collect()
    spans_first = dedup.duplicate_spans(docs, keep="first").collect()
    # all-mode marks the run in BOTH docs; first-mode only in doc 2
    assert sorted(r["doc_id"] for r in spans_all) == [1, 2]
    assert [r["doc_id"] for r in spans_first] == [2]
    removed = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in dedup.remove_duplicate_spans(docs, keep="first").collect()
    }
    assert removed[1] == 0 and removed[2] == dedup.SUBSTR_WINDOW
    assert removed[3] == 0


def test_keep_first_spans_subset_of_all(spark):
    """Every keep='first' span must lie inside some keep='all' span of
    the same doc (the survivor exemption can only SHRINK the marked
    set), on the real corpus."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    allspans = {}
    for r in dedup.duplicate_spans(docs, window=5).collect():
        allspans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    first = dedup.duplicate_spans(docs, window=5, keep="first").collect()
    assert len(first) <= sum(len(v) for v in allspans.values())
    for r in first:
        assert any(
            s <= r["span_start"] and r["span_end"] <= e
            for s, e in allspans.get(r["doc_id"], [])
        ), r


def test_paragraphs_keep_first_retains_one_occurrence(spark):
    """keep='first' must leave exactly ONE copy of a corpus-repeated
    paragraph — in the lowest (doc_id, pos) position — while the
    default mode removes all copies."""
    boiler = "Subscribe to our newsletter today."
    docs = _mk_docs(
        spark,
        [
            (1, f"alpha body\n\n{boiler}\n\ntail one"),
            (2, f"{boiler}\n\nbeta body"),
            (3, "gamma body only"),
        ],
    )
    drop_all = {
        r["doc_id"]: r for r in dedup.remove_dup_paragraphs(docs).collect()
    }
    keep_first = {
        r["doc_id"]: r
        for r in dedup.remove_dup_paragraphs(docs, keep="first").collect()
    }
    assert boiler not in drop_all[1]["clean_text"]
    assert boiler not in drop_all[2]["clean_text"]
    # survivor = lowest (doc_id, pos): doc 1 holds it at pos 1 vs doc
    # 2 pos 0 — struct ordering is doc_id-major, so doc 1 wins
    assert boiler in keep_first[1]["clean_text"]
    assert boiler not in keep_first[2]["clean_text"]
    assert keep_first[3]["n_removed_paragraphs"] == 0
    with pytest.raises(ValueError, match="keep"):
        dedup.remove_dup_paragraphs(docs, keep="last")


def test_spans_keep_rejects_unknown_mode(spark):
    docs = _mk_docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="keep"):
        dedup.duplicate_spans(docs, keep="last")


def test_ivf_index_stats_matches_recount_and_reads_no_vectors(spark):
    """Per-cell counts must equal a recount of the persisted vectors
    table, shares must sum to ~1, and the scan must read ONLY the
    partition column (no vector bytes)."""
    import re

    import __spark_entry__ as em

    df = em.queries()["ivf_index_stats"](spark, SF_SMALL)
    rows = df.collect()
    path = em._ivf_index_dir(spark, SF_SMALL)
    want = {
        r["cell"]: r["count"]
        for r in spark.read.parquet(f"{path}/vectors")
        .groupBy("cell")
        .count()
        .collect()
    }
    assert {r["cell"]: r["n_vectors"] for r in rows} == want
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert schemas and all("embedding" not in s for s in schemas), schemas


def test_embedding_data_card_total_row_consistent(spark):
    """The TOTAL row must equal the sum of the per-label counts, and
    every dim bound must be the uniform embedding width."""
    from scholar_stream_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    rows = {r["label"]: r for r in similarity.embedding_data_card(emb).collect()}
    total = rows.pop("TOTAL")
    assert total["n_vectors"] == sum(r["n_vectors"] for r in rows.values())
    assert all(
        r["dim_min"] == r["dim_max"] == total["dim_min"]
        for r in rows.values()
    )
    assert all(r["norm_min"] <= r["norm_p50"] <= r["norm_p99"] <= r["norm_max"]
               for r in rows.values())


def test_cluster_safe_splits_have_zero_neardup_leakage(spark):
    """The defining property: over cluster-keyed splits, NO near-dup
    pair crosses a split boundary (every pair is intra-cluster, hence
    intra-split) — while the default doc-keyed assignment on the same
    corpus is allowed to leak."""
    from scholar_stream_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    safe = sampling.cluster_safe_splits(docs)
    report = sampling.split_leakage_report(docs, splits=safe).collect()
    cross = [r for r in report if r["split_a"] != r["split_b"]]
    assert cross == [], cross
    # non-clustered docs keep their doc-keyed assignment
    base = {r["doc_id"]: r["split"] for r in sampling.assign_splits(docs).collect()}
    from scholar_stream_spark.operators import dedup as dd

    clustered = {r["doc_id"] for r in dd.neardup_clusters(docs).collect()}
    for r in safe.collect():
        if r["doc_id"] not in clustered:
            assert r["split"] == base[r["doc_id"]]


# ------------------------------------------------------------- scrub_pii


def test_scrub_pii_word_boundary_non_matches(spark):
    """Each boundary-guarded pattern must NOT fire on its adjacent-word
    decoy, and MUST fire on the clean form."""
    text = (
        "ip 1.2.3.4 decoy x1.2.3.4 and 1.2.3.4567 "
        "phone (555) 123-4567 and 555-123-4567 decoy 9555-123-4567 "
        "uuid deadbeef-1234-5678-9abc-deadbeef1234 "
        "decoy xdeadbeef-1234-5678-9abc-deadbeef1234"
    )
    row = textops.scrub_pii(_mk_docs(spark, [(1, text)])).collect()[0]
    assert row["n_ipv4"] == 1
    assert row["n_phones"] == 2
    assert row["n_uuids"] == 1
    assert "x1.2.3.4" in row["scrubbed"]
    assert "9555-123-4567" in row["scrubbed"]
    assert "xdeadbeef" in row["scrubbed"]
    assert "<IP>" in row["scrubbed"]
    assert "<PHONE>" in row["scrubbed"]
    assert "<UUID>" in row["scrubbed"]


def test_scrub_pii_counts_on_raw_text(spark):
    """Counts are per-pattern over the ORIGINAL text (order-independent
    audit): an email whose local part holds a long digit run counts as
    BOTH an email and a digit run."""
    row = textops.scrub_pii(
        _mk_docs(spark, [(1, "mail 12345678@example.com end")])
    ).collect()[0]
    assert row["n_emails"] == 1
    assert row["n_digit_runs"] == 1
    assert row["scrubbed"] == "mail <EMAIL> end"


# ------------------------------------------------------- gopher stopwords


def test_gopher_stopwords_case_and_punct_insensitive(spark):
    """'The' and 'the,' must count toward the stop-word rule (Gopher
    A1.1 convention) — raw-token matching undercounts."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rows = textops.gopher_quality(
        _mk_docs(
            spark,
            [
                (1, base + "The quick fox, with that, have it."),
                (2, base + "no stop words here at all kappa"),
            ],
        )
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # The(→the), with, that, have → 4 distinct stop words present
    assert by_id[1]["n_stopwords_present"] == 4
    assert by_id[2]["n_stopwords_present"] == 0


# ---------------------------------------------------------------- guards


def test_profile_columns_rejects_empty_cols(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one column"):
        profiling.profile_columns(df, [])


def test_table_file_stats_tracks_compaction(spark, tmp_path):
    """The file-health report must count exactly the data files a scan
    would read, and show compaction reducing them."""
    from scholar_stream_spark.sources.table_sink import table_file_stats

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    scattered = str(tmp_path / "scattered")
    docs.repartition(8).write.parquet(scattered)
    before = table_file_stats(spark, scattered).collect()[0]
    assert before["n_files"] == 8
    assert before["total_bytes"] > 0
    assert before["n_small"] <= before["n_files"]
    compacted = str(tmp_path / "compacted")
    spark.read.parquet(scattered).coalesce(1).write.parquet(compacted)
    after = table_file_stats(spark, compacted).collect()[0]
    assert after["n_files"] == 1
    # same data, far fewer files; byte totals in the same ballpark
    assert after["total_bytes"] > 0


# ------------------------------------------------------------- plan pins


def test_large_orders_no_forced_broadcast_hint(spark):
    """The customer join must carry NO broadcast hint: customer grows
    with scale factor, and a forced hint bypasses
    autoBroadcastJoinThreshold (the r7 weak). AQE may still CHOOSE to
    broadcast at test SF — the pin is on the hint, not the runtime
    strategy."""
    df = QUERIES["large_orders"](spark, SF_SMALL)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in optimized, optimized


def test_funnel_single_events_scan(spark):
    """The funnel's final plan must read ONLY the checkpointed base —
    zero parquet FileScans in the returned plan means events is scanned
    exactly once, inside the shared localCheckpoint."""
    df = QUERIES["funnel_analysis"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_curriculum_phases_quantiles_without_global_sort(spark):
    """Phases must cover every input row, be roughly quartile-sized,
    be monotone in quality score — and the plan must contain NO global
    Sort (the ntile anti-pattern the operator exists to avoid)."""
    import __spark_entry__ as em

    df = em.queries()["curriculum_phases"](spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = df.collect()
    assert len(rows) == docs.count()
    phases = {r["phase"] for r in rows}
    assert phases <= {1, 2, 3, 4} and len(phases) >= 3
    # monotone: max score in phase k <= min score in phase k+2 would be
    # too strict with boundary ties; pin mean ordering instead
    import statistics

    means = {
        p: statistics.mean(r["quality_score"] for r in rows if r["phase"] == p)
        for p in sorted(phases)
    }
    ordered = [means[p] for p in sorted(means)]
    assert ordered == sorted(ordered), means
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Sort [" not in plan, plan


def test_lsh_index_stats_predicts_without_pairing(spark):
    """One row per band; the candidate-pair estimate must equal the
    actual bucket-pair count; and the plan must contain no join at all
    (the stats predict the pair cost without paying it)."""
    import __spark_entry__ as em

    df = em.queries()["lsh_index_stats"](spark, SF_SMALL)
    rows = df.collect()
    assert [r["band"] for r in rows] == sorted(r["band"] for r in rows)
    assert all(r["n_keys"] <= r["n_postings"] for r in rows)
    assert all(r["est_candidate_pairs"] >= 0 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_funnel_semantics_unchanged_after_rewrite(spark):
    """Stage counts must be monotonically non-increasing and match the
    oracle-checked semantics on the small SF."""
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    rows = relational.funnel_analysis(events).collect()
    counts = [r["n_users"] for r in sorted(rows, key=lambda r: r["step_index"])]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conversion"] == 1.0
