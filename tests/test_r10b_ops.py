"""Round-10b ops: token-budget planning, packing efficiency, n-gram
diversity, and rank-exact quality deciles — the mixture-design /
observability quartet over the documents table."""

from __future__ import annotations

import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import curation, sampling, textops
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


# ---------------------------------------------------------------------------
# token_budget_plan
# ---------------------------------------------------------------------------


def test_token_budget_plan_matches_bruteforce(spark):
    rows = {
        r["stratum"]: r
        for r in sampling.token_budget_plan(_docs(spark)).collect()
    }
    con = duckdb.connect()
    per = con.execute(
        f"""SELECT lang, count(*),
                   SUM(length(text) - length(replace(text, ' ', '')) + 1)
            FROM '{SF_SMALL}/documents.parquet' GROUP BY lang"""
    ).fetchall()
    con.close()
    total_w = sum(sampling.MIXTURE_WEIGHTS.values())
    assert set(rows) == {lang for lang, _, _ in per}
    for lang, n_docs, n_tokens in per:
        r = rows[lang]
        assert r["n_docs"] == n_docs
        assert r["n_tokens"] == n_tokens
        w = sampling.MIXTURE_WEIGHTS.get(lang, 0.0) / total_w
        target = math.floor(float(sampling.PLAN_BUDGET_TOKENS) * w)
        assert r["target_tokens"] == target
        epochs = target / n_tokens
        assert r["epochs"] == pytest.approx(round(epochs, 6), abs=1e-12)
        assert r["sample_rate"] == pytest.approx(
            round(min(1.0, epochs), 6), abs=1e-12
        )
        assert r["needs_upsample"] == (epochs > 1.0)


def test_token_budget_plan_weight_zero_stratum(spark):
    # a stratum missing from the weights plans at target 0 (dropped by
    # the mixer) but still reports its corpus mass
    weights = {k: v for k, v in sampling.MIXTURE_WEIGHTS.items() if k != "zh"}
    rows = {
        r["stratum"]: r
        for r in sampling.token_budget_plan(
            _docs(spark), weights=weights
        ).collect()
    }
    assert rows["zh"]["target_tokens"] == 0
    assert rows["zh"]["epochs"] == 0.0
    assert not rows["zh"]["needs_upsample"]
    assert rows["zh"]["n_tokens"] > 0


def test_token_budget_plan_plan_single_agg_no_join_of_corpus(spark):
    plan = _plan(sampling.token_budget_plan(_docs(spark)))
    assert "CartesianProduct" not in plan
    # corpus scanned once: one parquet scan node
    assert plan.count("documents.parquet") == 1


# ---------------------------------------------------------------------------
# packing_efficiency
# ---------------------------------------------------------------------------


def test_packing_efficiency_matches_packed_layout(spark):
    packed = sampling.pack_documents(_docs(spark)).toPandas()
    b = sampling.PACK_BUDGET_TOKENS
    got = {
        r["shard"]: r
        for r in sampling.packing_efficiency(_docs(spark)).collect()
    }
    assert set(got) == set(packed["shard"].unique())
    for shard, grp in packed.groupby("shard"):
        r = got[shard]
        n_tokens = int(grp["n_doc_tokens"].sum())
        n_packs = (n_tokens + b - 1) // b
        n_split = int(
            ((grp["offset_in_pack"] + grp["n_doc_tokens"]) > b).sum()
        )
        assert r["n_docs"] == len(grp)
        assert r["n_tokens"] == n_tokens
        assert r["n_packs"] == n_packs
        assert r["n_split_docs"] == n_split
        assert r["fill_rate"] == pytest.approx(
            round(n_tokens / (n_packs * b), 6), abs=1e-12
        )
        assert r["split_frac"] == pytest.approx(
            round(n_split / len(grp), 6), abs=1e-12
        )


def test_packing_efficiency_fill_rate_bounds(spark):
    for r in sampling.packing_efficiency(_docs(spark)).collect():
        assert 0.0 < r["fill_rate"] <= 1.0
        assert 0.0 <= r["split_frac"] <= 1.0
        # offset packing wastes budget only in the final partial pack
        assert r["n_tokens"] > (r["n_packs"] - 1) * sampling.PACK_BUDGET_TOKENS


# ---------------------------------------------------------------------------
# ngram_diversity
# ---------------------------------------------------------------------------


def test_ngram_diversity_matches_python_reference(spark):
    docs = _docs(spark).select("source", "text").collect()
    n = textops.DIVERSITY_N
    totals: dict[str, list] = {}
    grams: dict[str, set] = {}
    ndocs: dict[str, int] = {}
    for r in docs:
        s = r["source"]
        ndocs[s] = ndocs.get(s, 0) + 1
        ws = [w for w in re.split(r"\s+", r["text"].strip()) if w]
        gs = [
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        ]
        totals[s] = totals.get(s, 0) + len(gs)
        grams.setdefault(s, set()).update(gs)
    got = {
        r["source"]: r
        for r in textops.ngram_diversity(_docs(spark)).collect()
    }
    assert set(got) == set(ndocs)
    for s in ndocs:
        r = got[s]
        assert r["n_docs"] == ndocs[s]
        assert r["n_grams"] == totals[s]
        assert r["n_distinct_grams"] == len(grams[s])
        assert r["gram_ttr"] == pytest.approx(
            round(len(grams[s]) / totals[s], 6), abs=1e-12
        )


def test_ngram_diversity_short_docs_count_in_docs_only(spark):
    docs = spark.createDataFrame(
        [(1, "one", "a"), (2, "one two one two", "a"), (3, "x", "b")],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r for r in textops.ngram_diversity(docs).collect()
    }
    # "one" is shorter than the bigram window: contributes no grams
    assert got["a"]["n_docs"] == 2
    assert got["a"]["n_grams"] == 3
    # "one two" / "two one" / "one two" — the repeat collapses
    assert got["a"]["n_distinct_grams"] == 2
    assert got["b"]["n_docs"] == 1
    assert got["b"]["n_grams"] == 0
    assert got["b"]["gram_ttr"] == 0.0


def test_ngram_diversity_duplicate_doc_lowers_ttr(spark):
    base = [(i, f"alpha beta gamma delta {i}", "s") for i in range(8)]
    dup = base + [(100 + i, base[0][1], "s") for i in range(8)]
    ttr_base = (
        textops.ngram_diversity(
            spark.createDataFrame(
                base, "doc_id long, text string, source string"
            )
        ).collect()[0]["gram_ttr"]
    )
    ttr_dup = (
        textops.ngram_diversity(
            spark.createDataFrame(
                dup, "doc_id long, text string, source string"
            )
        ).collect()[0]["gram_ttr"]
    )
    assert ttr_dup < ttr_base


# ---------------------------------------------------------------------------
# quality_deciles
# ---------------------------------------------------------------------------


def test_quality_deciles_rank_selection_exact(spark):
    # independent rank selection in pandas over the SAME scores the
    # signal kernel assigns (the score formula itself is oracle-pinned
    # via curate_corpus; this pins the decile RANK math)
    _, _, _, score = curation.quality_parts(F.col("text"))
    scored = (
        _docs(spark)
        .select(
            "source", "doc_id", F.round(score, 4).alias("score")
        )
        .toPandas()
    )
    got = curation.quality_deciles(_docs(spark)).collect()
    nd = curation.QUALITY_N_DECILES
    expect = {}
    for s, grp in scored.groupby("source"):
        ordered = grp.sort_values(["score", "doc_id"]).reset_index(drop=True)
        n = len(ordered)
        for d in range(1, nd + 1):
            rn = (d * n + nd - 1) // nd
            expect[(s, d)] = float(ordered.iloc[rn - 1]["score"])
    assert len(got) == len(expect)
    for r in got:
        assert r["score"] == pytest.approx(
            expect[(r["source"], r["decile"])], abs=1e-12
        )


def test_quality_deciles_monotone_and_complete(spark):
    rows = curation.quality_deciles(_docs(spark)).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for s, rs in by_source.items():
        assert [r["decile"] for r in rs] == list(
            range(1, curation.QUALITY_N_DECILES + 1)
        )
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores)


def test_quality_deciles_plan_broadcast_targets(spark):
    plan = _plan(curation.quality_deciles(_docs(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# bpe_pack_docs
# ---------------------------------------------------------------------------


def test_bpe_pack_docs_counts_equal_encode_docs(spark):
    # the packed token counts ARE the encoder's sequence lengths
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in textops.bpe_encode_docs(_docs(spark)).collect()
    }
    packed = sampling.bpe_pack_docs(_docs(spark)).collect()
    assert len(packed) == _docs(spark).count()
    for r in packed:
        assert r["n_doc_tokens"] == counts.get(r["doc_id"], 0)


def test_bpe_pack_docs_offsets_are_prefix_sums(spark):
    b = sampling.PACK_BUDGET_TOKENS
    rows = sorted(
        sampling.bpe_pack_docs(_docs(spark)).collect(),
        key=lambda r: (r["shard"], r["doc_id"]),
    )
    run: dict[int, int] = {}
    for r in rows:
        start = run.get(r["shard"], 0)
        assert r["pack_seq"] == start // b
        assert r["offset_in_pack"] == start % b
        run[r["shard"]] = start + r["n_doc_tokens"]


def test_bpe_pack_docs_schema_matches_pack_documents(spark):
    a = sampling.pack_documents(_docs(spark)).schema
    b = sampling.bpe_pack_docs(_docs(spark)).schema
    assert [(f.name, f.dataType) for f in a] == [
        (f.name, f.dataType) for f in b
    ]


def test_bpe_pack_docs_plan_vocab_sized_fold(spark):
    plan = _plan(sampling.bpe_pack_docs(_docs(spark)))
    assert "CartesianProduct" not in plan
    # the fold chain must ride the DISTINCT word table, not the corpus:
    # a HashAggregate (distinct) feeds the projection with the fold
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# tokenizer_swap_report
# ---------------------------------------------------------------------------


def test_tokenizer_swap_report_matches_fertility(spark):
    # side A is the frozen table: tokens_a/fertility_a must equal the
    # bpe_fertility report exactly
    fert = {
        r["source"]: r
        for r in textops.bpe_fertility(_docs(spark)).collect()
    }
    rows = textops.tokenizer_swap_report(_docs(spark)).collect()
    assert {r["source"] for r in rows} == set(fert)
    for r in rows:
        f = fert[r["source"]]
        assert r["n_words"] == f["n_words"]
        assert r["tokens_a"] == f["n_tokens"]
        assert r["fertility_a"] == f["tokens_per_word"]


def test_tokenizer_swap_smaller_table_never_fewer_tokens(spark):
    # the truncated table is a prefix of the full one: every merge it
    # lacks can only leave words MORE split, so tokens_b >= tokens_a
    for r in textops.tokenizer_swap_report(_docs(spark)).collect():
        assert r["tokens_b"] >= r["tokens_a"]
        assert r["token_ratio"] >= 1.0


def test_tokenizer_swap_identity_tables_ratio_one(spark):
    rows = textops.tokenizer_swap_report(
        _docs(spark),
        merges_a=textops.BPE_FROZEN_MERGES,
        merges_b=textops.BPE_FROZEN_MERGES,
    ).collect()
    for r in rows:
        assert r["tokens_a"] == r["tokens_b"]
        assert r["token_ratio"] == 1.0


# ---------------------------------------------------------------------------
# dedup_threshold_sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_matches_per_threshold_runs(spark):
    from scholar_stream_spark.operators import dedup

    sweep = {
        r["threshold"]: r
        for r in dedup.dedup_threshold_sweep(_docs(spark)).collect()
    }
    assert set(sweep) == set(dedup.SWEEP_THRESHOLDS)
    for t in dedup.SWEEP_THRESHOLDS:
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark), threshold=float(t)
        ).collect()
        docs = {r["d1"] for r in pairs} | {r["d2"] for r in pairs}
        assert sweep[t]["n_pairs"] == len(pairs)
        assert sweep[t]["n_docs"] == len(docs)


def test_threshold_sweep_cumulative_and_complete(spark):
    from scholar_stream_spark.operators import dedup

    rows = dedup.dedup_threshold_sweep(_docs(spark)).collect()
    assert len(rows) == len(dedup.SWEEP_THRESHOLDS)
    pair_counts = [r["n_pairs"] for r in rows]
    doc_counts = [r["n_docs"] for r in rows]
    # tightening the threshold can only shrink both counts
    assert pair_counts == sorted(pair_counts, reverse=True)
    assert doc_counts == sorted(doc_counts, reverse=True)


def test_threshold_sweep_single_pair_pipeline(spark):
    from scholar_stream_spark.operators import dedup

    plan = _plan(dedup.dedup_threshold_sweep(_docs(spark)))
    assert "CartesianProduct" not in plan
    # the quadratic shingle self-join must appear ONCE, not once per
    # threshold: count the shingle-equality join nodes
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 6


# ---------------------------------------------------------------------------
# boilerplate_paragraphs
# ---------------------------------------------------------------------------


def test_boilerplate_finds_planted_banners(spark):
    from scholar_stream_spark.operators import dedup

    import __spark_entry__ as entry_mod

    docs = entry_mod._para_injected(_docs(spark))
    n_total = _docs(spark).count()
    rows = dedup.boilerplate_paragraphs(docs).collect()
    by_para = {r["paragraph"]: r for r in rows}
    # the everywhere-banner tops the report with full doc coverage
    banner = "subscribe to our newsletter for updates."
    assert rows[0]["paragraph"] == banner
    assert by_para[banner]["n_docs"] == n_total
    assert by_para[banner]["n_occurrences"] == n_total
    # the even-doc banner covers exactly the even half, all sources
    half = "follow us on social media."
    assert by_para[half]["n_docs"] == sum(
        1 for r in _docs(spark).select("doc_id").collect()
        if r["doc_id"] % 2 == 0
    )
    assert by_para[half]["n_sources"] >= 1


def test_boilerplate_counts_match_python(spark):
    from collections import defaultdict

    from scholar_stream_spark.operators import dedup

    import __spark_entry__ as entry_mod

    docs = entry_mod._para_injected(_docs(spark))
    occ = defaultdict(int)
    dset = defaultdict(set)
    sset = defaultdict(set)
    for r in docs.collect():
        for p in r["text"].split("\n\n"):
            if p.strip():
                key = re.sub(r"\s+", " ", p.lower()).strip()
                occ[key] += 1
                dset[key].add(r["doc_id"])
                sset[key].add(r["source"])
    expected = sorted(
        (
            (len(dset[k]), occ[k], k)
            for k in occ
            if len(dset[k]) >= dedup.PARA_MIN_COUNT
        ),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[: dedup.BOILERPLATE_TOP_K]
    rows = dedup.boilerplate_paragraphs(docs).collect()
    assert [(r["n_docs"], r["n_occurrences"], r["paragraph"]) for r in rows] \
        == expected
    for r in rows:
        assert r["n_sources"] == len(sset[r["paragraph"]])


# ---------------------------------------------------------------------------
# shard_size_plan
# ---------------------------------------------------------------------------


def test_shard_size_plan_matches_bruteforce(spark):
    t = sampling.SHARD_TARGET_BYTES
    agg = (
        _docs(spark)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("n_chars").alias("nb"))
        .collect()
    )
    got = {
        r["source"]: r for r in sampling.shard_size_plan(_docs(spark)).collect()
    }
    assert set(got) == {r["source"] for r in agg}
    for a in agg:
        r = got[a["source"]]
        n_files = max(1, (a["nb"] + t - 1) // t)
        assert r["n_docs"] == a["nd"]
        assert r["n_bytes"] == a["nb"]
        assert r["n_files"] == n_files
        assert r["docs_per_file"] == (a["nd"] + n_files - 1) // n_files
        assert r["avg_file_bytes"] == pytest.approx(
            round(a["nb"] / n_files, 2), abs=1e-9
        )


def test_shard_size_plan_respects_target(spark):
    # every planned file holds at most ~target bytes (exactly: the
    # ceiling split can't exceed target unless a single source has
    # fewer bytes than one file's worth)
    for r in sampling.shard_size_plan(_docs(spark)).collect():
        assert r["avg_file_bytes"] <= sampling.SHARD_TARGET_BYTES
        assert r["n_files"] >= 1


# ---------------------------------------------------------------------------
# scale-profile pins for the new quadratic-adjacent reports
# ---------------------------------------------------------------------------


def test_source_matrix_scale_profile_identical_here(spark):
    # the hot-shingle cap only drops shingles whose doc frequency
    # exceeds it; the fixture corpus has none, so the scale profile is
    # result-identical (the guard's correctness contract)
    from scholar_stream_spark.operators import dedup

    a = sorted(
        map(tuple, dedup.neardup_source_matrix(_docs(spark)).collect())
    )
    b = sorted(
        map(
            tuple,
            dedup.neardup_source_matrix(
                _docs(spark), max_doc_freq=dedup.MAX_SHINGLE_DOC_FREQ
            ).collect(),
        )
    )
    assert a == b


def test_threshold_sweep_scale_profile_identical_here(spark):
    from scholar_stream_spark.operators import dedup

    a = sorted(
        map(tuple, dedup.dedup_threshold_sweep(_docs(spark)).collect())
    )
    b = sorted(
        map(
            tuple,
            dedup.dedup_threshold_sweep(
                _docs(spark), max_doc_freq=dedup.MAX_SHINGLE_DOC_FREQ
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# bpe_train_batched
# ---------------------------------------------------------------------------

_BPE_TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
]


def _batched_reference(texts, n_merges, batch):
    """Pure-Python mirror of bpe_train_batched (same admission rule,
    same headroom truncation, same fallback)."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[tuple(w)] += 1
    merges = []
    while len(merges) < n_merges:
        room = n_merges - len(merges)
        want = min(batch, room)
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        top = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[: want * textops.BPE_BATCH_HEADROOM]
        cands = [(ab, n) for ab, n in top if n >= 2]
        if not cands:
            break
        used_syms, used_products, selected = set(), set(), []
        for (a, b), n in cands:
            ab = a + b
            blocked = used_syms | used_products
            if a in blocked or b in blocked or ab in used_syms \
                    or ab in used_products:
                continue
            selected.append((a, b, n))
            used_syms.update((a, b))
            used_products.add(ab)
            if len(selected) == want:
                break
        if not selected:
            (a, b), n = cands[0]
            selected = [(a, b, n)]
        for a, b, n in selected:
            merges.append((len(merges) + 1, a, b, n))
        for a, b, _ in selected:
            new_vocab: Counter = Counter()
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[tuple(out)] += f
            vocab = new_vocab
    return merges


def _bpe_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_BPE_TEXTS)],
        "doc_id long, text string",
    )


def test_bpe_train_batched_batch1_equals_classic(spark):
    classic = [
        tuple(r)
        for r in textops.bpe_train(_bpe_docs(spark), n_merges=6).collect()
    ]
    batched = [
        tuple(r)
        for r in textops.bpe_train_batched(
            _bpe_docs(spark), n_merges=6, batch=1
        ).collect()
    ]
    assert batched == classic


def test_bpe_train_batched_matches_python_reference(spark):
    for batch in (2, 3, 4):
        got = [
            tuple(r)
            for r in textops.bpe_train_batched(
                _bpe_docs(spark), n_merges=8, batch=batch
            ).collect()
        ]
        want = _batched_reference(_BPE_TEXTS, 8, batch)
        assert got == want, f"batch={batch}"


def test_bpe_train_batched_fewer_rounds(spark):
    # the point of batching: n_merges merges in ~n/batch aggregates.
    # Verify indirectly: the learned table is full-length and every
    # round's merges are pairwise symbol-disjoint (the admission rule).
    rows = textops.bpe_train_batched(
        _bpe_docs(spark), n_merges=8, batch=4
    ).collect()
    assert len(rows) == 8
    assert [r["merge_rank"] for r in rows] == list(range(1, 9))


# ---------------------------------------------------------------------------
# embedding_norm_outliers
# ---------------------------------------------------------------------------


def _embs(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_norm_outliers_matches_numpy_reference(spark):
    import numpy as np

    from scholar_stream_spark.operators import similarity

    rows = _embs(spark).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        # sequential fold, then the op's 4-decimal rounding
        acc = 0.0
        for x in v:
            acc += float(x) * float(x)
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], round(__import__("math").sqrt(acc), 4))
        )
    expect = []
    for lbl, vs in by_label.items():
        ordered = sorted(vs, key=lambda t: (t[1], t[0]))
        n = len(ordered)
        q1 = ordered[(n + 3) // 4 - 1][1]
        q3 = ordered[(3 * n + 3) // 4 - 1][1]
        k = similarity.NORM_IQR_K
        lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)
        for vid, nm in vs:
            if nm < lo or nm > hi:
                expect.append((vid, lbl, nm))
    got = [
        (r["vec_id"], r["label"], r["norm"])
        for r in similarity.embedding_norm_outliers(_embs(spark)).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_norm_outliers_flags_planted_blowup(spark):
    from scholar_stream_spark.operators import similarity

    base = _embs(spark)
    dim = len(base.first()["embedding"])
    planted = base.unionByName(
        spark.createDataFrame(
            [(99991, [100.0] * dim, 0), (99992, [0.0] * dim, 0)],
            "vec_id long, embedding array<float>, label int",
        )
    )
    got = {
        r["vec_id"]
        for r in similarity.embedding_norm_outliers(planted).collect()
    }
    assert {99991, 99992} <= got


def test_norm_outliers_plan_broadcast_fences(spark):
    from scholar_stream_spark.operators import similarity

    plan = _plan(similarity.embedding_norm_outliers(_embs(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
