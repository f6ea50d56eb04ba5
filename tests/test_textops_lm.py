"""Unit semantics for the LM-quality text operators (the oracle pins
cross-engine parity at sf0.01; these pin the intended meaning)."""

from __future__ import annotations

import math

import pytest

from scholar_stream_spark.operators import textops


def test_bpe_unit_count(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello, world 123"),   # Hello | , | world | 123
            (2, "don't stop"),          # don | ' | t | stop
            (3, "abc"),                 # abc
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in textops.token_counts(docs).collect()
    }
    assert got == {1: 4, 2: 4, 3: 1}, got


def test_unigram_logprob_ranks_rare_docs_low(spark):
    # "common common" dominates the corpus; doc 3 is all rare tokens →
    # lowest mean log-probability / highest perplexity proxy
    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rare1"),
            (3, "rare2 rare3"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r for r in textops.unigram_logprob(docs).collect()
    }
    assert rows[1]["n_lm_tokens"] == 4
    assert rows[1]["logprob"] > rows[2]["logprob"] > rows[3]["logprob"]
    assert rows[3]["ppl"] > rows[2]["ppl"] > rows[1]["ppl"]
    # doc 1: every token has corpus count 6 of 9 → logprob = ln(6/9)
    assert abs(rows[1]["logprob"] - round(math.log(6 / 9), 4)) < 1e-9
    # ppl is the exp(-logprob) consistency contract (both rounded to 4)
    assert abs(rows[1]["ppl"] - round(math.exp(-math.log(6 / 9)), 4)) < 1e-3


def test_unigram_logprob_plan_broadcasts_total(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textops.unigram_logprob(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    # the 1-row corpus total must come in as a broadcast, never a SMJ
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cluster_embeddings_recovers_separated_groups(spark):
    import numpy as np

    from scholar_stream_spark.operators.similarity import cluster_embeddings

    rng = np.random.default_rng(7)
    dim = 8
    a = np.array([10.0] + [0.0] * (dim - 1))
    b = np.array([0.0] * (dim - 1) + [10.0])
    rows = []
    # seeds must cover both groups: vec_id 0 near a, vec_id 1 near b
    for i in range(40):
        base = a if i % 2 == 0 else b
        rows.append(
            (i, [float(x) for x in base + rng.normal(0, 0.05, dim)])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cluster_embeddings(emb, n_clusters=2, n_iters=3).collect()
    assert len(got) == 40
    by_group = {0: set(), 1: set()}
    for r in got:
        by_group[r["vec_id"] % 2].add(r["cluster_id"])
    # each parity group lands in exactly one cluster, and they differ
    assert len(by_group[0]) == 1 and len(by_group[1]) == 1
    assert by_group[0] != by_group[1]
    assert all(r["cos_to_centroid"] > 0.99 for r in got)


def test_cluster_embeddings_partition_invariant(spark):
    from scholar_stream_spark.operators.similarity import cluster_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = sorted(
        (r["vec_id"], r["cluster_id"], r["cos_to_centroid"])
        for r in cluster_embeddings(emb.coalesce(1)).collect()
    )
    many = sorted(
        (r["vec_id"], r["cluster_id"], r["cos_to_centroid"])
        for r in cluster_embeddings(emb.repartition(13)).collect()
    )
    assert one == many


def test_semantic_prune_drops_within_cluster_neardups(spark):
    import numpy as np

    from scholar_stream_spark.operators.similarity import semantic_prune

    rng = np.random.default_rng(11)
    dim = 8
    a = np.array([10.0] + [0.0] * (dim - 1))
    b = np.array([0.0] * (dim - 1) + [10.0])
    rows = []
    # group A: vec_ids 0,2,4 are ~identical (near-dups); group B: 1,3,5
    # are mutually distant directions within the same half-space
    for i in range(6):
        if i % 2 == 0:
            v = a + rng.normal(0, 0.01, dim)
        else:
            v = b.copy()
            v[i % dim] += 6.0  # distinct direction per member
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {
        r["vec_id"]
        for r in semantic_prune(
            emb, n_clusters=2, n_iters=2, threshold=0.95
        ).collect()
    }
    # of the identical A-group only the lowest id survives; every
    # mutually-distant B member survives
    assert 0 in kept and 2 not in kept and 4 not in kept
    assert {1, 3, 5} <= kept


def test_cluster_embeddings_seeds_from_gapped_id_space(spark):
    """Docstring contract: seeds are the n_clusters LOWEST vec_ids
    present — not literally vec_id < k — so a filtered / non-zero-based
    embeddings table still trains the full k clusters."""
    import numpy as np

    from scholar_stream_spark.operators.similarity import cluster_embeddings

    rng = np.random.default_rng(3)
    dim = 8
    a = np.array([10.0] + [0.0] * (dim - 1))
    b = np.array([0.0] * (dim - 1) + [10.0])
    rows = [
        (1000 + 7 * i, [float(x) for x in (a if i % 2 == 0 else b)
                        + rng.normal(0, 0.05, dim)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cluster_embeddings(emb, n_clusters=2, n_iters=3).collect()
    assert len(got) == 30
    assert len({r["cluster_id"] for r in got}) == 2


def test_cluster_embeddings_empty_train_sample_raises_clearly(spark):
    """An in-range train_fraction whose hash sample catches ZERO rows
    must fail with an actionable ValueError, not a numpy argmax crash
    in the final assignment kernel (round-5 advice)."""
    import pytest
    from pyspark.sql import functions as F

    from scholar_stream_spark.operators.sampling import sample_bucket
    from scholar_stream_spark.operators.similarity import cluster_embeddings

    base = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    # keep only ids hashing OUTSIDE bucket 0, so threshold 1 (the
    # smallest representable fraction) deterministically samples nothing
    emb = base.filter(sample_bucket("vec_id") >= F.lit(1))
    assert emb.count() >= 2
    with pytest.raises(ValueError, match="EMPTY training set"):
        cluster_embeddings(emb, n_clusters=2, n_iters=2,
                           train_fraction=0.000001)


def test_cluster_embeddings_too_few_rows_raises(spark):
    import pytest

    from scholar_stream_spark.operators.similarity import cluster_embeddings

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="need >= 3 rows"):
        cluster_embeddings(emb, n_clusters=3, n_iters=1)


def _prune_fixture(spark):
    """20 near-identical A vectors (one mega-cluster of mutual near-dups)
    + 2 distant B vectors, for pinning the scale-profile pairing cap."""
    import numpy as np

    rng = np.random.default_rng(23)
    dim = 8
    a = np.array([10.0] + [0.0] * (dim - 1))
    b = np.array([0.0] * (dim - 1) + [10.0])
    rows = [(i, [float(x) for x in a + rng.normal(0, 0.01, dim)])
            for i in range(20)]
    rows += [(100, [float(x) for x in b]),
             (101, [float(x) for x in b + np.eye(dim)[3] * 8])]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semantic_prune_scale_profile_noop_when_under_cap(spark):
    """With every cluster at or under the cap the scale profile is
    byte-identical to the portable/oracle profile."""
    from scholar_stream_spark.operators.similarity import semantic_prune

    emb = _prune_fixture(spark)
    base = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in semantic_prune(emb, n_clusters=2, n_iters=2).collect()
    )
    capped = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in semantic_prune(
            emb, n_clusters=2, n_iters=2, profile="scale"
        ).collect()
    )
    assert base == capped
    # the A mega-group collapses to its lowest id either way
    a_survivors = [v for v, _ in base if v < 100]
    assert a_survivors == [0]


def test_semantic_prune_cluster_cap_bounds_pairing(spark):
    """An explicit sub-quadratic cap sub-splits the mega-cluster: pairs
    only form within a hash block, so the capped run keeps a superset of
    the uncapped survivors (>= one survivor per block) while never
    resurrecting a cross-block drop that an in-block witness also covers.
    """
    from scholar_stream_spark.operators.similarity import semantic_prune

    emb = _prune_fixture(spark)
    uncapped = {
        r["vec_id"]
        for r in semantic_prune(emb, n_clusters=2, n_iters=2).collect()
    }
    capped = {
        r["vec_id"]
        for r in semantic_prune(
            emb,
            n_clusters=2,
            n_iters=2,
            profile="scale",
            max_cluster_pairing=5,
        ).collect()
    }
    assert uncapped <= capped
    # with 20 A-members and cap 5 there are >= 2 blocks, each keeping at
    # least its own lowest id -> strictly more survivors than uncapped
    a_uncapped = {v for v in uncapped if v < 100}
    a_capped = {v for v in capped if v < 100}
    assert a_uncapped == {0}
    assert len(a_capped) > 1
    # ...but still far fewer than the 20 raw members: each block pruned
    assert len(a_capped) <= 4  # ceil(20/5) = 4 blocks
    # distant B members always survive
    assert {100, 101} <= capped


def test_semantic_prune_rejects_unknown_profile(spark):
    import pytest

    from scholar_stream_spark.operators.similarity import semantic_prune

    emb = _prune_fixture(spark)
    with pytest.raises(ValueError, match="unknown profile"):
        semantic_prune(emb, profile="nope")


def test_cluster_embeddings_sampled_training(spark):
    """train_fraction trains the centroids on a deterministic hash
    sample but still assigns EVERY vector — groups recovered, output
    partition-invariant, bad fractions rejected."""
    import numpy as np
    import pytest as _pytest

    from scholar_stream_spark.operators.similarity import cluster_embeddings

    rng = np.random.default_rng(13)
    dim = 8
    a = np.array([10.0] + [0.0] * (dim - 1))
    b = np.array([0.0] * (dim - 1) + [10.0])
    rows = [
        (i, [float(x) for x in (a if i % 2 == 0 else b)
             + rng.normal(0, 0.05, dim)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cluster_embeddings(
        emb, n_clusters=2, n_iters=3, train_fraction=0.5
    ).collect()
    assert len(got) == 60  # every vector assigned, not just the sample
    by_group = {0: set(), 1: set()}
    for r in got:
        by_group[r["vec_id"] % 2].add(r["cluster_id"])
    assert len(by_group[0]) == 1 and len(by_group[1]) == 1
    assert by_group[0] != by_group[1]
    # deterministic under repartitioning (hash sample is hash-based)
    again = cluster_embeddings(
        emb.repartition(7), n_clusters=2, n_iters=3, train_fraction=0.5
    ).collect()
    assert sorted((r["vec_id"], r["cluster_id"]) for r in got) == sorted(
        (r["vec_id"], r["cluster_id"]) for r in again
    )
    with _pytest.raises(ValueError, match="train_fraction"):
        cluster_embeddings(emb, n_clusters=2, train_fraction=1.5)


def test_bigram_logprob_ranks_unseen_sequences_low(spark):
    """Bigram scoring catches what unigram can't: doc 3 reuses only
    common TOKENS but in sequences seen nowhere else, so it scores
    below the docs whose bigrams dominate the corpus."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat the cat sat the cat sat"),
            (2, "the cat sat quietly"),
            (3, "sat the cat the"),  # common words, novel bigrams
            (4, "x"),                # single token: no bigrams, omitted
        ],
        ["doc_id", "text"],
    )
    from scholar_stream_spark.operators.textops import bigram_logprob

    rows = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_bigrams"] == 8
    assert rows[1]["logprob"] > rows[3]["logprob"]
    assert rows[3]["ppl"] > rows[1]["ppl"]
    # every conditional is well-defined (trained on what it scores)
    assert all(r["logprob"] <= 0 for r in rows.values())


def test_clean_lines_c4_rules(spark):
    from scholar_stream_spark.operators.textops import clean_lines

    text = "\n".join(
        [
            "A perfectly good sentence stays here.",   # kept
            "short.",                                  # <3 words
            "no terminal punctuation on this line",    # no terminal
            "Please enable JavaScript to continue.",   # marker (ci)
            "var config = { debug: true };",           # brace + no term.
            'He said "stop".',                         # kept (. terminal)
            "",                                        # empty
        ]
    )
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = clean_lines(docs).collect()[0]
    assert r["n_lines"] == 7
    assert r["n_kept_lines"] == 2
    assert r["clean_text"] == (
        'A perfectly good sentence stays here.\nHe said "stop".'
    )


def test_corpus_data_card_rollup(spark):
    from scholar_stream_spark.operators.textops import corpus_data_card

    docs = spark.createDataFrame(
        [
            (1, "en", "one two three four five six"),
            (2, "en", "a b c d e f g h"),
            (3, "de", "der die das und aber"),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in corpus_data_card(docs).collect()}
    assert set(rows) == {"en", "de", "TOTAL"}
    assert rows["en"]["n_docs"] == 2 and rows["de"]["n_docs"] == 1
    assert rows["TOTAL"]["n_docs"] == 3
    assert rows["TOTAL"]["n_tokens"] == (
        rows["en"]["n_tokens"] + rows["de"]["n_tokens"]
    )
    assert rows["en"]["p50_doc_tokens"] == 7.0  # median of 6 and 8


def test_blocklist_filter_word_boundary_and_case(spark):
    """Doc-level C4 blocklist semantics: token-bounded match (the word
    inside a longer token must NOT trigger), case-insensitive, URL
    pattern anywhere, and the verdict disjunction."""
    docs = spark.createDataFrame(
        [
            (1, "an honest essay about sparrows"),
            (2, "try this GAMBLING site today"),       # word, mixed case
            (3, "gamblingly speaking, all is well"),   # boundary non-match
            (4, "click http://bit.ly/xy now"),         # URL pattern
            (5, "spamword. and tinyurl.com/z too"),    # both
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in textops.blocklist_filter(docs).collect()
    }
    assert len(rows) == 5
    assert not rows[1]["blocked"] and not rows[3]["blocked"]
    assert rows[2]["has_block_word"] and not rows[2]["has_block_url"]
    assert rows[4]["has_block_url"] and not rows[4]["has_block_word"]
    assert rows[5]["has_block_word"] and rows[5]["has_block_url"]
    assert all(
        rows[i]["blocked"] == (rows[i]["has_block_word"] or rows[i]["has_block_url"])
        for i in rows
    )


def test_blocklist_filter_rejects_regex_metacharacters(spark):
    """The word list compiles into a regex alternation, so a word with
    metacharacters would silently change semantics — must raise."""
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="regex-literal"):
        textops.blocklist_filter(docs, words=("a.b",))


def test_blocklist_filter_plan_is_narrow(spark):
    """Zero joins and zero exchanges beyond scale_out's round-robin:
    the verdict is a per-row codegen projection — the only acceptable
    shape for a predicate that runs over every document at 100 TB."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        textops.blocklist_filter(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_gopher_quality_rule_metrics(spark):
    """Each Gopher A1.1 rule fires on its constructed document, and a
    clean document passes the whole gate."""
    stop_tail = " the words be put to good use and more of that"  # 5 stopwords
    clean = ("solid sentence with plenty varied words repeated here " * 5
             + stop_tail)
    docs = spark.createDataFrame(
        [
            (1, clean),                                     # passes all
            (2, "too short" + stop_tail),                   # word-count fail
            (3, " ".join(["x"] * 60) + stop_tail),          # mean-word-len fail
            (4, "\n".join(["• point here"] * 10) + stop_tail),  # bullet fail
            (5, "\n".join(["trailing off..."] * 10) + stop_tail),  # ellipsis
            (6, " ".join(["1234"] * 60) + stop_tail),       # alpha-frac fail
            (7, " ".join(["w#rd#"] * 60) + stop_tail),      # symbol fail
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.gopher_quality(docs).collect()}
    assert rows[1]["passes"] and rows[1]["n_stopwords_present"] >= 2
    assert rows[2]["n_words"] < textops.GOPHER_MIN_WORDS
    assert not rows[2]["passes"]
    assert rows[3]["mean_word_len"] < textops.GOPHER_MIN_MEAN_WORD_LEN
    assert not rows[3]["passes"]
    assert rows[4]["bullet_line_frac"] > textops.GOPHER_MAX_BULLET_LINE_FRAC
    assert not rows[4]["passes"]
    assert (
        rows[5]["ellipsis_line_frac"] > textops.GOPHER_MAX_ELLIPSIS_LINE_FRAC
    )
    assert not rows[5]["passes"]
    assert rows[6]["alpha_word_frac"] < textops.GOPHER_MIN_ALPHA_WORD_FRAC
    assert not rows[6]["passes"]
    assert (
        rows[7]["symbol_word_ratio"] > textops.GOPHER_MAX_SYMBOL_WORD_RATIO
    )
    assert not rows[7]["passes"]


def test_gopher_quality_plan_is_narrow(spark):
    """Like blocklist_filter: one codegen projection, no joins, no
    exchanges beyond scale_out — nothing may grow with corpus size."""
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        textops.gopher_quality(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_gopher_repetition_hand_computed(spark):
    """Exact fractions on constructed docs: dup lines, top-2/3-gram
    coverage (incl. the overlap cap), duplicated-5-gram position-
    coverage union, and the empty-doc guard."""
    docs = spark.createDataFrame(
        [
            (1, "unique words only here today"),
            (2, "same line\nsame line\nother line"),
            (3, "go go go go go go"),
            (4, "a b c d e a b c d e x y z"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in textops.gopher_repetition(docs).collect()
    }
    # doc 1: nothing repeats; top grams are single occurrences
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["top_2gram_char_frac"] == round(12 / 28, 4)  # "unique words"
    assert rows[1]["top_3gram_char_frac"] == round(17 / 28, 4)
    assert rows[1]["dup_5gram_char_frac"] == 0.0
    # doc 2: "same line" twice out of 3 lines; chars 18 of 28
    assert rows[2]["dup_line_frac"] == round(2 / 3, 4)
    assert rows[2]["dup_line_char_frac"] == round(18 / 28, 4)
    assert rows[2]["top_2gram_char_frac"] == round(18 / 30, 4)
    # doc 3: self-overlapping "go go" x5 would give 25/17 -> capped
    assert rows[3]["top_2gram_char_frac"] == 1.0
    assert rows[3]["top_3gram_char_frac"] == 1.0
    assert rows[3]["dup_5gram_char_frac"] == 1.0  # all positions covered
    # doc 4: "a b c d e" twice covers tokens 0..9 of 13 (10 chars of 13)
    assert rows[4]["dup_5gram_char_frac"] == round(10 / 13, 4)
    assert rows[4]["top_2gram_char_frac"] == round(6 / 25, 4)
    assert rows[4]["top_3gram_char_frac"] == round(10 / 25, 4)
    # doc 5: empty text -> all zeros, no division error
    assert all(
        rows[5][c] == 0.0
        for c in (
            "dup_line_frac",
            "dup_line_char_frac",
            "top_2gram_char_frac",
            "top_3gram_char_frac",
            "dup_5gram_char_frac",
        )
    )


def test_gopher_repetition_plan_is_corpus_linear(spark):
    """One unit explode -> one (doc_id, n, gram) count -> one per-doc
    regroup -> one doc_id join back: every key contains doc_id, so no
    stage is pairwise and no gram ever crosses documents. Pin: no
    cartesian/BNLJ, and the joins are doc_id equi-joins only."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i} common tokens here") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        textops.gopher_repetition(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_blocklist_filter_empty_word_list_means_no_word_rule(spark):
    """words=() must disable the word rule (an empty alternation would
    be \\b()\\b and match every document), leaving URL-only filtering."""
    docs = spark.createDataFrame(
        [(1, "plain words"), (2, "see bit.ly/x")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textops.blocklist_filter(docs, words=()).collect()
    }
    assert not rows[1]["has_block_word"] and not rows[1]["blocked"]
    assert not rows[2]["has_block_word"] and rows[2]["blocked"]
