"""Unit semantics for the LM-quality text operators (the oracle pins
cross-engine parity at sf0.01; these pin the intended meaning)."""

from __future__ import annotations

import math

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
