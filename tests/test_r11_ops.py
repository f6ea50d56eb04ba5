"""Round-11 operators: product-quantization ANN family.

PQ (Jégou et al. 2011) is iterative float k-means per subspace — no SQL
oracle is possible (``cluster_embeddings``' rationale), so these pins ARE
the correctness story: shape/ordering contracts, determinism under
repartitioning, training-progress monotonicity, and measured recall
floors for both the pure-ADC scan and the re-ranked serving path.
"""

from __future__ import annotations

import numpy as np
import pytest

from scholar_stream_spark.operators import similarity
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_sets(emb):
    by_q = {}
    for r in similarity.cosine_topk_pandas(emb).collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return by_q


def _topk_sets(rows):
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return by_q


def _recall(approx, exact):
    total = sum(len(v) for v in exact.values())
    hits = sum(
        len(approx.get(q, set()) & exact[q]) for q in exact
    )
    return hits / total


def test_pq_train_shape_and_counts(emb):
    rows = similarity.pq_train(emb).collect()
    m, k = similarity.PQ_NUM_SUBSPACES, similarity.PQ_CODEBOOK_SIZE
    assert len(rows) == m * k
    n = emb.count()
    dsub = similarity.EMBED_DIM // m
    by_sub = {}
    for r in rows:
        assert 0 <= r["code"] < k
        assert len(r["centroid"]) == dsub
        by_sub[r["subspace"]] = by_sub.get(r["subspace"], 0) + r["cell_count"]
    # every subspace partitions the whole corpus across its codes
    assert by_sub == {j: n for j in range(m)}


def test_pq_codes_contract(emb):
    rows = similarity.pq_codes(emb).collect()
    assert len(rows) == emb.count()
    m, k = similarity.PQ_NUM_SUBSPACES, similarity.PQ_CODEBOOK_SIZE
    for r in rows:
        assert len(r["codes"]) == m
        assert all(0 <= c < k for c in r["codes"])
        assert -1.0001 <= r["recon_cos"] <= 1.0001
    # lossy but useful: reconstruction points the right way on average
    mean_cos = float(np.mean([r["recon_cos"] for r in rows]))
    assert mean_cos > 0.5, mean_cos


def test_pq_codes_partition_invariant(emb):
    a = {
        r["vec_id"]: (tuple(r["codes"]), r["recon_cos"])
        for r in similarity.pq_codes(emb).collect()
    }
    b = {
        r["vec_id"]: (tuple(r["codes"]), r["recon_cos"])
        for r in similarity.pq_codes(emb.repartition(7)).collect()
    }
    assert a == b


def test_pq_training_reduces_quantization_error(emb):
    """Lloyd rounds must not hurt: mean reconstruction cosine after the
    default iterations beats the seed codebook (0 refinement rounds)."""
    seed_cb = similarity._pq_seed_codebook(
        emb, similarity.PQ_NUM_SUBSPACES, similarity.PQ_CODEBOOK_SIZE
    )
    seed_cos = np.mean(
        [
            r["recon_cos"]
            for r in similarity.pq_codes(emb, codebook=seed_cb).collect()
        ]
    )
    trained_cos = np.mean(
        [r["recon_cos"] for r in similarity.pq_codes(emb).collect()]
    )
    assert trained_cos > seed_cos, (trained_cos, seed_cos)


def test_ann_pq_topk_shape_and_ordering(emb):
    rows = similarity.ann_pq_topk(emb).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == similarity.ANN_NUM_QUERIES
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert len(rs) <= similarity.ANN_TOPK
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert q not in {r["neighbor_id"] for r in rs}


def test_ann_pq_topk_partition_invariant(emb):
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.ann_pq_topk(emb).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.ann_pq_topk(emb.repartition(7)).collect()
    )
    assert a == b


def test_pq_recall_floor_and_rerank_improvement(emb, exact_sets):
    """The quality contract: pure ADC is the compressed-domain floor,
    the re-ranked serving path must be strictly better and clear 0.6
    (measured 0.74 at sf0.001 with the default shortlist)."""
    adc = _recall(
        _topk_sets(similarity.ann_pq_topk(emb).collect()), exact_sets
    )
    rr = _recall(
        _topk_sets(similarity.ann_pq_rerank_topk(emb).collect()), exact_sets
    )
    assert adc >= 0.1, adc
    assert rr >= 0.6, rr
    assert rr > adc, (rr, adc)


def test_pq_recall_via_ann_recall_harness(emb):
    r = similarity.ann_recall(emb, "pq").first()
    assert r["method"] == "pq"
    assert r["n_exact"] > 0
    assert 0.0 <= r["recall"] <= 1.0
    assert r["recall"] >= 0.1


def test_pq_rerank_topk_matches_exact_on_shared_neighbors(emb):
    """Where the re-ranked path returns a neighbor that the exact path
    also ranks, the cosine must be the EXACT value (the re-rank kernel
    is the exact kernel — round-4 equality)."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk_pandas(emb).collect()
    }
    for r in similarity.ann_pq_rerank_topk(emb).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(r["cos_sim"] - exact[key]) < 1e-9


# --- BM25 ranked retrieval -------------------------------------------------

import math

from scholar_stream_spark.operators import textops


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_bm25_shape_and_ordering(docs):
    rows = textops.bm25_search(docs).collect()
    assert rows, "demo queries must hit the synthetic corpus"
    by_q = {}
    for r in rows:
        assert r["score"] > 0
        by_q.setdefault(r["query"], []).append(r)
    assert set(by_q) <= {qid for qid, _ in textops.BM25_QUERIES}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert len(rs) <= textops.BM25_TOPK
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_bm25_partition_invariant(docs):
    a = sorted(map(tuple, textops.bm25_search(docs).collect()))
    b = sorted(map(tuple, textops.bm25_search(docs.repartition(7)).collect()))
    assert a == b


def test_bm25_matches_pure_python_reference(spark):
    """Exact-value pin on a constructed corpus: the operator's scores
    must equal a from-the-paper Python BM25 (Lucene idf variant) to
    float equality after round-4."""
    corpus = {
        1: "hash join hash hash",
        2: "join table scan",
        3: "window agg stream window",
        4: "the quick brown fox",
        5: "hash",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    k1, b = textops.BM25_K1, textops.BM25_B
    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n

    def score(terms, d):
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            df_t = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl)
            )
        return s

    expected = {}
    for qid, terms in textops.BM25_QUERIES:
        scored = [
            (d, score(terms, d)) for d in corpus if score(terms, d) > 0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[: textops.BM25_TOPK], 1):
            expected[(qid, d)] = (round(s, 4), rank)

    got = {
        (r["query"], r["doc_id"]): (r["score"], r["rank"])
        for r in textops.bm25_search(df).collect()
    }
    assert got == expected
