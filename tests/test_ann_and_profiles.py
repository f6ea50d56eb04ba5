"""ANN variants (IVF-Flat) + fast hash profile for the sketch dedup ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import dedup, similarity
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _topk_sets(rows):
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return by_q


def test_ivf_shape_and_ordering(emb):
    rows = similarity.ivf_topk(emb).collect()
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


def test_ivf_recall_vs_exact(emb):
    exact = _topk_sets(similarity.cosine_topk(emb).collect())
    approx = _topk_sets(similarity.ivf_topk(emb).collect())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # 2-probe IVF over 16 cells: expect decent but not perfect recall
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_ivf_cells_cover_corpus(emb):
    # every corpus vector lands in exactly one cell after refinement
    corpus = similarity.scale_out(emb).select(
        "vec_id",
        "embedding",
        similarity.l2_norm(F.col("embedding")).alias("norm"),
    )
    seeds = corpus.filter(
        F.col("vec_id") < similarity.IVF_NUM_CENTROIDS
    ).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("c_embedding"),
        F.col("norm").alias("c_norm"),
    )
    assigned = similarity._assign_cells(corpus, seeds, n_best=1)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()


def test_pandas_cosine_matches_expression_cosine(emb):
    # the numpy/BLAS kernel must agree with the JVM-expression baseline
    expr_rows = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb).collect()
    }
    vec_rows = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk_pandas(emb).collect()
    }
    assert set(expr_rows) == set(vec_rows)
    for key, v in expr_rows.items():
        assert abs(v - vec_rows[key]) < 1e-9, key


def test_lsh_recall_floor(emb):
    r = similarity.ann_recall(emb, "lsh").first()
    assert r["recall"] >= 0.8, f"LSH recall {r['recall']}"
    assert r["n_exact"] == similarity.ANN_NUM_QUERIES * similarity.ANN_TOPK


def test_ivf_recall_floor(emb):
    r = similarity.ann_recall(emb, "ivf").first()
    assert r["recall"] >= 0.8, f"IVF recall {r['recall']}"


def test_int8_recall_floor(emb):
    """int8 quantization perturbs cosine by sub-1%, so its top-k should
    be near-perfect — a much tighter floor than the bucketing paths."""
    r = similarity.ann_recall(emb, "int8").first()
    assert r["recall"] >= 0.9, f"int8 recall {r['recall']}"
    assert r["n_exact"] == similarity.ANN_NUM_QUERIES * similarity.ANN_TOPK


def test_int8_returns_full_topk_per_query(emb):
    got = similarity.cosine_topk_int8(emb).collect()
    assert len(got) == similarity.ANN_NUM_QUERIES * similarity.ANN_TOPK
    by_q = {}
    for row in got:
        by_q.setdefault(row["query_id"], []).append(row["rank"])
    assert all(
        sorted(v) == list(range(1, similarity.ANN_TOPK + 1))
        for v in by_q.values()
    )


def test_lsh_returns_full_topk(emb):
    # multi-table LSH must surface enough candidates for a full top-k
    assert similarity.lsh_ann_topk(emb).count() == (
        similarity.ANN_NUM_QUERIES * similarity.ANN_TOPK
    )


def test_recall_unknown_method_rejected(emb):
    with pytest.raises(ValueError):
        similarity.ann_recall(emb, "faiss")


def test_assign_cells_n_best_1_is_narrow(emb):
    # the corpus-pass assignment must be a zero-shuffle argmax: no
    # ranking Window, no Exchange keyed on vec_id anywhere in the plan
    corpus = similarity.scale_out(emb).select(
        "vec_id",
        "embedding",
        similarity.l2_norm(F.col("embedding")).alias("norm"),
    )
    seeds = corpus.filter(
        F.col("vec_id") < similarity.IVF_NUM_CENTROIDS
    ).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("c_embedding"),
        F.col("norm").alias("c_norm"),
    )
    assigned = similarity._assign_cells(corpus, seeds, n_best=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_assign_cells_argmax_matches_window(emb):
    # the argmax path must pick exactly the cells the window path picked
    corpus = similarity.scale_out(emb).select(
        "vec_id",
        "embedding",
        similarity.l2_norm(F.col("embedding")).alias("norm"),
    )
    seeds = corpus.filter(
        F.col("vec_id") < similarity.IVF_NUM_CENTROIDS
    ).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("c_embedding"),
        F.col("norm").alias("c_norm"),
    )
    fast = {
        r["vec_id"]: r["cell"]
        for r in similarity._assign_cells(corpus, seeds, 1).collect()
    }
    # reference: the (tiny-n only) window implementation
    from pyspark.sql import Window

    scored = corpus.join(F.broadcast(seeds))
    sim = similarity.cosine_from_norms(
        F.col("embedding"), F.col("c_embedding"), F.col("norm"), F.col("c_norm")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    slow = {
        r["vec_id"]: r["cell"]
        for r in scored.withColumn("c_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
        .collect()
    }
    assert fast == slow


def test_fast_hash_profile_minhash(docs):
    fast = dedup.minhash_lsh_pairs(docs, hash_profile="fast").collect()
    exact = dedup.ngram_jaccard_pairs(docs).collect()
    exact_pairs = {(r["d1"], r["d2"]) for r in exact}
    # verify step guarantees precision: every emitted pair is a true pair
    assert {(r["d1"], r["d2"]) for r in fast} <= exact_pairs
    # and recall stays high on this corpus
    assert len(fast) >= 0.8 * len(exact_pairs)


def test_fast_hash_profile_simhash(docs):
    fast = dedup.simhash_pairs(docs, hash_profile="fast")
    assert fast.filter(
        F.col("hamming") > dedup.SIMHASH_HAMMING_MAX
    ).count() == 0


def test_unknown_hash_profile_rejected(docs):
    with pytest.raises(ValueError):
        dedup.minhash_signatures(docs, hash_profile="md5-but-wrong")


def test_ivf_trains_on_gapped_id_space(spark):
    """Seeds are the lowest vec_ids PRESENT — a filtered/offset id space
    still trains a full quantizer and returns per-query top-k for the
    id-contract queries that exist."""
    import numpy as np

    from scholar_stream_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(5)
    # ids 0..9 exist (the query contract), then a gap, then 500+
    rows = [(i, [float(x) for x in rng.normal(0, 1, 64)]) for i in range(10)]
    rows += [(500 + i, [float(x) for x in rng.normal(0, 1, 64)])
             for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = ivf_topk(emb).collect()
    assert len(got) > 0
    assert {r["query_id"] for r in got} <= set(range(10))


def test_ivf_too_few_vectors_raises(spark):
    import pytest as _pytest

    from scholar_stream_spark.operators.similarity import ivf_topk

    emb = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [0.5] * 64)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="train the"):
        ivf_topk(emb)


def test_ivf_append_index_serves_new_vectors_exactly(spark, tmp_path):
    """Build the index on half the corpus, append the other half with
    the FROZEN quantizer, then probe EXHAUSTIVELY: results must equal
    brute-force exact top-k over the FULL corpus — appended vectors are
    first-class index citizens regardless of which quantizer trained."""
    from scholar_stream_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cut = 25
    path = str(tmp_path / "ivf_app")
    similarity.write_ivf_index(emb.filter(F.col("vec_id") < cut), path)
    similarity.ivf_append_index(emb.filter(F.col("vec_id") >= cut), path)

    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(
            F.col("vec_id") < similarity.ANN_NUM_QUERIES
        ).select("vec_id", "embedding").collect()
    ]
    probed = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.ivf_probe_index(
            spark, path, queries, n_probe=similarity.IVF_NUM_CENTROIDS
        ).collect()
    )
    exact = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.cosine_topk(emb).collect()
    )
    assert probed == exact


def test_ivf_index_roundtrip_matches_inline_and_prunes(spark, tmp_path):
    """write_ivf_index + ivf_probe_index must (a) return the same top-k
    as the inline ivf_topk (same quantizer, same probes, same re-rank)
    and (b) plan the probe read with partition pruning — only the probed
    cells' directories are scanned."""
    from scholar_stream_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, path)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter("vec_id < 10").collect()
    ]
    probed = similarity.ivf_probe_index(spark, path, queries)
    inline = similarity.ivf_topk(emb)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in probed.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in inline.collect()
    )
    assert got == want and len(got) > 0
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    # the cell IN filter must reach partition pruning, not a post-scan
    # Filter over every file
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan


def test_compact_ivf_index_probe_identical_fewer_files(spark, tmp_path):
    """Build on half the corpus, append the rest in three micro-batches
    (accreting small files per cell), compact, then check the three
    compaction promises: (a) exhaustive probe over the compacted index
    equals brute-force exact top-k, (b) the vectors table folds back to
    ~one file per cell (strictly fewer files than the appended layout),
    (c) the frozen quantizer is copied bit-identically."""
    import glob
    import os

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cut = 25
    path = str(tmp_path / "ivf_acc")
    similarity.write_ivf_index(emb.filter(F.col("vec_id") < cut), path)
    for lo, hi in ((cut, cut + 10), (cut + 10, cut + 20), (cut + 20, 1 << 40)):
        similarity.ivf_append_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path,
        )
    files = lambda p: glob.glob(  # noqa: E731
        os.path.join(p, "vectors", "**", "*.parquet"), recursive=True
    )
    out = str(tmp_path / "ivf_compact")
    similarity.compact_ivf_index(spark, path, out)
    assert len(files(out)) < len(files(path))
    assert len(files(out)) <= similarity.IVF_NUM_CENTROIDS

    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < similarity.ANN_NUM_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    probed = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.ivf_probe_index(
            spark, out, queries, n_probe=similarity.IVF_NUM_CENTROIDS
        ).collect()
    )
    exact = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.cosine_topk(emb).collect()
    )
    assert probed == exact
    q_in = sorted(
        map(tuple, spark.read.parquet(f"{path}/quantizer").collect())
    )
    q_out = sorted(
        map(tuple, spark.read.parquet(f"{out}/quantizer").collect())
    )
    assert q_in == q_out


def test_ivf_append_default_probe_recall_floor(spark, tmp_path):
    """The serving question after appends: exhaustive-probe exactness
    (pinned above) says nothing about DEFAULT n_probe quality once the
    frozen quantizer has drifted from the appended distribution. Pin a
    recall floor for the default-probe path over a half-built,
    half-appended index vs brute-force exact (deterministic: fixed
    seeds, fixed testdata — measured 0.82 at sf0.001)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cut = 25
    path = str(tmp_path / "ivf_recall")
    similarity.write_ivf_index(emb.filter(F.col("vec_id") < cut), path)
    similarity.ivf_append_index(emb.filter(F.col("vec_id") >= cut), path)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < similarity.ANN_NUM_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_probe_index(spark, path, queries).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.75, f"post-append default-probe recall {recall:.2f}"
