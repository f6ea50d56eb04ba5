"""Streaming dedup ingest: document stream → append-only deduped
corpus + fingerprint index.

Drives ``start_dedup_ingest`` with a file-source stream in two
availableNow passes: cross-batch duplicates are dropped by the index,
in-batch duplicates collapse to the smallest doc_id, and replaying an
already-landed batch (the at-least-once failure mode) leaves corpus
and index unchanged.
"""

from __future__ import annotations

import json

from tests.conftest import SF_SMALL

from scholar_stream_spark.streaming.dedup_ingest import (
    ingest_batch,
    read_index,
    start_dedup_ingest,
)

DOC_SCHEMA = "doc_id long, text string"


def _write_docs(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch_{len(list(path.iterdir()))}.ndjson"
    f.write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t}) for i, t in rows
        )
        + "\n"
    )


def _run_once(spark, inbox, corpus, index, ckpt):
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(inbox))
    q = start_dedup_ingest(
        stream,
        corpus_path=str(corpus),
        index_path=str(index),
        checkpoint_path=str(ckpt),
        trigger_available_now=True,
    )
    q.awaitTermination(120)


def _corpus_ids(spark, corpus):
    return sorted(
        r["doc_id"]
        for r in spark.read.option("basePath", str(corpus))
        .parquet(str(corpus))
        .collect()
    )


def test_dedup_ingest_two_batches(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    ckpt, inbox = tmp_path / "ckpt", tmp_path / "in"

    _write_docs(
        inbox,
        [(1, "first unique doc"), (2, "second unique doc"),
         (3, "first unique doc")],  # in-batch dup of 1
    )
    _run_once(spark, inbox, corpus, index, ckpt)
    assert _corpus_ids(spark, corpus) == [1, 2]

    _write_docs(
        inbox,
        [(4, "second  UNIQUE doc"),  # cross-batch dup after normalize
         (5, "a genuinely new doc")],
    )
    _run_once(spark, inbox, corpus, index, ckpt)
    assert _corpus_ids(spark, corpus) == [1, 2, 5]
    # index carries exactly the corpus fingerprints, no dups
    fps = [r["fingerprint"] for r in read_index(spark, str(index)).collect()]
    assert len(fps) == len(set(fps)) == 3


def test_dedup_ingest_replay_is_noop(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    b0 = spark.createDataFrame(
        [(1, "doc one"), (2, "doc two")], DOC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(3, "doc one"), (4, "doc three")], DOC_SCHEMA
    )
    ingest_batch(b0, 0, str(corpus), str(index))
    ingest_batch(b1, 1, str(corpus), str(index))
    before = _corpus_ids(spark, corpus)
    assert before == [1, 2, 4]

    # redelivery of batch 1 (crash before checkpoint commit): the
    # replay must not erase batch 1's rows (self-exclusion) nor
    # duplicate batch 0's
    ingest_batch(b1, 1, str(corpus), str(index))
    assert _corpus_ids(spark, corpus) == before
    fps = [r["fingerprint"] for r in read_index(spark, str(index)).collect()]
    assert len(fps) == len(set(fps)) == 3


def test_dedup_ingest_in_batch_docid_redelivery(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    # doc 7 delivered twice in ONE micro-batch (source redelivery):
    # must land exactly once in the corpus
    b0 = spark.createDataFrame(
        [(7, "same doc"), (7, "same doc"), (8, "other doc")], DOC_SCHEMA
    )
    ingest_batch(b0, 0, str(corpus), str(index))
    assert _corpus_ids(spark, corpus) == [7, 8]


def test_dedup_ingest_bloom_gated_matches_plain(spark, tmp_path):
    """The Bloom-gated ingest must land the IDENTICAL corpus/index as
    the plain probe over the same batch sequence — the sidecar is an
    access-path optimization — and the per-batch bloom deltas must
    accrete one partition per landed batch."""
    plain_c, plain_i = tmp_path / "pc", tmp_path / "pi"
    bloom_c, bloom_i = tmp_path / "bc", tmp_path / "bi"
    bloom_b = tmp_path / "bb"
    batches = [
        [(1, "doc one"), (2, "doc two"), (3, "doc one")],
        [(4, "doc two"), (5, "doc five")],
        [(6, "doc five"), (7, "doc seven")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        ingest_batch(df, i, str(plain_c), str(plain_i))
        ingest_batch(df, i, str(bloom_c), str(bloom_i), str(bloom_b))
    assert _corpus_ids(spark, plain_c) == _corpus_ids(spark, bloom_c)
    plain_fps = sorted(
        r["fingerprint"]
        for r in read_index(spark, str(plain_i)).collect()
    )
    bloom_fps = sorted(
        r["fingerprint"]
        for r in read_index(spark, str(bloom_i)).collect()
    )
    assert plain_fps == bloom_fps
    deltas = {
        p.name for p in bloom_b.iterdir() if p.name.startswith("batch=")
    }
    assert deltas == {"batch=0", "batch=1", "batch=2"}


def test_dedup_ingest_bloom_replay_is_noop(spark, tmp_path):
    """Replaying a landed batch with the Bloom gate on must leave
    corpus, index, AND the merged filter unchanged (the delta is
    batch_id-keyed and self-excluded like every other write)."""
    from scholar_stream_spark.streaming.dedup_ingest import read_bloom

    corpus, index, bloom = tmp_path / "c", tmp_path / "i", tmp_path / "b"
    b0 = spark.createDataFrame([(1, "doc one"), (2, "doc two")], DOC_SCHEMA)
    b1 = spark.createDataFrame([(3, "doc one"), (4, "doc four")], DOC_SCHEMA)
    ingest_batch(b0, 0, str(corpus), str(index), str(bloom))
    ingest_batch(b1, 1, str(corpus), str(index), str(bloom))
    before_ids = _corpus_ids(spark, corpus)
    before_bloom = sorted(
        map(tuple, read_bloom(spark, str(bloom)).collect())
    )
    assert before_ids == [1, 2, 4]

    ingest_batch(b1, 1, str(corpus), str(index), str(bloom))
    assert _corpus_ids(spark, corpus) == before_ids
    after_bloom = sorted(
        map(tuple, read_bloom(spark, str(bloom)).collect())
    )
    assert after_bloom == before_bloom and len(after_bloom) > 0


def test_dedup_ingest_bloom_enabled_midstream_backfills(spark, tmp_path):
    """Enabling bloom_path on an index that already has pre-sidecar
    batches must NOT admit their duplicates: the coverage gate detects
    the missing deltas, backfills them from the index's own landed
    fingerprints, and the duplicate still drops. (Without the gate,
    read_bloom would merge only the landed deltas, the pre-bloom
    fingerprints would probe maybe=False, and the dup would land in
    corpus AND index permanently.)"""
    from scholar_stream_spark.streaming.dedup_ingest import read_bloom

    corpus, index, bloom = tmp_path / "c", tmp_path / "i", tmp_path / "b"
    b0 = spark.createDataFrame([(1, "doc one"), (2, "doc two")], DOC_SCHEMA)
    # batch 0 lands WITHOUT a sidecar
    ingest_batch(b0, 0, str(corpus), str(index))
    # batch 1 turns the sidecar on; doc 3 duplicates batch 0's text
    b1 = spark.createDataFrame([(3, "doc one"), (4, "doc four")], DOC_SCHEMA)
    ingest_batch(b1, 1, str(corpus), str(index), str(bloom))
    assert _corpus_ids(spark, corpus) == [1, 2, 4]
    fps = [r["fingerprint"] for r in read_index(spark, str(index)).collect()]
    assert len(fps) == len(set(fps)) == 3
    # the backfilled delta landed under batch 0's own partition, so the
    # merged filter now covers the whole index
    deltas = {p.name for p in bloom.iterdir() if p.name.startswith("batch=")}
    assert deltas == {"batch=0", "batch=1"}
    assert read_bloom(spark, str(bloom)).count() > 0


# ---------------------------------------------------------------------------
# near-dup ingest (LSH index): the streaming face of incremental_neardup
# ---------------------------------------------------------------------------

from scholar_stream_spark.streaming.dedup_ingest import (  # noqa: E402
    neardup_ingest_batch,
    start_neardup_ingest,
)


def _text(prefix: str, n: int = 30) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _near(prefix: str, n: int = 30) -> str:
    """Same as _text but the last word differs: 5-shingle Jaccard
    ~25/27 = 0.93 — above the 0.8 threshold, NOT byte-identical."""
    return " ".join(
        [f"{prefix}{i}" for i in range(n - 1)] + ["CHANGED"]
    )


def test_neardup_ingest_two_batches(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    ckpt, inbox = tmp_path / "ckpt", tmp_path / "in"

    _write_docs(
        inbox,
        [(1, _text("alpha")), (2, _text("beta")),
         (3, _near("alpha"))],  # in-batch NEAR-dup of 1 (not exact)
    )
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(inbox))
    q = start_neardup_ingest(
        stream, str(corpus), str(index), str(ckpt),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    assert _corpus_ids(spark, corpus) == [1, 2]

    _write_docs(
        inbox,
        [(4, _near("beta")),      # cross-batch near-dup via the index
         (5, _text("gamma"))],
    )
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(inbox))
    q = start_neardup_ingest(
        stream, str(corpus), str(index), str(ckpt),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    assert _corpus_ids(spark, corpus) == [1, 2, 5]


def test_neardup_ingest_replay_is_noop(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    b0 = spark.createDataFrame(
        [(1, _text("one")), (2, _text("two"))], DOC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(3, _near("one")), (4, _text("four"))], DOC_SCHEMA
    )
    neardup_ingest_batch(b0, 0, str(corpus), str(index))
    neardup_ingest_batch(b1, 1, str(corpus), str(index))
    before = _corpus_ids(spark, corpus)
    assert before == [1, 2, 4]

    # redelivery of batch 1: self-excluding index read + overwrite
    # directories leave corpus and index byte-stable
    neardup_ingest_batch(b1, 1, str(corpus), str(index))
    assert _corpus_ids(spark, corpus) == before
    from scholar_stream_spark.streaming.dedup_ingest import read_neardup_index

    hashes, bands = read_neardup_index(spark, str(index))
    assert sorted(r["doc_id"] for r in hashes.collect()) == [1, 2, 4]
    assert {r["doc_id"] for r in bands.collect()} == {1, 2, 4}


def test_neardup_ingest_in_batch_docid_redelivery(spark, tmp_path):
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    b0 = spark.createDataFrame(
        [(7, _text("seven")), (7, _text("seven")), (8, _text("eight"))],
        DOC_SCHEMA,
    )
    neardup_ingest_batch(b0, 0, str(corpus), str(index))
    assert _corpus_ids(spark, corpus) == [7, 8]


def _chain_docs():
    """A~B, B~C, A!~C at 5-shingles: 100 tokens (96 shingles), B is the
    base, A flips the adjacent pair at positions 20-21, C the pair at
    70-71. One interior pair-flip kills the 6 windows touching it
    (J = 90/102 ≈ 0.88 ≥ 0.8); A vs C carries both flips, killing 12
    (J = 84/108 ≈ 0.78 < 0.8)."""
    base = [f"tok{i}" for i in range(100)]
    a = list(base)
    a[20], a[21] = "A20", "A21"
    c = list(base)
    c[70], c[71] = "C70", "C71"
    return " ".join(a), " ".join(base), " ".join(c)


def test_neardup_ingest_in_batch_greedy_is_sequential(spark, tmp_path):
    """Chain A~B, B~C (A!~C) in ONE batch must keep A AND C — exactly
    what sequential arrival would do (B rejects against kept A; C's only
    near-dup B was itself rejected, so C survives). The old transitive
    policy ('reject every doc with any lower-id partner') kept only A."""
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    a, b, c = _chain_docs()
    neardup_ingest_batch(
        spark.createDataFrame([(1, a), (2, b), (3, c)], DOC_SCHEMA),
        0, str(corpus), str(index),
    )
    assert _corpus_ids(spark, corpus) == [1, 3]


def test_neardup_ingest_corpus_reject_does_not_block_batch_peer(
    spark, tmp_path
):
    """A batch doc rejected against the CORPUS was never kept, so it
    must not reject its in-batch near-dups either. Corpus = {B}; batch
    = {A, C2} where A near-dups B (one interior pair-flip) and C2
    near-dups only A (C2 = A plus a SECOND pair-flip → two flips vs B,
    below threshold). Sequential semantics: A drops on the corpus hit,
    C2 survives because its only partner was already gone."""
    corpus, index = tmp_path / "corpus", tmp_path / "index"
    a, b, _ = _chain_docs()
    c2_toks = a.split(" ")
    c2_toks[70], c2_toks[71] = "X70", "X71"
    c2 = " ".join(c2_toks)
    neardup_ingest_batch(
        spark.createDataFrame([(1, b)], DOC_SCHEMA),
        0, str(corpus), str(index),
    )
    neardup_ingest_batch(
        spark.createDataFrame([(10, a), (11, c2)], DOC_SCHEMA),
        1, str(corpus), str(index),
    )
    assert _corpus_ids(spark, corpus) == [1, 11]


def test_compact_neardup_index_is_probe_identical(spark, tmp_path):
    """Compacting a streaming-built (batch=N-partitioned) index must
    leave probe results byte-identical, cut the file count, and keep
    the params sidecar enforcing the hash space."""
    import pytest as _pytest

    from scholar_stream_spark.operators.dedup import (
        compact_neardup_index,
        incremental_neardup_indexed,
    )

    corpus, index = tmp_path / "corpus", tmp_path / "index"
    for bid, rows in enumerate(
        [[(1, _text("one")), (2, _text("two"))],
         [(3, _text("three"))],
         [(4, _text("four"))]]
    ):
        neardup_ingest_batch(
            spark.createDataFrame(rows, DOC_SCHEMA),
            bid, str(corpus), str(index),
        )
    probe = spark.createDataFrame(
        [(10, _near("two")), (11, _near("four")), (12, _text("twelve"))],
        DOC_SCHEMA,
    )
    before = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_neardup_indexed(probe, str(index)).collect()
    )
    assert {(n, c) for n, c, _ in before} == {(10, 2), (11, 4)}

    compacted = tmp_path / "index_compact"
    compact_neardup_index(spark, str(index), str(compacted), n_files=1)
    after = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_neardup_indexed(probe, str(compacted)).collect()
    )
    assert after == before

    def n_parts(p):
        return sum(1 for f in p.rglob("part-*.parquet"))

    assert n_parts(compacted / "bands") < n_parts(index / "bands")
    assert n_parts(compacted / "bands") == 1
    # params sidecar survived: wrong-hash-space probes still fail loudly
    with _pytest.raises(ValueError, match="was built with"):
        incremental_neardup_indexed(
            probe, str(compacted), hash_profile="fast"
        )


def test_neardup_ingest_probe_never_shuffles_index(spark, tmp_path, monkeypatch):
    """Scale pin for the STREAMING ingest path, mirroring the batch
    twin's no-SMJ assertion: the per-batch corpus probe must read the
    persisted index tables and broadcast the (small) batch side against
    them — a refactor that sort-merge-shuffles the index would pass the
    correctness tests and fall over at 100 TB. Captured from the real
    foreachBatch body with a landed index present."""
    import scholar_stream_spark.operators.dedup as ddp

    corpus, index = tmp_path / "corpus", tmp_path / "index"
    neardup_ingest_batch(
        spark.createDataFrame(
            [(1, _text("one")), (2, _text("two"))], DOC_SCHEMA
        ),
        0, str(corpus), str(index),
    )
    plans: list[str] = []
    orig_probe = ddp._neardup_probe

    def capturing(*args, **kwargs):
        df = orig_probe(*args, **kwargs)
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        return df

    monkeypatch.setattr(ddp, "_neardup_probe", capturing)
    neardup_ingest_batch(
        spark.createDataFrame([(3, _text("three"))], DOC_SCHEMA),
        1, str(corpus), str(index),
    )
    assert len(plans) == 1, "probe ran an unexpected number of times"
    assert "SortMergeJoin" not in plans[0], plans[0]
    assert plans[0].count("BroadcastHashJoin") >= 1, plans[0]


def test_streaming_index_probeable_by_batch_api(spark, tmp_path):
    """The index the streaming ingest builds (batch=N partitioned) is
    the same layout incremental_neardup_indexed probes — a later batch
    job can near-dup-check candidate docs against a streamed corpus."""
    from scholar_stream_spark.operators.dedup import (
        incremental_neardup_indexed,
    )

    corpus, index = tmp_path / "corpus", tmp_path / "index"
    neardup_ingest_batch(
        spark.createDataFrame(
            [(1, _text("one")), (2, _text("two"))], DOC_SCHEMA
        ),
        0, str(corpus), str(index),
    )
    neardup_ingest_batch(
        spark.createDataFrame([(3, _text("three"))], DOC_SCHEMA),
        1, str(corpus), str(index),
    )
    probe = spark.createDataFrame(
        [(10, _near("two")), (11, _text("eleven"))], DOC_SCHEMA
    )
    hits = incremental_neardup_indexed(probe, str(index)).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in hits} == {(10, 2)}
    assert all(r["jaccard"] >= 0.8 for r in hits)


def test_delete_from_neardup_index_forgets_documents(spark, tmp_path):
    """After deleting a doc from the index, a new batch that near-dups
    ONLY that doc stops being suppressed (the content is forgotten),
    other matches keep working, and the params sidecar survives so
    parameter checks still hold."""
    from scholar_stream_spark.operators import dedup

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "nd_idx")
    dedup.write_neardup_index(corpus, path)
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    before = {
        (r["new_id"], r["corpus_id"])
        for r in dedup.incremental_neardup_indexed(batch, path).collect()
    }
    assert before == {(10, 1), (11, 2)}

    out = str(tmp_path / "nd_idx_v2")
    dedup.delete_from_neardup_index(spark, path, out, [1])
    after = {
        (r["new_id"], r["corpus_id"])
        for r in dedup.incremental_neardup_indexed(batch, out).collect()
    }
    assert after == {(11, 2)}  # doc 1 forgotten; doc 2's match still fires
    assert (
        spark.read.parquet(f"{out}/params").collect()
        == spark.read.parquet(f"{path}/params").collect()
    )


def test_delete_from_ivf_index_removes_neighbors(spark, tmp_path):
    """Deleted vec_ids must stop being servable: an exhaustive probe
    over the rewritten index equals brute-force exact top-k over the
    corpus WITHOUT the deleted vectors, and the quantizer is copied
    frozen."""
    from pyspark.sql import functions as F

    from scholar_stream_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, path)
    gone = [30, 31, 32, 33, 34]
    out = str(tmp_path / "ivf_v2")
    similarity.delete_from_ivf_index(spark, path, out, gone)

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
        for r in similarity.cosine_topk(
            emb.filter(~F.col("vec_id").isin(gone))
        ).collect()
    )
    assert probed == exact
    assert sorted(
        map(tuple, spark.read.parquet(f"{out}/quantizer").collect())
    ) == sorted(map(tuple, spark.read.parquet(f"{path}/quantizer").collect()))
