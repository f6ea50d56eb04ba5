"""Streaming document curation ingest (streaming/curation_ingest.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scholar_stream_spark.streaming.curation_ingest import (
    gate_documents,
    start_document_ingest,
)

DOCS = [
    # passes both gates: long, stopworded, clean
    (1, ("solid varied sentence with many useful words here " * 6)
        + "the words go to good use and more of that", "en"),
    # blocklisted word -> rejected (blocked=True)
    (2, ("fine long text with the usual stopwords of that kind " * 6)
        + "plus a Gambling offer", "en"),
    # too short -> rejected (passes=False)
    (3, "too short to pass the gate", "de"),
    # passes gates AND carries PII the scrub must redact
    (4, ("another solid varied sentence with many useful words " * 6)
        + "the words go to good use and more of that"
        + " contact someone@example.com now", "de"),
]


def _write_docs(spark, path):
    spark.createDataFrame(DOCS, "doc_id long, text string, lang string") \
        .write.mode("overwrite").parquet(path)


def test_gate_documents_split_and_scrub(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    kept, rejected = gate_documents(docs)
    kept_rows = {r["doc_id"]: r for r in kept.collect()}
    rej_rows = {r["doc_id"]: r for r in rejected.collect()}
    assert set(kept_rows) == {1, 4}
    assert set(rej_rows) == {2, 3}
    assert rej_rows[2]["blocked"] and rej_rows[2]["passes"]
    assert not rej_rows[3]["blocked"] and not rej_rows[3]["passes"]
    assert "<EMAIL>" in kept_rows[4]["text"]
    assert "someone@example.com" not in kept_rows[4]["text"]


def test_gate_documents_admission_failures_are_accountable(spark):
    """NULL ids and within-batch duplicate ids never vanish: the
    deterministic keep-first survivor is gated, the extras land in
    rejected with NULL verdicts, and no doc is double-kept."""
    good = DOCS[0][1]
    docs = spark.createDataFrame(
        [
            (1, good, "en"),
            (1, "zzz duplicate copy of id one", "en"),  # dup: text sorts later
            (None, good, "en"),                         # NULL id
        ],
        "doc_id long, text string, lang string",
    )
    kept, rejected = gate_documents(docs)
    kept_rows = kept.collect()
    assert [r["doc_id"] for r in kept_rows] == [1]
    assert kept_rows[0]["text"].startswith("solid varied")  # keep-first
    rej = rejected.collect()
    assert len(rej) == 2
    assert all(r["blocked"] is None and r["passes"] is None for r in rej)
    assert sorted(r["doc_id"] for r in rej if r["doc_id"] is not None) == [1]
    assert any(r["doc_id"] is None for r in rej)


def test_streaming_ingest_matches_batch_gate_and_replays_noop(
    spark, tmp_path
):
    """The streamed corpus equals the batch gate's output byte-for-row,
    rejects carry their verdicts, the corpus lands lang-partitioned,
    and re-running the drained stream appends nothing (checkpoint)."""
    src = str(tmp_path / "drop")
    corpus = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src)

    def run():
        q = start_document_ingest(
            spark, src, corpus, ckpt, rejected_path=rejected
        )
        q.awaitTermination(90)

    run()
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    kept, _ = gate_documents(docs)

    def read_corpus():
        return spark.read.option("basePath", corpus).parquet(corpus)

    streamed = sorted(map(tuple, read_corpus()
                          .select("doc_id", "lang", "text").collect()))
    batch = sorted(map(tuple, kept.collect()))
    assert streamed == batch
    rej = spark.read.option("basePath", rejected).parquet(rejected)
    assert {r["doc_id"] for r in rej.collect()} == {2, 3}
    # batch=<id>/lang=<l> overwrite layout on disk
    batch_dirs = [d for d in os.listdir(corpus) if d.startswith("batch=")]
    assert batch_dirs
    assert any(
        os.path.isdir(os.path.join(corpus, b, "lang=en")) for b in batch_dirs
    )
    # replay: the drained checkpoint re-lands nothing -> no growth
    n_before = read_corpus().count()
    run()
    assert read_corpus().count() == n_before
