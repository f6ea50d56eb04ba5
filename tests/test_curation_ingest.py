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
    streamed = sorted(map(tuple, spark.read.parquet(corpus)
                          .select("doc_id", "lang", "text").collect()))
    batch = sorted(map(tuple, kept.collect()))
    assert streamed == batch
    assert {r["doc_id"] for r in spark.read.parquet(rejected).collect()} == {2, 3}
    # lang partitioning on disk
    assert os.path.isdir(os.path.join(corpus, "lang=en"))
    assert os.path.isdir(os.path.join(corpus, "lang=de"))
    # replay: nothing new -> no growth
    n_before = spark.read.parquet(corpus).count()
    run()
    assert spark.read.parquet(corpus).count() == n_before
