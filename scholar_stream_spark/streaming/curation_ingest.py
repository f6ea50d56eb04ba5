"""Streaming document curation ingest (SURVEY.md §2.8): the online
corpus-construction front door — watch a drop directory of document
parquet, gate each micro-batch through the batch curation operators
(C4 blocklist, Gopher quality rules, PII scrub), land survivors into
the corpus table and rejects into an audit table with their verdict
columns.

The POINT of this module is that it contains no curation logic at all:
the gates are the very same functions the batch pipeline runs
(``textops.blocklist_filter`` / ``gopher_quality`` / ``scrub_pii`` are
stateless projections, batch/stream parity pinned in
``test_streaming``), composed inside ``foreachBatch`` so the verdict
joins are plain micro-batch-sized equi-joins — no stream-stream join
machinery, no watermark coupling, and the checkpoint makes the whole
batch commit effectively-once.

Scale notes: every per-batch join is doc_id-keyed over ONE micro-batch
(AQE sizes it — usually broadcast); the corpus write partitions by
``lang`` so downstream mixture/pipeline scans prune; rejects keep
their verdict columns so gate firing rates are one GROUP BY away (the
data-card question "what did this gate remove?" holds on the stream
too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from scholar_stream_spark.operators.textops import (
    blocklist_filter,
    gopher_quality,
    scrub_pii,
)
from scholar_stream_spark.streaming.pipeline import TRIGGER_PRESETS

DOC_STREAM_SCHEMA = "doc_id long, text string, lang string"


def gate_documents(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One micro-batch (or batch) of documents → (kept, rejected).

    kept: (doc_id, lang, text) with PII scrubbed — corpus-ready rows.
    rejected: (doc_id, lang, blocked, passes) — the verdict columns of
    whichever gate(s) fired, for audit/rate queries.

    Shared by the streaming sink and any batch backfill so the two
    paths cannot diverge.
    """
    flags = (
        docs.join(
            blocklist_filter(docs).select("doc_id", "blocked"), "doc_id"
        ).join(
            gopher_quality(docs).select("doc_id", "passes"), "doc_id"
        )
    )
    keep = ~F.col("blocked") & F.col("passes")
    kept = (
        flags.filter(keep)
        .join(
            scrub_pii(docs).select(
                "doc_id", F.col("scrubbed").alias("clean_text")
            ),
            "doc_id",
        )
        .select("doc_id", "lang", F.col("clean_text").alias("text"))
    )
    rejected = flags.filter(~keep).select(
        "doc_id", "lang", "blocked", "passes"
    )
    return kept, rejected


def start_document_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_path: str,
    checkpoint_path: str,
    rejected_path: str | None = None,
    schema: str = DOC_STREAM_SCHEMA,
    trigger: str = "available_now",
    output_files_per_batch: int = 4,
) -> StreamingQuery:
    """Watch ``input_dir`` for document parquet and curate continuously.

    Returns the running StreamingQuery. Replay safety: the checkpoint
    skips already-committed source files, so restarting after a crash
    re-lands at most the in-flight batch (at-least-once file append,
    the same guarantee class as ``start_ingest``).
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            kept, rejected = gate_documents(batch_df)
            (
                kept.coalesce(output_files_per_batch)
                .write.mode("append")
                .partitionBy("lang")
                .parquet(corpus_path)
            )
            if rejected_path is not None:
                (
                    rejected.coalesce(output_files_per_batch)
                    .write.mode("append")
                    .parquet(rejected_path)
                )
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**TRIGGER_PRESETS[trigger])
    )
    return writer.start()
