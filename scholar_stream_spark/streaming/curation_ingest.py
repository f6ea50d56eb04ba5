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
machinery, no watermark coupling. Writes use the ``batch=<id>``
overwrite layout (``dedup_ingest``'s idempotent-``foreachBatch``
discipline), so a redelivered micro-batch overwrites its own
directories instead of appending duplicates — at-least-once delivery
becomes effectively-once table state.

Accountability invariant: EVERY input row lands on exactly one side.
NULL-id rows and within-batch duplicate ids (beyond the deterministic
keep-first survivor) go to the rejected table with NULL verdicts —
they failed admission, not a gate — so "what did this stage remove?"
stays answerable on the stream.

Scale notes: every per-batch join/window is doc_id-keyed over ONE
micro-batch (AQE sizes it — usually broadcast); the corpus write
partitions by ``lang`` inside each batch dir so downstream
mixture/pipeline scans prune; the PII scrub runs over the KEPT subset
only (on a spam-heavy stream most rows fail the gates — scrubbing
rejects would be pure waste).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
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
    rejected: (doc_id, lang, blocked, passes) — verdict columns for
    gate rejects; NULL verdicts mark admission failures (NULL id, or a
    duplicate id beyond the deterministic keep-first survivor — the
    gates key on doc_id, so duplicates must not reach them).

    Shared by the streaming sink and any batch backfill so the two
    paths cannot diverge.
    """
    null_verdict = [
        F.lit(None).cast("boolean").alias("blocked"),
        F.lit(None).cast("boolean").alias("passes"),
    ]
    invalid = docs.filter(F.col("doc_id").isNull()).select(
        "doc_id", "lang", *null_verdict
    )
    valid = docs.filter(F.col("doc_id").isNotNull())
    # deterministic keep-first for within-batch duplicate ids (same
    # tie-break as dedup_ingest's in-batch policy)
    w = Window.partitionBy("doc_id").orderBy(
        F.asc_nulls_last("text"), F.asc_nulls_last("lang")
    )
    ranked = valid.withColumn("_rn", F.row_number().over(w))
    dup_extra = ranked.filter(F.col("_rn") > 1).select(
        "doc_id", "lang", *null_verdict
    )
    uniq = ranked.filter(F.col("_rn") == 1).drop("_rn")

    flags = uniq.join(
        blocklist_filter(uniq).select("doc_id", "blocked"), "doc_id"
    ).join(gopher_quality(uniq).select("doc_id", "passes"), "doc_id")
    keep = ~F.col("blocked") & F.col("passes")
    kept_docs = uniq.join(
        flags.filter(keep).select("doc_id"), "doc_id"
    )
    kept = kept_docs.join(
        scrub_pii(kept_docs).select(
            "doc_id", F.col("scrubbed").alias("clean_text")
        ),
        "doc_id",
    ).select("doc_id", "lang", F.col("clean_text").alias("text"))
    rejected = (
        flags.filter(~keep)
        .select("doc_id", "lang", "blocked", "passes")
        .unionByName(dup_extra)
        .unionByName(invalid)
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

    Returns the running StreamingQuery. Replay safety: each micro-batch
    writes ``batch=<id>`` directories with overwrite, so restarting
    after a crash (or a redelivered batch) rewrites the same
    directories — never duplicate corpus rows. Read the corpus with
    ``spark.read.option("basePath", corpus_path).parquet(corpus_path)``
    and ``batch``/``lang`` surface as partition columns.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            kept, rejected = gate_documents(batch_df)
            (
                kept.coalesce(output_files_per_batch)
                .write.mode("overwrite")
                .partitionBy("lang")
                .parquet(os.path.join(corpus_path, f"batch={batch_id}"))
            )
            if rejected_path is not None:
                (
                    rejected.coalesce(output_files_per_batch)
                    .write.mode("overwrite")
                    .parquet(
                        os.path.join(rejected_path, f"batch={batch_id}")
                    )
                )
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**TRIGGER_PRESETS[trigger])
    )
    return writer.start()
