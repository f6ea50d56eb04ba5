"""Document chunking for training pipelines (SURVEY §2.8 extended
surface).

Splits each document into overlapping fixed-size token windows — the
step between curation and tokenization in an LLM data pipeline (context
windows want bounded-length inputs; overlap preserves cross-boundary
context).

Scale shape: ONE narrow projection + generate (posexplode of the chunk
starts) over the documents scan — no shuffle, no join, embarrassingly
parallel. Output bytes ≈ input × (chunk_size / stride), the unavoidable
overlap duplication (1.33× at the 128/32 defaults); everything else is
per-row arithmetic. At 100 TB this runs at scan speed and the output
should be written partitioned by the downstream shuffle key (e.g.
``pack_documents``'s bin key), never re-shuffled for its own sake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scholar_stream_spark.plans.partitioning import scale_out

#: Defaults shared with the DuckDB oracle text (do not fork).
CHUNK_SIZE = 128
CHUNK_OVERLAP = 32


def chunk_documents(
    documents: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Overlapping token-window chunks per document.

    Tokens are whitespace splits (the same tokenizer the quality /
    packing operators use). Chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``; starts run while ``start <
    n_tokens``, so the tail chunk may be short (its real length is in
    ``n_chunk_tokens``) and every token belongs to ≥1 chunk.

    Output: (doc_id, chunk_idx, start_token, n_chunk_tokens,
    chunk_text).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col("text")), r"\s+")
    staged = scale_out(documents).select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("nt")
    )
    exploded = staged.select(
        "doc_id",
        "nt",
        "toks",
        F.posexplode(
            F.sequence(F.lit(0), F.col("nt") - 1, F.lit(stride))
        ).alias("chunk_idx", "start_token"),
    )
    chunk = F.slice(F.col("toks"), F.col("start_token") + 1, chunk_size)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_token").cast("long").alias("start_token"),
        F.least(F.lit(chunk_size), F.col("nt") - F.col("start_token"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
