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

from scholar_stream_spark.functions.hashing import hex48_spark_sql
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


#: T5 span-corruption defaults (Raffel et al., JMLR 2020 §3.1.4 —
#: "Exploring the Limits of Transfer Learning"): 15% of tokens masked
#: in spans of mean length 3. The deterministic variant fixes the span
#: length at the mean — noise placement, not noise-length sampling, is
#: what the plan table exists to pin down.
SPAN_NOISE_PCT = 15
SPAN_LEN = 3


def span_corruption_plan(
    documents: DataFrame,
    noise_pct: int = SPAN_NOISE_PCT,
    span_len: int = SPAN_LEN,
) -> DataFrame:
    """Deterministic T5-style span-corruption masking plan — WHERE the
    denoising spans go, decided once and reproducibly, so every epoch /
    restart / engine masks the same tokens (the plan-table discipline:
    randomness in data prep must be a deterministic function of the
    record, or runs aren't comparable).

    Placement rule (all integer arithmetic): ``n_spans = (n·15 div
    100) div 3``; the document splits into ``n_spans`` equal strides
    (``stride = n div n_spans``, ≥ 20 at the defaults) and span ``k``
    starts at ``k·stride + jitter_k`` with ``jitter_k =
    hex48(doc_id:k) mod (stride − span_len + 1)`` — the portable
    48-bit hash both engines compute bit-identically. One span per
    stride makes NON-OVERLAP structural (no rejection sampling, no
    cross-engine RNG to reconcile). Documents too short for one span
    (n < 20) emit no rows — stated semantics.

    Scale shape: one narrow text scan (the ``n_tokens`` length
    expression, no token array), a per-row ``sequence`` explode of
    n_spans ≈ n/20 plan rows, per-row hash arithmetic — no shuffle
    anywhere; output is ~5% of corpus token count.

    Output: (doc_id, mask_id 0.., start_token, span_len,
    n_doc_tokens).
    """
    from scholar_stream_spark.operators.textops import n_tokens  # noqa: PLC0415 — textops does not import chunking; local to avoid a cycle if it ever does

    staged = (
        scale_out(documents)
        .select("doc_id", n_tokens(F.col("text")).alias("n"))
        .withColumn(
            "n_spans",
            F.expr(f"(n * {int(noise_pct)} DIV 100) DIV {int(span_len)}"),
        )
        .filter(F.col("n_spans") > 0)
        .withColumn("stride", F.expr("n DIV n_spans"))
    )
    jitter = F.expr(
        "{h} % greatest(stride - {sl} + 1, 1)".format(
            h=hex48_spark_sql(
                "CONCAT(CAST(doc_id AS STRING), ':', CAST(k AS STRING))"
            ),
            sl=int(span_len),
        )
    )
    return (
        staged.select(
            "doc_id",
            "n",
            "stride",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_spans").cast("int") - F.lit(1)
                )
            ).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("long").alias("mask_id"),
            (F.col("k") * F.col("stride") + jitter)
            .cast("long")
            .alias("start_token"),
            F.lit(int(span_len)).cast("long").alias("span_len"),
            F.col("n").alias("n_doc_tokens"),
        )
    )
