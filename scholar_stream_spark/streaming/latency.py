"""Streaming latency metrics — the native version of VW_LATENCY (§2.6).

The reference emulates a sliding window by re-evaluating a wall-clock-
relative filter at query time (``sql/04_views_curated.sql:54-60``); the
batch builder ``operators/views.build_vw_latency`` reproduces that
exactly. This module is the *streaming-native* design the reference
couldn't express: event-time sliding windows + a watermark for late
data, maintained incrementally by the state store.

Divergence from the reference (documented, SURVEY §7.3): the reference
counts whatever LANDED in the last 5 minutes regardless of event time;
a watermarked window groups by landed-time windows and tolerates
``watermark_delay`` of lateness before finalizing — strictly better
late-data semantics, same KPI columns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholar_stream_spark.operators.temporal import event_order_audit
from scholar_stream_spark.operators.views import build_vw_works

#: Safety margin on the measured max lateness when auto-sizing a
#: watermark: the measurement is a sample of the past; tomorrow's tail
#: is a bit worse. 25% is the "one more straggler hop" allowance.
AUTO_WATERMARK_MARGIN = 0.25


def auto_watermark_delay(
    history_events: DataFrame,
    margin_frac: float = AUTO_WATERMARK_MARGIN,
    min_delay_seconds: int = 1,
) -> str:
    """Size a watermark delay from MEASURED disorder instead of a
    guess — the integration `event_order_audit` exists for (its
    docstring: "``max(max_lateness_us)`` IS the watermark bound that
    would have admitted every event"): run the audit over a batch of
    history, take the worst per-user lateness, add ``margin_frac``,
    round up to whole seconds.

    Too-small delays silently DROP late rows from streaming
    aggregations; too-large delays hold state and delay emission — so
    the right number is a measured number. Returns a Spark interval
    string (``"75 seconds"``) ready for ``withWatermark`` /
    ``streaming_latency_kpis``; an in-order history collapses to
    ``min_delay_seconds``. Driver cost: the audit's one user-keyed
    shuffle + a 1-row max.
    """
    row = (
        event_order_audit(history_events)
        .agg(F.max("max_lateness_us").alias("mx"))
        .first()
    )
    mx_us = int(row["mx"] or 0)
    secs = max(
        min_delay_seconds,
        math.ceil(mx_us * (1.0 + margin_frac) / 1_000_000),
    )
    return f"{secs} seconds"


def streaming_vw_works(raw_stream: DataFrame) -> DataFrame:
    """The curated projection applied to a streaming bronze source —
    identical logical plan as the batch view (same builder), proving the
    engine's batch/streaming unification. Carries ``load_id`` (the wire
    ``_LOAD_ID``) so the dedup stage can key on the record identity."""
    return build_vw_works(raw_stream, include_load_id=True)


def streaming_latency_kpis(
    vw_works_stream: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Sliding-window latency KPIs with late-data tolerance.

    Output one row per (window) in update/append mode: avg/min/max
    latency + sample count, window bounds as columns — the same shape as
    the batch ``vw_latency`` so dashboards can poll either.
    """
    windowed = (
        vw_works_stream.filter(F.col("event_ts").isNotNull())
        .withWatermark("landed_ts", watermark_delay)
        .groupBy(F.window(F.col("landed_ts"), window, slide).alias("w"))
    )
    return windowed.agg(
        F.avg("latency_seconds").alias("avg_sec_5m"),
        F.min("latency_seconds").alias("min_sec_5m"),
        F.max("latency_seconds").alias("max_sec_5m"),
        F.count(F.lit(1)).alias("samples_5m"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "avg_sec_5m",
        "min_sec_5m",
        "max_sec_5m",
        "samples_5m",
    )


def streaming_latency_kpis_auto(
    vw_works_stream: DataFrame,
    history_events: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    margin_frac: float = AUTO_WATERMARK_MARGIN,
) -> DataFrame:
    """``streaming_latency_kpis`` with its watermark sized from a
    measured disorder audit over batch history — the two halves
    (`event_order_audit` → ``withWatermark``) actually wired, not
    documentation-only neighbors. Admission of every event within the
    measured bound is pinned in ``tests/test_r12_ops.py``."""
    return streaming_latency_kpis(
        vw_works_stream,
        window=window,
        slide=slide,
        watermark_delay=auto_watermark_delay(
            history_events, margin_frac=margin_frac
        ),
    )


def streaming_dedup(
    vw_works_stream: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup on the record load id (§2.6 'Dedup' row).

    The reference carries ``_LOAD_ID`` (a per-record uuid) precisely so
    redelivered records can be dropped without losing legitimate
    re-publications of the same work. Key = ``load_id`` when the stream
    carries it (``streaming_vw_works`` does), falling back to
    ``work_id`` for payloads without one — a fallback that collapses
    re-publications, documented trade-off for id-less wires.
    ``dropDuplicatesWithinWatermark`` bounds the state store.
    """
    if "load_id" in vw_works_stream.columns:
        keyed = vw_works_stream.withColumn(
            "_dedup_key", F.coalesce(F.col("load_id"), F.col("work_id"))
        )
        return (
            keyed.withWatermark("landed_ts", watermark_delay)
            .dropDuplicatesWithinWatermark(["_dedup_key"])
            .drop("_dedup_key")
        )
    return (
        vw_works_stream.withWatermark("landed_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["work_id"])
    )
