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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholar_stream_spark.operators.views import build_vw_works


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
