"""Streaming joins (SURVEY §2.6 Spark-native surface): stream-static
dimension enrichment and the watermarked stream-stream interval join.

- **Stream-static**: per-micro-batch hash join against a (small) static
  dimension — the standard enrichment path. The static side is re-read
  per batch (picks up dimension updates) and broadcast when under the
  threshold; no state store involved.
- **Stream-stream interval join**: both sides watermarked, join
  condition = equi-key AND a bounded time range. The range bound plus
  the watermarks is what lets Spark EVICT state: a buffered right row
  can be dropped once the watermark passes ``ts + max_gap``. Without
  the bound the state grows forever — which is why the API *requires*
  the time condition for append-mode stream-stream joins.

Batch parity: ``operators/temporal.range_join_events`` is the
oracle-checked batch analog of the interval join (same semantics,
bucketized instead of stateful); the pytest parity test pins the two to
identical output on a replayed static input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholar_stream_spark.operators.temporal import (
    ASOF_LEFT_TYPE,
    ASOF_RIGHT_TYPE,
    RANGE_JOIN_MAX_GAP_SECONDS,
)


def streaming_enrich(
    events_stream: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static left join: enrich each event with dimension
    attributes. The static side is broadcast (dimension tables are
    small by contract); each micro-batch sees the dimension's CURRENT
    content — the Spark-native analog of a Snowflake view joining a
    dimension at query time."""
    return events_stream.join(F.broadcast(dim), key, "left")


def streaming_interval_join(
    events_stream: DataFrame,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
    max_gap_seconds: int = RANGE_JOIN_MAX_GAP_SECONDS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Watermarked stream-stream interval join: every (purchase, click)
    pair per user where the click happened within ``max_gap_seconds``
    BEFORE the purchase — identical semantics to the batch
    ``range_join_events``.

    State bound: the right buffer holds at most ``max_gap_seconds`` +
    watermark delay of events per key; the time-range condition is what
    makes that eviction provable to the engine.
    """
    left = (
        events_stream.filter(F.col("event_type") == left_type)
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark_delay)
    )
    right = (
        events_stream.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("matched_event_id"),
            F.col("ts").alias("matched_ts"),
        )
        .withWatermark("matched_ts", watermark_delay)
    )
    # the range condition is widened 1s so state eviction stays provable
    # while the EXACT batch predicate (floor-second gap ≤ max_gap, the
    # oracle-checked semantics of range_join_events) runs as a filter.
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("matched_ts") <= F.col("ts"))
        & (
            F.col("matched_ts")
            >= F.col("ts")
            - F.expr(f"INTERVAL {max_gap_seconds + 1} SECONDS")
        ),
    )
    gap = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(
        F.col("matched_ts")
    )
    joined = joined.filter(gap <= max_gap_seconds)
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "matched_event_id",
        "matched_ts",
        gap.alias("gap_seconds"),
    )
