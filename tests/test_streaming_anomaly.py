"""Streaming rate-anomaly monitor: incremental hourly counts +
shared z-screen. Pins streamed == batch verdicts (same operator, same
corpus), replay idempotence, and cross-batch hour accumulation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from scholar_stream_spark.operators import relational
from scholar_stream_spark.streaming.anomaly_monitor import (
    monitor_batch,
    read_hourly_counts,
    start_anomaly_monitor,
)
from tests.conftest import SF_SMALL


def _alerts(spark, path):
    return sorted(
        (r["event_type"], r["hour"], r["n_events"], r["z_score"])
        for r in spark.read.parquet(str(path)).collect()
    )


def test_streamed_alerts_match_batch_operator(spark, tmp_path):
    """Two micro-batches over a split of the events table must land
    the IDENTICAL alert set the batch operator computes on the full
    table — the shared-screen guarantee."""
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    counts, alerts = tmp_path / "counts", tmp_path / "alerts"
    monitor_batch(b0, 0, str(counts), str(alerts))
    monitor_batch(b1, 1, str(counts), str(alerts))
    want = sorted(
        (r["event_type"], r["hour"], r["n_events"], r["z_score"])
        for r in relational.event_rate_anomalies(events).collect()
    )
    assert _alerts(spark, alerts) == want and len(want) > 0
    # accumulated hourly counts must equal the direct aggregation
    got_hours = {
        (r["event_type"], r["hour"]): r["n_events"]
        for r in read_hourly_counts(spark, str(counts)).collect()
    }
    want_hours = {
        (r["event_type"], r["hour"]): r["count"]
        for r in events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        ).count().collect()
    }
    assert got_hours == want_hours


def test_monitor_replay_is_noop(spark, tmp_path):
    """Redelivering a landed batch must leave counts and alerts
    byte-identically unchanged (batch_id-keyed overwrite + alerts as a
    pure function of the counts state)."""
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    counts, alerts = tmp_path / "counts", tmp_path / "alerts"
    monitor_batch(b0, 0, str(counts), str(alerts))
    monitor_batch(b1, 1, str(counts), str(alerts))
    before = _alerts(spark, alerts)
    monitor_batch(b1, 1, str(counts), str(alerts))
    assert _alerts(spark, alerts) == before


def test_monitor_file_stream_end_to_end(spark, tmp_path):
    """Drive start_anomaly_monitor with a real file-source stream in
    one availableNow pass; alerts must match the batch operator over
    the streamed rows."""
    inbox = tmp_path / "in"
    inbox.mkdir()
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "event_type", F.date_format(
            "ts", "yyyy-MM-dd HH:mm:ss"
        ).alias("ts")
    )
    rows = events.limit(2000).collect()
    (inbox / "b0.ndjson").write_text(
        "\n".join(
            json.dumps(
                {"event_id": r["event_id"], "event_type": r["event_type"],
                 "ts": r["ts"]}
            )
            for r in rows
        )
        + "\n"
    )
    stream = spark.readStream.schema(
        "event_id long, event_type string, ts timestamp"
    ).json(str(inbox))
    q = start_anomaly_monitor(
        stream,
        counts_path=str(tmp_path / "c"),
        alerts_path=str(tmp_path / "a"),
        checkpoint_path=str(tmp_path / "ck"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    streamed = _alerts(spark, tmp_path / "a")
    batch_events = spark.createDataFrame(rows, events.schema)
    want = sorted(
        (r["event_type"], r["hour"], r["n_events"], r["z_score"])
        for r in relational.event_rate_anomalies(batch_events).collect()
    )
    assert streamed == want
