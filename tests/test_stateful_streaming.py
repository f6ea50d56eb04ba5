"""Custom stateful streaming: emit-on-change + native session windows.

Parity strategy: the streaming operators are pinned against their
oracle-checked batch analogs (``temporal.change_filter`` /
``temporal.sessionize``) on the same input — the strongest check
available for operators the SQL oracle can't express.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import temporal
from scholar_stream_spark.sources.tables import load_events
from scholar_stream_spark.streaming import stateful
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """sf0.001 events (ts normalized to µs) as a streamable parquet dir."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    df = load_events(spark, SF_SMALL)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return out


def _events_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def test_change_filter_batch_semantics(spark):
    rows = [
        (1, 100, "2024-06-01 10:00:00", "click"),
        (2, 100, "2024-06-01 10:01:00", "click"),      # repeat → dropped
        (3, 100, "2024-06-01 10:02:00", "purchase"),   # change → kept
        (4, 100, "2024-06-01 10:03:00", "purchase"),   # repeat → dropped
        (5, 200, "2024-06-01 10:00:30", "view"),       # first → kept
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["event_id"], r["prev_type"])
        for r in temporal.change_filter(events).collect()
    }
    assert got == {(1, None), (3, "click"), (5, None)}


def test_stateful_change_filter_matches_batch(spark, events_dir, tmp_path):
    batch_rows = sorted(
        (r["event_id"], r["user_id"], r["event_type"], r["prev_type"])
        for r in temporal.change_filter(spark.read.parquet(events_dir)).collect()
    )
    q = (
        stateful.stateful_change_filter(_events_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("chg")
        .option("checkpointLocation", str(tmp_path / "ckpt_chg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        (r["event_id"], r["user_id"], r["event_type"], r["prev_type"])
        for r in spark.sql("SELECT * FROM chg").collect()
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


class _FakeState:
    """Minimal GroupState stand-in for driving the handler directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists = True
        self._v = tuple(v)


def test_change_filter_state_carries_across_batches():
    state = _FakeState()
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [7, 7],
            "ts": pd.to_datetime(["2024-06-01 10:00:00", "2024-06-01 10:01:00"]),
            "event_type": ["click", "purchase"],
        }
    )
    out1 = pd.concat(list(stateful._change_filter_fn((7,), iter([b1]), state)))
    assert list(out1["event_id"]) == [1, 2]
    assert state.get == ("purchase",)

    # batch 2 starts with the type batch 1 ended on → suppressed
    b2 = pd.DataFrame(
        {
            "event_id": [3, 4],
            "user_id": [7, 7],
            "ts": pd.to_datetime(["2024-06-01 10:02:00", "2024-06-01 10:03:00"]),
            "event_type": ["purchase", "click"],
        }
    )
    out2 = pd.concat(list(stateful._change_filter_fn((7,), iter([b2]), state)))
    assert list(out2["event_id"]) == [4]
    assert list(out2["prev_type"]) == ["purchase"]
    assert state.get == ("click",)


def test_streaming_session_agg_matches_batch(spark, events_dir, tmp_path):
    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in temporal.sessionize(spark.read.parquet(events_dir)).collect()
    }
    q = (
        stateful.streaming_session_agg(_events_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM sess").collect()
    # append mode only emits sessions the final watermark closed —
    # every emitted session must exactly match a batch session, and the
    # bulk of the corpus must have closed
    assert len(emitted) > 0
    for r in emitted:
        assert (r["user_id"], r["session_start"], r["n_events"]) in batch
        assert r["last_event_ts"] >= r["session_start"]
    assert len(emitted) >= len(batch) // 2
