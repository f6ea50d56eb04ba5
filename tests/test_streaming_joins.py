"""Stream-static enrichment + stream-stream interval join, pinned
against the oracle-checked batch analog (`range_join_events`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import temporal
from scholar_stream_spark.sources.tables import load_events
from scholar_stream_spark.streaming import enrich
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_join") / "events")
    df = load_events(spark, SF_SMALL)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return out


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def test_streaming_enrich_attaches_dim(spark, events_dir, tmp_path):
    dim = spark.createDataFrame(
        [(uid, f"segment_{uid % 3}") for uid in range(200)],
        "user_id long, segment string",
    )
    q = (
        enrich.streaming_enrich(_stream(spark, events_dir), dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt_enr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT count(*) AS n, count(segment) AS n_seg FROM enriched"
    ).first()
    n_events = spark.read.parquet(events_dir).count()
    n_covered = (
        spark.read.parquet(events_dir).filter(F.col("user_id") < 200).count()
    )
    assert out["n"] == n_events  # left join preserves every event
    assert out["n_seg"] == n_covered  # dim hit exactly where key matches


def test_streaming_interval_join_matches_batch(spark, events_dir, tmp_path):
    batch = {
        (r["event_id"], r["matched_event_id"], r["gap_seconds"])
        for r in temporal.range_join_events(
            spark.read.parquet(events_dir)
        ).collect()
    }
    q = (
        enrich.streaming_interval_join(_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("ivj")
        .option("checkpointLocation", str(tmp_path / "ckpt_ivj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {
        (r["event_id"], r["matched_event_id"], r["gap_seconds"])
        for r in spark.sql("SELECT * FROM ivj").collect()
    }
    assert stream == batch
    assert len(stream) > 0
