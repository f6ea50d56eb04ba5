"""Tests for the streaming ingest pipeline + streaming latency view.

SURVEY §2.6: the reference's operational streaming (producer batches →
Firehose buffer → RAW commit with metadata, dead-letter on failure) is
here a Structured Streaming job with ``foreachBatch`` landing, tested
deterministically with ``Trigger.AvailableNow`` (the frozen-clock
equivalent for streams).
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators.views import build_vw_works
from scholar_stream_spark.streaming.latency import (
    streaming_dedup,
    streaming_latency_kpis,
    streaming_vw_works,
)
from scholar_stream_spark.streaming.pipeline import start_ingest


def _write_ndjson(path: str, records: list) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(
                (r if isinstance(r, str) else json.dumps(r, separators=(",", ":")))
                + "\n"
            )


GOOD = [
    {
        "id": "W1",
        "title": "T1",
        "event_ts": "2024-06-01T11:58:00+00:00",
        "ingest_ts": "2024-06-01T11:58:10+00:00",
    },
    {
        "id": "W2",
        "title": "T2",
        "event_ts": "2024-06-01T11:59:00+00:00",
        "ingest_ts": "2024-06-01T11:59:05+00:00",
    },
]
BAD_LINE = "{not json at all"


def test_ingest_lands_good_and_dead_letters_bad(spark):
    with tempfile.TemporaryDirectory() as tmp:
        inbox = os.path.join(tmp, "inbox")
        os.makedirs(inbox)
        _write_ndjson(os.path.join(inbox, "b0.ndjson"), GOOD + [BAD_LINE])
        raw = os.path.join(tmp, "raw")
        errors = os.path.join(tmp, "errors")

        q = start_ingest(
            spark,
            input_dir=inbox,
            raw_path=raw,
            checkpoint_path=os.path.join(tmp, "ckpt"),
            errors_path=errors,
            trigger="available_now",
        )
        q.awaitTermination(120)

        landed = spark.read.parquet(raw)
        assert landed.count() == 2
        assert set(landed.columns) >= {"payload", "metadata", "land_date"}
        meta = json.loads(landed.select("metadata").first()[0])
        assert "IngestionTime" in meta and "batch_id" in meta

        dead = spark.read.parquet(errors)
        assert [r.payload for r in dead.collect()] == [BAD_LINE]

        # curated view builds straight off the landed table
        vw = build_vw_works(landed.select("payload", "metadata"))
        assert vw.filter(F.col("work_id") == "W1").count() == 1


def test_firehose_dead_letter_layout(spark):
    """Reference backup parity (infra/main.tf:178-193): dead letters as
    GZIP NDJSON under errors/yyyy/MM/dd/, original bytes verbatim."""
    import glob
    import gzip
    from datetime import date

    with tempfile.TemporaryDirectory() as tmp:
        inbox = os.path.join(tmp, "inbox")
        os.makedirs(inbox)
        _write_ndjson(os.path.join(inbox, "b0.ndjson"), GOOD + [BAD_LINE])
        errors = os.path.join(tmp, "errors")

        q = start_ingest(
            spark,
            input_dir=inbox,
            raw_path=os.path.join(tmp, "raw"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
            errors_path=errors,
            errors_layout="firehose",
            trigger="available_now",
        )
        q.awaitTermination(120)

        day_dir = os.path.join(
            errors, date.today().strftime("%Y/%m/%d")
        )
        gz = glob.glob(os.path.join(day_dir, "*.txt.gz"))
        assert gz, f"no gzip dead letters under {day_dir}"
        lines = []
        for f in gz:
            with gzip.open(f, "rt") as fh:
                lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
        assert lines == [BAD_LINE]


def test_unknown_dead_letter_layout_rejected(spark):
    import pytest

    from scholar_stream_spark.sources.raw_landing import write_dead_letters

    dead = spark.createDataFrame(
        [("x", "{}")], "payload string, metadata string"
    ).withColumn("land_date", F.current_date())
    with pytest.raises(ValueError, match="layout"):
        write_dead_letters(dead, "/tmp/nowhere", layout="s3")


def test_ingest_checkpoint_resumes_without_reprocessing(spark):
    """Restarting the stream with the same checkpoint only picks up new
    files — the replay/exactly-once contract of §2.6."""
    with tempfile.TemporaryDirectory() as tmp:
        inbox = os.path.join(tmp, "inbox")
        os.makedirs(inbox)
        raw = os.path.join(tmp, "raw")
        ckpt = os.path.join(tmp, "ckpt")
        _write_ndjson(os.path.join(inbox, "b0.ndjson"), GOOD)

        q = start_ingest(spark, inbox, raw, ckpt, trigger="available_now")
        q.awaitTermination(120)
        assert spark.read.parquet(raw).count() == 2

        _write_ndjson(
            os.path.join(inbox, "b1.ndjson"), [{"id": "W3", "title": "T3"}]
        )
        q2 = start_ingest(spark, inbox, raw, ckpt, trigger="available_now")
        q2.awaitTermination(120)
        landed = spark.read.parquet(raw)
        assert landed.count() == 3  # 2 old + 1 new, no duplicates


def test_ingest_failure_accounting(spark):
    """Per-batch counters mirror the reference's FailedPutCount surface
    (reference ingestion/producer.py:143-158; its integration test
    tests/integration/test_producer_flow.py:48-55)."""
    from scholar_stream_spark.streaming.accounting import (
        IngestAccounting,
        read_metrics,
    )

    with tempfile.TemporaryDirectory() as tmp:
        inbox = os.path.join(tmp, "inbox")
        os.makedirs(inbox)
        _write_ndjson(
            os.path.join(inbox, "b0.ndjson"), GOOD + [BAD_LINE, "also]bad"]
        )
        acct = IngestAccounting()
        metrics_path = os.path.join(tmp, "metrics")
        q = start_ingest(
            spark,
            input_dir=inbox,
            raw_path=os.path.join(tmp, "raw"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
            errors_path=os.path.join(tmp, "errors"),
            trigger="available_now",
            accounting=acct,
            metrics_path=metrics_path,
        )
        q.awaitTermination(120)

        t = acct.totals()
        assert t == {
            "n_batches": 1,
            "n_input": 4,
            "n_landed": 2,
            "n_dead": 2,
        }
        assert acct.had_failures()
        # error samples carry the bad payloads verbatim (first 3)
        assert BAD_LINE in acct.batches[0].error_samples
        summary = acct.summary_lines()
        assert "had failures" in summary[-1]

        # durable metrics table agrees with the in-memory recorder
        m = read_metrics(spark, metrics_path).first()
        assert m["n_input"] == 4 and m["n_dead"] == 2
        assert m["n_landed"] == 2

        # dead-letter path still receives exactly the bad lines
        dead = spark.read.parquet(os.path.join(tmp, "errors"))
        assert dead.count() == 2


def test_ingest_accounting_clean_batch(spark):
    from scholar_stream_spark.streaming.accounting import IngestAccounting

    with tempfile.TemporaryDirectory() as tmp:
        inbox = os.path.join(tmp, "inbox")
        os.makedirs(inbox)
        _write_ndjson(os.path.join(inbox, "b0.ndjson"), GOOD)
        acct = IngestAccounting()
        q = start_ingest(
            spark,
            input_dir=inbox,
            raw_path=os.path.join(tmp, "raw"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
            trigger="available_now",
            accounting=acct,
        )
        q.awaitTermination(120)
        assert acct.totals()["n_dead"] == 0
        assert not acct.had_failures()
        assert acct.to_df(spark).count() == 1


@pytest.fixture()
def raw_stream(spark, tmp_path):
    """A bounded streaming bronze source (file stream over one parquet
    batch) — lets the streaming views run under AvailableNow."""
    raw = str(tmp_path / "raw")
    rows = [
        (
            json.dumps(
                {
                    "id": f"W{i}",
                    "event_ts": f"2024-06-01T11:5{i}:00+00:00",
                    "ingest_ts": f"2024-06-01T11:5{i}:20+00:00",
                }
            ),
            json.dumps({"IngestionTime": f"2024-06-01T11:5{i}:30+00:00"}),
        )
        for i in range(3)
    ] + [
        (  # duplicate of W0 (same load id → streaming dedup target)
            json.dumps(
                {
                    "id": "W0",
                    "event_ts": "2024-06-01T11:50:00+00:00",
                    "ingest_ts": "2024-06-01T11:50:21+00:00",
                }
            ),
            json.dumps({"IngestionTime": "2024-06-01T11:50:31+00:00"}),
        )
    ]
    spark.createDataFrame(rows, ["payload", "metadata"]).write.parquet(raw)
    schema = spark.read.parquet(raw).schema
    return spark.readStream.schema(schema).parquet(raw)


def test_streaming_latency_kpis(spark, raw_stream, tmp_path):
    vw = streaming_vw_works(raw_stream)
    kpis = streaming_latency_kpis(vw, window="5 minutes", slide="5 minutes")
    # complete mode: bounded fixture data never advances the watermark
    # past the last window end, so append would emit nothing; production
    # dashboards poll the complete/update sink table.
    q = (
        kpis.writeStream.format("memory")
        .queryName("lat_kpis")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_kpi"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM lat_kpis ORDER BY window_start"
    ).collect()
    assert len(out) >= 1
    # 11:50 window: W0 twice at 30s + 31s latency
    w0 = out[0]
    assert w0.samples_5m >= 1
    assert w0.min_sec_5m >= 20 and w0.max_sec_5m <= 40


def test_streaming_dedup_keys_on_load_id(spark, tmp_path):
    """Redelivered records (same _LOAD_ID) are dropped; legitimate
    re-publications of the same work (fresh _LOAD_ID) are kept — the
    exact reason the reference carries a per-record uuid."""
    raw = str(tmp_path / "raw_lid")
    mk = lambda wid, lid, i: (  # noqa: E731
        json.dumps(
            {
                "id": wid,
                "event_ts": f"2024-06-01T11:5{i}:00+00:00",
                "ingest_ts": f"2024-06-01T11:5{i}:20+00:00",
                "_LOAD_ID": lid,
            }
        ),
        json.dumps({"IngestionTime": f"2024-06-01T11:5{i}:30+00:00"}),
    )
    rows = [
        mk("W0", "L1", 0),
        mk("W0", "L1", 1),  # redelivery: same load id → dropped
        mk("W0", "L2", 2),  # re-publication: new load id → kept
    ]
    spark.createDataFrame(rows, ["payload", "metadata"]).write.parquet(raw)
    schema = spark.read.parquet(raw).schema
    stream = spark.readStream.schema(schema).parquet(raw)
    deduped = streaming_dedup(streaming_vw_works(stream))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_lid")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lid"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT work_id, load_id FROM dedup_lid").collect()
    assert len(out) == 2
    assert sorted(r.load_id for r in out) == ["L1", "L2"]


def test_streaming_dedup(spark, raw_stream, tmp_path):
    vw = streaming_vw_works(raw_stream)
    deduped = streaming_dedup(vw)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [
        r.work_id
        for r in spark.sql("SELECT work_id FROM dedup_out").collect()
    ]
    assert sorted(ids) == ["W0", "W1", "W2"]  # duplicate W0 dropped


def test_progress_listener_captures_engine_metrics(spark, tmp_path):
    """StreamingQueryListener half of failure accounting: engine-level
    batch metrics (input rows, durations) captured independently of
    the foreachBatch application counters."""
    import json as _json
    import time as _time

    from scholar_stream_spark.streaming.accounting import ProgressListener

    listener = ProgressListener()
    spark.streams.addListener(listener)
    try:
        inbox = tmp_path / "plin"
        inbox.mkdir()
        (inbox / "a.ndjson").write_text(
            "\n".join(_json.dumps({"k": i}) for i in range(25)) + "\n"
        )
        q = (
            spark.readStream.schema("k long")
            .json(str(inbox))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "plck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        for _ in range(20):  # listener delivery is async
            if listener.progress:
                break
            _time.sleep(0.5)
        df = listener.to_df(spark)
        rows = df.collect()
        assert rows, "no progress events captured"
        assert sum(r["num_input_rows"] for r in rows) == 25
        assert all(r["batch_duration_ms"] >= 0 for r in rows)
    finally:
        spark.streams.removeListener(listener)


def test_text_gates_run_in_structured_streaming(spark, tmp_path):
    """The curation gates are stateless per-row projections, so the
    SAME operator functions must run unchanged on a readStream and
    produce byte-identical verdicts to the batch pass — the property
    that lets the online ingest path share the batch curation code
    instead of reimplementing it."""
    from scholar_stream_spark.operators import textops

    src = str(tmp_path / "docs_src")
    docs = spark.createDataFrame(
        [
            (1, "an honest essay about sparrows"),
            (2, "try this GAMBLING site today"),
            (3, "click http://bit.ly/xy now"),
            (4, "the quick brown fox jumps with that and more of it " * 3),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    for name, op in (
        ("blocklist", textops.blocklist_filter),
        ("gopher", textops.gopher_quality),
    ):
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(f"gate_{name}")
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{name}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        streamed = sorted(
            map(tuple, spark.sql(f"SELECT * FROM gate_{name}").collect())
        )
        batch = sorted(map(tuple, op(docs).collect()))
        assert streamed == batch, name
