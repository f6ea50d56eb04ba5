"""Offline drives of the consumption layer (``app/dashboard.py`` + the
``report`` CLI subcommand) against a landed fixture — mirroring the
reference dashboard's defensive NULL/NaN presentation contract
(``app/home.py:151-196``), including the all-NULL / empty-table paths.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.app.dashboard import (
    DEFAULT_LIMIT,
    MAX_LIMIT,
    MIN_LIMIT,
    clamp_limit,
    latency_tiles,
    recent_works,
    render_report,
)
from scholar_stream_spark.plans.catalog import init_catalog
from scholar_stream_spark.sources.raw_landing import land_batch


def _work_line(i: int, ts: str) -> str:
    # the bronze payload is the flattened ENVELOPE (what the producer
    # lands), not the nested upstream work record
    return json.dumps(
        {
            "id": f"W{i}",
            "title": f"Title {i}",
            "publication_year": 2000 + i,
            "primary_author": f"Author {i}",
            "email": f"author{i}@example.com",
            "event_ts": ts,
            "ingest_ts": ts,
            "source": "openalex",
        },
        separators=(",", ":"),
    )


@pytest.fixture()
def landed_raw(spark, tmp_path):
    """A real bronze landing: NDJSON lines -> land_batch -> parquet."""
    lines = spark.createDataFrame(
        [(_work_line(i, f"2026-08-13 00:0{i}:00"),) for i in range(5)],
        "value string",
    )
    raw_path = str(tmp_path / "raw")
    land_batch(lines, raw_path, batch_id="dash-test")
    return spark.read.parquet(raw_path)


def test_latency_tiles_and_recent_works(spark, landed_raw):
    # pin `now` just past the newest event so the 5-min window has data
    init_catalog(
        spark,
        landed_raw,
        role="R_ANALYST",
        now=F.to_timestamp(F.lit("2026-08-13 00:05:00")),
    )
    tiles = latency_tiles(spark)
    assert tiles is not None
    assert tiles["samples"] == 5
    assert tiles["min_sec"] is not None and tiles["min_sec"] >= 0
    works = recent_works(spark, limit=3).collect()  # clamped up to 10
    assert len(works) == 5
    # one batch => landed_ts ties; the guarantee is the DESC sort, not a
    # specific tie-break
    landed = [r["landed_ts"] for r in works]
    assert landed == sorted(landed, reverse=True)
    assert {r["work_id"] for r in works} == {f"W{i}" for i in range(5)}
    by_id = {r["work_id"]: r for r in works}
    assert by_id["W4"]["primary_author"] == "Author 4"
    # analyst role sees masked emails (G1 via the role-scoped catalog)
    assert by_id["W4"]["email"].startswith("a***@")


def test_empty_table_degrades_to_no_data_state(spark, landed_raw):
    empty = landed_raw.filter(F.lit(False))
    init_catalog(spark, empty, role="R_ANALYST")
    assert latency_tiles(spark) is None
    report = render_report(spark)
    assert "No recent data in the last 5 minutes" in report
    assert "(no rows)" in report
    # and the renderer never raises — the reference's whole point


def test_all_null_metrics_degrade_to_no_data_state(spark):
    """Payloads with no parseable event_ts: vw_works rows exist but every
    latency metric is NULL -> the 'no data' state, not a crash (the
    reference's _get_val/_to_float path)."""
    lines = spark.createDataFrame(
        [(json.dumps({"id": "W1", "title": "T"}),)], "value string"
    )
    from scholar_stream_spark.sources.raw_landing import with_delivery_metadata

    raw = with_delivery_metadata(lines, batch_id="b").select(
        "payload", "metadata", "land_date"
    )
    init_catalog(spark, raw, role="R_ANALYST")
    assert latency_tiles(spark) is None
    report = render_report(spark)
    assert "No recent data" in report
    assert "W1" in report  # the works table still renders


def test_limit_clamped_to_slider_bounds():
    assert clamp_limit(3) == MIN_LIMIT
    assert clamp_limit(10_000) == MAX_LIMIT
    assert clamp_limit(DEFAULT_LIMIT) == DEFAULT_LIMIT


def test_report_cli_prints_tiles_and_table(spark, landed_raw, tmp_path, capsys):
    from scholar_stream_spark.__main__ import main

    raw_path = str(tmp_path / "raw")
    rc = main(
        ["report", "--raw-path", raw_path, "--role", "R_TRANSFORM",
         "--limit", "10"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "ScholarStream — Live Metrics" in out
    assert "Recent works" in out
    # privileged role sees clear emails
    assert "author4@example.com" in out


def test_report_cli_rejects_unknown_role(spark, landed_raw, tmp_path):
    from scholar_stream_spark.__main__ import main

    with pytest.raises(ValueError, match="unknown role"):
        main(["report", "--raw-path", str(tmp_path / "raw"),
              "--role", "R_NOPE"])


def test_report_watch_picks_up_new_batches(spark, landed_raw, tmp_path, capsys):
    """The poll loop re-reads the bronze path each cycle, so rows landed
    between polls appear in the next report (the reference's refresh
    rerun). Bounded via --max-polls for the test."""
    import threading
    import time

    from pyspark.sql import functions as F2

    from scholar_stream_spark.__main__ import main

    raw_path = str(tmp_path / "raw")

    def land_more():
        time.sleep(1.0)
        lines = spark.createDataFrame(
            [(_work_line(99, "2026-08-13 01:00:00"),)], "value string"
        )
        land_batch(lines, raw_path, batch_id="late-batch")

    t = threading.Thread(target=land_more)
    t.start()
    rc = main(
        ["report", "--raw-path", raw_path, "--limit", "10",
         "--watch-seconds", "1.5", "--max-polls", "3"]
    )
    t.join()
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("ScholarStream — Live Metrics") == 3
    # W99 landed after the first poll and must appear by the last one
    assert "W99" in out


def test_report_cli_degrades_on_missing_bronze_path(spark, tmp_path, capsys):
    """Running report before the producer ever landed a batch is the
    exact state the 'Start the producer' message targets — it must
    render the empty state, not traceback."""
    from scholar_stream_spark.__main__ import main

    rc = main(
        ["report", "--raw-path", str(tmp_path / "never_landed")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "No recent data" in out and "(no rows)" in out
