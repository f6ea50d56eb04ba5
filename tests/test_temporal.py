"""Temporal operators: as-of join + sessionization semantics and plans."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from scholar_stream_spark.operators import temporal


def _events(spark, rows):
    # (event_id, ts, user_id, event_type, value)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_matches_latest_at_or_before(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00"), 1, "click", 10.0),
        (2, ts("2024-01-01 10:05:00"), 1, "click", 20.0),
        (3, ts("2024-01-01 10:07:00"), 1, "purchase", 99.0),  # → click 2
        (4, ts("2024-01-01 10:05:00"), 2, "purchase", 5.0),   # no prior click
        (5, ts("2024-01-01 11:00:00"), 2, "click", 30.0),
        (6, ts("2024-01-01 11:00:00"), 2, "purchase", 7.0),   # same-ts → click 5
        (7, ts("2024-01-01 09:00:00"), 1, "view", 0.0),       # ignored type
    ]
    out = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in temporal.asof_join_events(_events(spark, rows)).collect()
    }
    assert out[3] == (2, 20.0)
    assert out[4] == (None, None)
    assert out[6] == (5, 30.0)  # ts tie is inclusive: right sorts first


def test_asof_single_shuffle_on_user_id(spark):
    df = _events(spark, [(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)])
    plan = (
        temporal.asof_join_events(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the union+window as-of shape: exactly one hash partitioning, on
    # user_id — never a nested-loop/range join
    assert plan.count("hashpartitioning(user_id") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_window_and_bucket_boundaries(spark):
    rows = [
        # clicks at 09:00, 09:59:30, 10:00:30; purchase at 10:30
        (1, ts("2024-01-01 09:00:00"), 1, "click", 1.0),     # 90 min before → out
        (2, ts("2024-01-01 09:59:30"), 1, "click", 2.0),     # 30.5 min → in (prev bucket)
        (3, ts("2024-01-01 10:00:30"), 1, "click", 3.0),     # 29.5 min → in (same bucket)
        (4, ts("2024-01-01 10:30:00"), 1, "purchase", 9.0),
        (5, ts("2024-01-01 10:45:00"), 1, "click", 4.0),     # after → out
        (6, ts("2024-01-01 10:30:00"), 2, "click", 5.0),     # other user → out
    ]
    out = temporal.range_join_events(
        _events(spark, rows), max_gap_seconds=3600
    ).collect()
    matched = sorted(r["matched_event_id"] for r in out)
    assert matched == [2, 3]
    gaps = {r["matched_event_id"]: r["gap_seconds"] for r in out}
    assert gaps[2] == 1830 and gaps[3] == 1770


def test_range_join_is_equi_join(spark):
    df = _events(spark, [(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)])
    plan = (
        temporal.range_join_events(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_sessionize_splits_on_gap(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        (2, ts("2024-01-01 10:10:00"), 1, "view", 0.0),   # same session
        (3, ts("2024-01-01 11:00:00"), 1, "view", 0.0),   # 50 min gap → new
        (4, ts("2024-01-01 10:00:00"), 2, "view", 0.0),   # other user
    ]
    out = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_seconds"])
        for r in temporal.sessionize(_events(spark, rows)).collect()
    }
    assert out[(1, 1)] == (2, 600)
    assert out[(1, 2)] == (1, 0)
    assert out[(2, 1)] == (1, 0)


def test_sessionize_gap_boundary_is_exclusive(spark):
    # exactly gap_seconds apart stays in the SAME session (gap > thresh)
    rows = [
        (1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        (2, ts("2024-01-01 10:30:00"), 1, "view", 0.0),
    ]
    out = temporal.sessionize(
        _events(spark, rows), gap_seconds=1800
    ).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def _load_events(spark):
    # events.parquet carries TIMESTAMP(NANOS) — read via the driver
    # loader, which floors nanos to micros
    from __spark_entry__ import _t

    return _t(spark, "/root/testdata/sf0.001", "events")


def test_salted_distinct_matches_plain(spark):
    from scholar_stream_spark.operators import relational

    events = _load_events(spark)
    salted = {
        r["event_type"]: r["n_distinct_users"]
        for r in relational.distinct_users_by_type_salted(events).collect()
    }
    plain = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_distinct_spreads_the_key(spark):
    from scholar_stream_spark.operators import relational

    events = _load_events(spark)
    plan = (
        relational.distinct_users_by_type_salted(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stage-1 shuffle must key on (event_type, salt), not event_type alone
    assert "_salt" in plan


def test_load_events_restores_nanos_conf(spark, tmp_path):
    """load_events must not leave the session-global nanosAsLong legacy
    conf flipped (it changes how ANY later TIMESTAMP(NANOS) parquet read
    surfaces), and must still read both physical generations right."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    from scholar_stream_spark.sources.tables import load_events

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    ts = pd.to_datetime(
        ["2026-01-01 00:00:00.123456789", "2026-01-02 12:34:56.987654321"]
    )
    for unit, frac in (("ns", 123456), ("us", 123456)):
        d = tmp_path / unit
        d.mkdir()
        vals = ts if unit == "ns" else ts.floor("us")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2], pa.int64()),
                    "ts": pa.array(vals, pa.timestamp(unit)),
                }
            ),
            str(d / "events.parquet"),
            store_schema=False,
        )
        df = load_events(spark, str(d))
        assert dict(df.dtypes)["ts"] == "timestamp"
        got = df.orderBy("event_id").collect()
        assert got[0]["ts"].microsecond == frac
        assert spark.conf.get(key, None) == prior


def test_funnel_analysis_ordered_semantics(spark):
    """Ordering matters: a user whose purchase precedes their click
    must not count at the purchase step, and a user with no view
    never enters the funnel at all."""
    from scholar_stream_spark.operators import relational

    rows = [
        # u1 completes the funnel in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "purchase", "2024-01-01 12:00:00"),
        # u2: purchase BEFORE click -> stops at click
        (2, "view", "2024-01-01 10:00:00"),
        (2, "purchase", "2024-01-01 10:30:00"),
        (2, "click", "2024-01-01 11:00:00"),
        # u3: click/purchase but never viewed -> not in funnel
        (3, "click", "2024-01-01 10:00:00"),
        (3, "purchase", "2024-01-01 11:00:00"),
        # u4: view only
        (4, "view", "2024-01-01 09:00:00"),
    ]
    events = spark.createDataFrame(
        [(i, u, t, ts) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts string",
    ).select(
        "event_id", "user_id", "event_type",
        F.to_timestamp("ts").alias("ts"),
    )
    got = {
        r["step"]: (r["n_users"], r["conversion"])
        for r in relational.funnel_analysis(events).collect()
    }
    assert got == {
        "view": (3, 1.0),
        "click": (2, round(2 / 3, 4)),
        "purchase": (1, round(1 / 3, 4)),
    }
