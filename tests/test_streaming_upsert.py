"""Streaming SCD2 upsert: change stream → versioned dimension merge.

Drives ``start_scd2_upsert`` with a file-source change stream in two
availableNow passes and asserts the dimension state after each: the
merge applies per batch, the version pointer advances atomically, and
re-delivering an already-applied batch leaves the table unchanged
(idempotent effectively-once on top of at-least-once delivery).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from scholar_stream_spark.streaming.upsert import (
    init_dim,
    read_dim,
    start_scd2_upsert,
)

CHANGE_SCHEMA = (
    "k long, bal double, seg string, op string, change_ts timestamp"
)


def _write_changes(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch_{len(list(path.iterdir()))}.ndjson"
    f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run_once(spark, inbox, dim_path, ckpt):
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .json(str(inbox))
    )
    q = start_scd2_upsert(
        stream,
        dim_path=str(dim_path),
        checkpoint_path=str(ckpt),
        key="k",
        tracked=["bal", "seg"],
        trigger_available_now=True,
    )
    q.awaitTermination(120)


def test_scd2_upsert_stream(spark, tmp_path):
    dim_path, ckpt, inbox = tmp_path / "dim", tmp_path / "ckpt", tmp_path / "in"
    cur = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B")], "k long, bal double, seg string"
    ).select(
        "k", "bal", "seg",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    init_dim(cur, str(dim_path))

    # batch 1: update k=1, insert k=3
    _write_changes(
        inbox,
        [
            {"k": 1, "bal": 11.0, "seg": "A", "op": "U",
             "change_ts": "2026-02-01T00:00:00Z"},
            {"k": 3, "bal": 30.0, "seg": "C", "op": "U",
             "change_ts": "2026-02-01T00:00:00Z"},
        ],
    )
    _run_once(spark, inbox, dim_path, ckpt)
    state = {
        (r["k"], r["is_current"]): r for r in read_dim(spark, str(dim_path)).collect()
    }
    assert state[(1, True)]["bal"] == 11.0
    assert str(state[(1, False)]["valid_to"]).startswith("2026-02-01")
    assert state[(3, True)]["bal"] == 30.0
    assert state[(2, True)]["bal"] == 20.0
    n_after_b1 = len(state)

    # batch 2: delete k=2 (new file, same checkpoint -> only new data reads)
    _write_changes(
        inbox,
        [{"k": 2, "bal": 20.0, "seg": "B", "op": "D",
          "change_ts": "2026-03-01T00:00:00Z"}],
    )
    _run_once(spark, inbox, dim_path, ckpt)
    state2 = {
        (r["k"], r["is_current"]): r for r in read_dim(spark, str(dim_path)).collect()
    }
    assert (2, True) not in state2
    assert str(state2[(2, False)]["valid_to"]).startswith("2026-03-01")
    assert len(state2) == n_after_b1  # closed, not dropped

    # replay the whole inbox against a FRESH checkpoint (simulated
    # redelivery of already-applied batches): scd2_apply is idempotent,
    # so the table state must be byte-identical to before the replay
    before = sorted(map(tuple, read_dim(spark, str(dim_path)).collect()))
    _run_once(spark, inbox, dim_path, tmp_path / "ckpt_replay")
    after = sorted(map(tuple, read_dim(spark, str(dim_path)).collect()))
    assert after == before

    # time travel: version 0 is still the untouched initial snapshot,
    # and as-of reads against the current table reconstruct it
    from scholar_stream_spark.operators.cdc import scd2_as_of

    v0 = read_dim(spark, str(dim_path), version=0)
    assert sorted(r["k"] for r in v0.collect()) == [1, 2]
    assert all(r["is_current"] for r in v0.collect())
    asof = scd2_as_of(
        read_dim(spark, str(dim_path)),
        F.to_timestamp(F.lit("2026-01-15 00:00:00")),
    )
    got = {r["k"]: r["bal"] for r in asof.collect()}
    assert got == {1: 10.0, 2: 20.0}  # the pre-change world


def test_vacuum_dim_retention(spark, tmp_path):
    from scholar_stream_spark.streaming.upsert import vacuum_dim

    dim_path, inbox = tmp_path / "vdim", tmp_path / "vin"
    cur = spark.createDataFrame(
        [(1, 1.0, "A")], "k long, bal double, seg string"
    ).select(
        "k", "bal", "seg",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    init_dim(cur, str(dim_path))
    for i, ts in enumerate(["2026-02-01", "2026-03-01"]):
        _write_changes(
            inbox,
            [{"k": 1, "bal": float(i + 2), "seg": "A", "op": "U",
              "change_ts": f"{ts}T00:00:00Z"}],
        )
        _run_once(spark, inbox, dim_path, tmp_path / f"vck{i}")
    # versions v0, v1, v2 exist; keep last 2. NOTE the second run used a
    # fresh checkpoint over the shared inbox, so its micro-batch carried
    # BOTH changes for k=1 — the merge's per-key last-writer-wins
    # collapse must leave exactly one current row (bal from the max ts).
    current_rows = read_dim(spark, str(dim_path)).filter("is_current").collect()
    assert len(current_rows) == 1 and current_rows[0]["bal"] == 3.0
    removed = vacuum_dim(str(dim_path), keep_last=2)
    assert removed == [0]
    assert read_dim(spark, str(dim_path), version=1) is not None
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_dim(spark, str(dim_path), version=0).collect()


def test_upsert_collapses_multiple_changes_per_key_in_one_batch(spark, tmp_path):
    """A slow trigger (or redelivery) can fold several logical changes
    to one key into a single micro-batch; the merge must apply only the
    LAST (max change_ts) — never two simultaneous opens."""
    dim_path, inbox = tmp_path / "mdim", tmp_path / "min"
    cur = spark.createDataFrame(
        [(1, 1.0, "A")], "k long, bal double, seg string"
    ).select(
        "k", "bal", "seg",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    init_dim(cur, str(dim_path))
    _write_changes(
        inbox,
        [
            {"k": 1, "bal": 5.0, "seg": "A", "op": "U",
             "change_ts": "2026-02-01T00:00:00Z"},
            {"k": 1, "bal": 9.0, "seg": "A", "op": "U",
             "change_ts": "2026-03-01T00:00:00Z"},
        ],
    )
    _run_once(spark, inbox, dim_path, tmp_path / "mck")
    rows = read_dim(spark, str(dim_path)).collect()
    current = [r for r in rows if r["is_current"]]
    assert len(current) == 1
    assert current[0]["bal"] == 9.0  # last writer
    assert str(current[0]["valid_from"]).startswith("2026-03-01")
