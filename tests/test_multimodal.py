"""Multimodal asset operators: Arrow-batch plumbing, schema, plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import multimodal
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    return multimodal.as_assets(docs)


def test_asset_table_shape(assets):
    row = assets.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["media_type"] in multimodal.MEDIA_TYPES
    assert row["n_bytes"] == len(row["content"])
    assert len(row["checksum"]) == 32


def test_decode_typed_metadata(assets):
    decoded = multimodal.decode_assets(assets)
    assert "content" not in decoded.columns  # blobs never cross back
    rows = decoded.collect()
    assert len(rows) == assets.count()
    for r in rows:
        if r["media_type"] == "image":
            assert 64 <= r["width"] <= 319 and r["n_channels"] == 3
            assert r["sample_rate"] is None
        elif r["media_type"] == "audio":
            assert r["sample_rate"] >= 8000 and r["duration_ms"] >= 1000
            assert r["width"] is None
        else:
            assert 1 <= r["n_frames"] <= 256
            assert r["duration_ms"] == r["n_frames"] * 100


def test_decode_adds_no_exchange(assets):
    decoded = multimodal.decode_assets(assets)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    in_plan = assets._jdf.queryExecution().executedPlan().toString()
    # decode inherits the input partitioning: any Exchange comes from the
    # input's own scale_out, never from mapInPandas itself
    assert plan.count("Exchange") == in_plan.count("Exchange")


def test_features_deterministic_and_bounded(assets):
    feats = multimodal.extract_features(assets)
    flat = multimodal.feature_columns(feats)
    rows = {r["asset_id"]: r for r in flat.collect()}
    again = {r["asset_id"]: r for r in flat.collect()}
    assert rows == again  # deterministic across runs
    for r in rows.values():
        for i in range(multimodal.FEATURE_DIM):
            assert 0.0 <= r[f"f{i}"] < 1.0


def test_frame_sampling_stride(assets):
    decoded = multimodal.decode_assets(assets)
    frames = multimodal.sample_frames(decoded)
    per_asset = (
        frames.groupBy("asset_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx"))
        .join(decoded.select("asset_id", "n_frames"), "asset_id")
        .collect()
    )
    assert per_asset
    for r in per_asset:
        # stride sampling yields <= 2*max frames and stays in range
        assert r["n"] <= 2 * multimodal.FRAME_SAMPLE_MAX
        assert r["mx"] < r["n_frames"]
    ts = frames.filter(F.col("frame_ts_ms") != F.col("frame_idx") * 100)
    assert ts.count() == 0


def test_resize_preserves_bounds(assets):
    decoded = multimodal.decode_assets(assets)
    plan = multimodal.resize_plan(decoded)
    for r in plan.collect():
        assert max(r["target_width"], r["target_height"]) <= multimodal.RESIZE_MAX_SIDE
        if max(r["width"], r["height"]) <= multimodal.RESIZE_MAX_SIDE:
            assert (r["target_width"], r["target_height"]) == (
                r["width"],
                r["height"],
            )
